"""Realistic-scale synthetic corpora in the reference's exact on-disk
formats, for end-to-end convergence validation of the file-backed data
stacks (TaxiBJ h5, SST netCDF-as-h5, Chairs png renders).

The real corpora (BJ{13-16}_M32x32_T30_InOut.h5, data_{zone}.nc, 3D
Warehouse renders) are not redistributable and cannot be downloaded in
this environment; these generators produce structurally faithful stand-ins
— same files, dtypes, layouts, timestamp conventions and value ranges — so
the full training recipes (reference README.md:79-86) run end to end and
converge.  They are NOT the benchmark corpora: metrics on them validate
the pipeline, not the paper numbers.

Formats mirrored:
* TaxiBJ: per-year h5 with ``data`` (T, 2, 32, 32) float and ``date``
  ``b"YYYYMMDDSS"`` timestamps, 48 slots/day (reference
  ``var_sep/data/taxibj.py:103-108,184-207``).
* SST: per-zone ``data_{z}.nc`` with ``thetao`` (T, 64, 64),
  ``daily_mean``/``daily_std`` (T,) (reference ``var_sep/data/sst.py:24-29``).
* Chairs: ``rendered_chairs/<obj>/renders/{i}.png`` 64x64 RGB, 62 views,
  plus the ``all_chair_names.mat`` entry the loader removes (reference
  ``var_sep/data/chairs.py:33-35``).
* MNIST: raw idx ``train-images-idx3-ubyte`` etc. (torchvision
  ``MNIST/raw`` layout read by ``data/moving_mnist.py:load_mnist``) built
  from scikit-learn's bundled UCI handwritten-digits set (1,797 real 8x8
  digits, no network needed) upscaled to the MNIST 28x28 frame — real
  handwritten digit classes, so the Moving-MNIST recipes and the
  digit-permutation disentanglement protocol run end to end.
"""

from __future__ import annotations

import datetime
import os

import numpy as np


def make_taxibj(data_dir: str, days_per_year: int = 120, seed: int = 0) -> None:
    """Traffic in/out flows: double daily peak x weekly cycle x per-cell
    magnitude + noise, positive, year-dependent scale like the real data."""
    import h5py

    rng = np.random.RandomState(seed)
    os.makedirs(data_dir, exist_ok=True)
    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    center = np.exp(-(((yy - 16) ** 2 + (xx - 16) ** 2) / 120.0))
    cell_gain = 0.3 + center + 0.2 * rng.rand(2, 32, 32)
    for year in range(13, 17):
        T = days_per_year * 48
        t = np.arange(T)
        slot = t % 48
        day = t // 48
        daily = (np.exp(-((slot - 17) ** 2) / 18.0)
                 + 0.8 * np.exp(-((slot - 37) ** 2) / 26.0) + 0.15)
        weekly = 1.0 - 0.35 * ((day % 7) >= 5)
        base = (daily * weekly)[:, None, None, None] * cell_gain[None]
        scale = 100.0 + 60.0 * (year - 13)
        data = scale * base * (1.0 + 0.08 * rng.randn(T, 2, 32, 32))
        data = np.clip(data, 0.0, None).astype(np.float64)
        start = datetime.date(2000 + year, 3, 1)
        dates = [f"{start + datetime.timedelta(days=int(d)):%Y%m%d}{s + 1:02d}".encode()
                 for d, s in zip(day, slot)]
        with h5py.File(os.path.join(data_dir, f"BJ{year}_M32x32_T30_InOut.h5"),
                       "w") as f:
            f.create_dataset("data", data=data)
            f.create_dataset("date", data=np.array(dates))


def make_sst(data_dir: str, zones=range(1, 30), n_days: int = 1600,
             seed: int = 0, size: int = 64) -> None:
    """Per-zone temperature fields: seasonal climatology + advecting warm
    anomalies + noise, in degrees-Kelvin-like range (~285-305).

    ``size`` > 64 writes full-basin stretch grids (e.g. 256x256 for the
    BASELINE.json stretch config) through :func:`_make_sst_basin`; the
    default 64 path is kept bit-for-bit (RNG call order) so existing
    corpora regenerate identically.
    """
    import h5py

    if size != 64:
        return _make_sst_basin(data_dir, zones, n_days, seed, size)
    rng = np.random.RandomState(seed)
    os.makedirs(data_dir, exist_ok=True)
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    t = np.arange(n_days)
    for zone in zones:
        lat_gradient = 0.05 * (yy - 32)
        season = 8.0 * np.sin(2 * np.pi * (t / 365.25) + rng.rand() * 6.28)
        # two anomalies advecting at zone-specific velocities
        fields = np.empty((n_days, 64, 64), np.float32)
        v = rng.uniform(0.1, 0.5, (2, 2)) * rng.choice([-1, 1], (2, 2))
        amp = rng.uniform(1.5, 3.5, 2)
        width = rng.uniform(60, 140, 2)
        phase = rng.uniform(0, 64, (2, 2))
        for k in range(n_days):
            f = 295.0 + lat_gradient + season[k]
            for a in range(2):
                cx = (phase[a, 0] + v[a, 0] * k) % 64
                cy = (phase[a, 1] + v[a, 1] * k) % 64
                # wrap-around distance keeps the anomaly coherent
                dx = np.minimum(np.abs(xx - cx), 64 - np.abs(xx - cx))
                dy = np.minimum(np.abs(yy - cy), 64 - np.abs(yy - cy))
                f = f + amp[a] * np.exp(-(dx ** 2 + dy ** 2) / width[a])
            fields[k] = f
        fields += 0.3 * rng.randn(n_days, 64, 64).astype(np.float32)
        with h5py.File(os.path.join(data_dir, f"data_{zone}.nc"), "w") as f:
            f.create_dataset("thetao", data=fields.astype(np.float64))
            f.create_dataset("daily_mean",
                             data=fields.mean(axis=(1, 2)).astype(np.float64))
            f.create_dataset("daily_std",
                             data=fields.std(axis=(1, 2)).astype(np.float64))


def _make_sst_basin(data_dir: str, zones, n_days: int, seed: int,
                    size: int) -> None:
    """Full-basin SST grids (stretch config): basin-scale gyre circulation +
    seasonal cycle + advecting mesoscale anomalies, vectorized over days
    (the 64px path's per-day Python loop would take hours at 256x256).

    ``thetao`` is written CF-packed (int16 + ``scale_factor``/``add_offset``
    attributes, like real NEMO exports) — 4x smaller on disk than float64
    and it exercises the loader's CF-unpacking path at scale
    (``data/sst.py:_read_nc_var``; reference ``sst.py:24-29``).
    """
    import h5py

    rng = np.random.RandomState(seed + 7)  # distinct stream from the 64px path
    os.makedirs(data_dir, exist_ok=True)
    yy, xx = np.meshgrid(np.arange(size, dtype=np.float32),
                         np.arange(size, dtype=np.float32), indexing="ij")
    t = np.arange(n_days, dtype=np.float32)
    n_anom = max(2, size // 32)  # mesoscale eddy count scales with the basin
    for zone in zones:
        season = 8.0 * np.sin(2 * np.pi * (t / 365.25) + rng.rand() * 6.28)
        lat_gradient = (10.0 / size) * (yy - size / 2)
        # basin-scale double gyre (stationary circulation pattern)
        gyre = 1.5 * np.sin(2 * np.pi * xx / size) * np.sin(4 * np.pi * yy / size)
        v = rng.uniform(0.1, 0.5, (n_anom, 2)) * rng.choice([-1, 1], (n_anom, 2))
        amp = rng.uniform(1.5, 3.5, n_anom)
        width = rng.uniform(60, 140, n_anom) * (size / 64.0) ** 2
        phase = rng.uniform(0, size, (n_anom, 2))
        fields = np.empty((n_days, size, size), np.float32)
        # chunk over days: full (n_days, size, size, n_anom) broadcasting
        # would blow host memory at 256px
        chunk = max(1, int(2e8 // (size * size * n_anom * 4)))
        for k0 in range(0, n_days, chunk):
            ks = np.arange(k0, min(k0 + chunk, n_days), dtype=np.float32)
            f = (295.0 + lat_gradient + gyre)[None] + season[k0:k0 + len(ks), None, None]
            for a in range(n_anom):
                cx = (phase[a, 0] + v[a, 0] * ks) % size
                cy = (phase[a, 1] + v[a, 1] * ks) % size
                dx = np.abs(xx[None] - cx[:, None, None])
                dx = np.minimum(dx, size - dx)
                dy = np.abs(yy[None] - cy[:, None, None])
                dy = np.minimum(dy, size - dy)
                f += amp[a] * np.exp(-(dx ** 2 + dy ** 2) / width[a])
            fields[k0:k0 + len(ks)] = f
        fields += 0.3 * rng.randn(n_days, size, size).astype(np.float32)
        # CF packing: scale 1e-3 K resolution around the basin mean
        offset = np.float64(fields.mean())
        scale = np.float64(1e-3)
        packed = np.clip(np.round((fields - offset) / scale),
                         -32767, 32767).astype(np.int16)
        with h5py.File(os.path.join(data_dir, f"data_{zone}.nc"), "w") as f:
            d = f.create_dataset("thetao", data=packed)
            d.attrs["scale_factor"] = scale
            d.attrs["add_offset"] = offset
            f.create_dataset("daily_mean",
                             data=fields.mean(axis=(1, 2)).astype(np.float64))
            f.create_dataset("daily_std",
                             data=fields.std(axis=(1, 2)).astype(np.float64))


def _write_idx(path: str, arr: np.ndarray) -> None:
    """Raw idx (ubyte) writer: magic = 0x0000'08'<ndim>, big-endian dims."""
    import struct

    arr = np.ascontiguousarray(arr, np.uint8)
    with open(path, "wb") as f:
        f.write(struct.pack(">I", 0x0800 | arr.ndim))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.tobytes())


def make_mnist_standin(data_dir: str, seed: int = 0,
                       n_test: int = 500) -> None:
    """MNIST-layout idx corpus from scikit-learn's bundled digits.

    Each 8x8 digit (values 0-16) is cubic-upscaled to the 20x20 glyph box
    and centered in a 28x28 frame — the same layout as real MNIST, so the
    Moving-MNIST compositing geometry (`var_sep/data/moving_mnist.py`,
    28-px digit size inside 64-px frames) is unchanged.  A seeded
    stratified split reserves ``n_test`` digits for the t10k files.  These
    are REAL handwritten digits with true class labels (disentanglement's
    best-over-digit-permutation metric stays meaningful) but only ~1.8k of
    them — a documented stand-in for environments where the MNIST corpus
    cannot be downloaded, not a claim of paper-comparable numbers.
    """
    from sklearn.datasets import load_digits

    try:
        import cv2

        def up(img):  # (8,8) float 0-16 -> (20,20) uint8
            big = cv2.resize(img, (20, 20), interpolation=cv2.INTER_CUBIC)
            return np.clip(big * (255.0 / 16.0), 0, 255).astype(np.uint8)
    except ImportError:  # pragma: no cover - cv2 is present in this image
        from PIL import Image

        def up(img):
            im = Image.fromarray((img * (255.0 / 16.0)).astype(np.uint8))
            return np.asarray(im.resize((20, 20), Image.BICUBIC))

    bunch = load_digits()
    rng = np.random.RandomState(seed)
    frames = np.zeros((len(bunch.images), 28, 28), np.uint8)
    for i, img in enumerate(bunch.images):
        frames[i, 4:24, 4:24] = up(img.astype(np.float32))
    labels = bunch.target.astype(np.uint8)

    # stratified test split: n_test/10 per class, seeded
    test_mask = np.zeros(len(labels), bool)
    for c in range(10):
        idx = np.flatnonzero(labels == c)
        test_mask[rng.choice(idx, size=n_test // 10, replace=False)] = True

    raw = os.path.join(data_dir, "MNIST", "raw")
    os.makedirs(raw, exist_ok=True)
    _write_idx(os.path.join(raw, "train-images-idx3-ubyte"), frames[~test_mask])
    _write_idx(os.path.join(raw, "train-labels-idx1-ubyte"), labels[~test_mask])
    _write_idx(os.path.join(raw, "t10k-images-idx3-ubyte"), frames[test_mask])
    _write_idx(os.path.join(raw, "t10k-labels-idx1-ubyte"), labels[test_mask])


def make_chairs(data_dir: str, n_objects: int = 200, seed: int = 0) -> None:
    """62 azimuth renders per object: a shaded rotating box with
    object-specific geometry/colors on white ground, 64x64 RGB."""
    from PIL import Image, ImageDraw

    rng = np.random.RandomState(seed)
    base = os.path.join(data_dir, "rendered_chairs")
    os.makedirs(base, exist_ok=True)
    open(os.path.join(base, "all_chair_names.mat"), "wb").close()
    for obj in range(n_objects):
        odir = os.path.join(base, f"obj_{obj:04d}", "renders")
        os.makedirs(odir, exist_ok=True)
        w = rng.uniform(10, 22)        # half-width
        h = rng.uniform(14, 26)        # height
        color = tuple(int(c) for c in rng.randint(40, 220, 3))
        leg = rng.uniform(4, 10)
        for i in range(62):
            az = 2 * np.pi * i / 62
            img = Image.new("RGB", (64, 64), (255, 255, 255))
            drw = ImageDraw.Draw(img)
            # box silhouette: apparent width follows |cos|, shading follows
            # the lit face fraction — a cheap but view-consistent render
            aw = max(3.0, w * (0.35 + 0.65 * abs(np.cos(az))))
            shade = 0.55 + 0.45 * (np.sin(az) * 0.5 + 0.5)
            fill = tuple(int(c * shade) for c in color)
            cx, top = 32, 32 - h / 2
            drw.rectangle([cx - aw, top, cx + aw, top + h], fill=fill)
            # seat-back hint on one side, rotating with azimuth
            bx = cx + aw * np.sin(az) * 0.6
            drw.rectangle([bx - 2, top - leg, bx + 2, top], fill=fill)
            drw.rectangle([cx - aw, top + h, cx - aw + 3, top + h + leg],
                          fill=(60, 60, 60))
            drw.rectangle([cx + aw - 3, top + h, cx + aw, top + h + leg],
                          fill=(60, 60, 60))
            img.save(os.path.join(odir, f"{i}.png"))
