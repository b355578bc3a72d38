"""SST (sea-surface temperature) dataset (reference ``var_sep/data/sst.py``).

Per zone ``data_{zone}.nc`` with variables ``thetao`` (T, 64, 64),
``daily_mean`` and ``daily_std`` (T,).  Two-stage normalization parity
(``sst.py:64-78``): climatology first ((x - daily_mean) / daily_std), then
per-frame mean/std over space; *both* stat sets are retained for eval-time
inversion (``test/sst/test.py:54-64``).  80/20 temporal split; eval items
additionally return the denormalization stats and zone id.

NetCDF4 files are HDF5 underneath, so they are read with h5py (this image
ships no netCDF4 module); CF ``scale_factor``/``add_offset``/``_FillValue``
attributes are applied manually.  The reference computes its per-zone
length from the *last* zone loaded (``sst.py:66-67``), assuming equal
lengths; we validate that assumption instead of silently inheriting it.
"""

from __future__ import annotations

import os
from typing import Dict, Sequence, Tuple

import numpy as np


def _read_nc_var(f, name: str) -> np.ndarray:
    ds = f[name]
    attrs = dict(ds.attrs)
    data = np.asarray(ds[()], np.float64)
    # CF packing.  Note: _FillValue pixels are kept as their (scaled) raw
    # values, matching the reference, which reads the masked array's .data
    # (``sst.py:24-29``) — converting them to NaN would poison the per-frame
    # normalization.
    scale = attrs.get("scale_factor")
    offset = attrs.get("add_offset")
    if scale is not None:
        data = data * np.float64(scale)
    if offset is not None:
        data = data + np.float64(offset)
    return data


def extract_data(path: str, variables: Sequence[str]) -> Dict[str, np.ndarray]:
    import h5py

    with h5py.File(path, "r") as f:
        return {v: _read_nc_var(f, v) for v in variables}


class SST:
    var_names = ("thetao", "daily_mean", "daily_std")

    def __init__(self, data_dir: str, nt_cond: int, nt_pred: int, train: bool,
                 zones: Sequence[int] = range(1, 30), eval: bool = False):
        self.data_dir = data_dir
        self.pred_h = nt_pred
        self.lb = nt_cond
        self.zones = list(zones)
        self.train = train
        self.eval = eval

        self.data: Dict[int, np.ndarray] = {}
        self.cst: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self.climato: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

        lengths = set()
        sizes = set()
        for zone in self.zones:
            z = extract_data(os.path.join(data_dir, f"data_{zone}.nc"),
                             self.var_names)
            thetao = z["thetao"]
            lengths.add(len(thetao))
            if thetao.ndim != 3 or thetao.shape[1] != thetao.shape[2]:
                raise ValueError(
                    f"zone {zone}: thetao must be (T, N, N), got {thetao.shape}")
            sizes.add(thetao.shape[1])
            clim_mean = z["daily_mean"].reshape(-1, 1, 1)
            clim_std = z["daily_std"].reshape(-1, 1, 1)
            thetao = (thetao - clim_mean) / clim_std
            self.climato[zone] = (clim_mean, clim_std)
            mean = thetao.mean(axis=(1, 2)).reshape(-1, 1, 1)
            std = thetao.std(axis=(1, 2)).reshape(-1, 1, 1)
            thetao = (thetao - mean) / std
            self.cst[zone] = (mean, std)
            self.data[zone] = thetao.astype(np.float32)
        if len(lengths) != 1:
            raise ValueError(f"SST zones have unequal lengths: {sorted(lengths)}")
        if len(sizes) != 1:
            raise ValueError(f"SST zones have unequal grid sizes: {sorted(sizes)}")
        # the reference hardcodes 64 (``sst.py:42``); inferred here so
        # full-basin grids (e.g. 256x256, --zone_size) ride the same loader.
        self.zone_size = sizes.pop()
        total = lengths.pop()

        self.first = 0 if train else int(0.8 * total)
        len_ = int(0.8 * total) if train else total - int(0.8 * total)
        self.len_ = len_ - self.pred_h - self.lb - 1
        self._total_len = len(self.zones) * self.len_

    def __len__(self) -> int:
        return self._total_len

    def __getitem__(self, idx: int):
        zone = self.zones[idx // self.len_]
        idx_id = (idx % self.len_) + self.lb + 1 + self.first
        hw = self.zone_size
        inputs = self.data[zone][idx_id - self.lb + 1: idx_id + 1]
        target = self.data[zone][idx_id + 1: idx_id + self.pred_h + 1]
        inputs = inputs.reshape(self.lb, hw, hw, 1)
        target = target.reshape(self.pred_h, hw, hw, 1)
        if not self.eval:
            return inputs, target
        sl = slice(idx_id + 1, idx_id + self.pred_h + 1)
        mu_clim, std_clim = (s[sl] for s in self.climato[zone])
        mu_norm, std_norm = (s[sl] for s in self.cst[zone])
        return inputs, target, mu_clim, std_clim, mu_norm, std_norm, zone

    def zone_min_max(self) -> Tuple[Dict[int, float], Dict[int, float]]:
        """Per-zone min/max of the normalized field, used by the SSIM eval
        renormalization (``test/sst/test.py:29-34``)."""
        mins = {z: float(self.data[z].min()) for z in self.zones}
        maxs = {z: float(self.data[z].max()) for z in self.zones}
        return mins, maxs
