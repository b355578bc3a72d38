"""TaxiBJ / SST / Chairs loader tests on synthetic fixtures, plus Batcher."""

import datetime
import os

import numpy as np
import pytest

from spatiotemporal_variable_separation_tpu.data.loader import Batcher
from spatiotemporal_variable_separation_tpu.data.sst import SST
from spatiotemporal_variable_separation_tpu.data.taxibj import (
    MinMaxNormalization,
    TaxiBJ,
    remove_incomplete_days,
)

h5py = pytest.importorskip("h5py")


def _dates(start: datetime.date, days: int, skip=()):
    out = []
    for d in range(days):
        day = start + datetime.timedelta(days=d)
        for slot in range(1, 49):
            if (d, slot) in skip:
                continue
            out.append(f"{day:%Y%m%d}{slot:02d}".encode())
    return out


def _write_year(path, dates, scale=1.0):
    rng = np.random.default_rng(len(dates))
    data = (rng.random((len(dates), 2, 32, 32)) * scale).astype(np.float64)
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data)
        f.create_dataset("date", data=np.array(dates))
    return data


@pytest.fixture
def taxibj_dir(tmp_path):
    for year, days in zip(range(13, 17), (4, 4, 4, 6)):
        skip = {(1, 10)} if year == 14 else set()  # one incomplete day
        dates = _dates(datetime.date(2000 + year, 7, 1), days, skip)
        _write_year(tmp_path / f"BJ{year}_M32x32_T30_InOut.h5", dates,
                    scale=100 * year)
    return str(tmp_path)


def test_remove_incomplete_days():
    dates = _dates(datetime.date(2013, 7, 1), 3, skip={(1, 5)})
    data = np.zeros((len(dates), 2, 32, 32))
    out, ts = remove_incomplete_days(data, dates)
    days = {t[:8] for t in ts}
    assert days == {b"20130701", b"20130703"}
    assert len(ts) == 96


def test_minmax_roundtrip():
    mmn = MinMaxNormalization()
    x = np.array([2.0, 4.0, 6.0])
    y = mmn.fit_transform(x)
    np.testing.assert_allclose(y, [0, 0.5, 1.0])
    np.testing.assert_allclose(mmn.inverse_transform(y), x)


def test_taxibj_datasets(taxibj_dir):
    len_test = 24
    train, test = TaxiBJ.make_datasets(taxibj_dir, len_closeness=8,
                                       len_test=len_test, nt_cond=4)
    assert test.data.shape[0] == len_test
    cond, target = train[0]
    assert cond.shape == (4, 32, 32, 2) and target.shape == (4, 32, 32, 2)
    assert train.data.min() >= 0.0 and train.data.max() <= 1.0
    # sequences are most-recent-first (reference closeness semantics):
    # within one year, consecutive dataset entries shift by one slot.
    assert train.mmn is test.mmn


def test_taxibj_build_cache_roundtrip(taxibj_dir):
    """Second build must serve the published cache (mmap) with identical
    values, and a changed source file must invalidate it."""
    import os

    kw = dict(len_closeness=8, len_test=24, nt_cond=4)
    tr1, te1 = TaxiBJ.make_datasets(taxibj_dir, **kw)
    assert os.path.isfile(os.path.join(taxibj_dir, "closeness_L8_test24.npy"))
    tr2, te2 = TaxiBJ.make_datasets(taxibj_dir, **kw)
    assert isinstance(tr2.data, np.memmap)
    np.testing.assert_array_equal(np.asarray(tr1.data), np.asarray(tr2.data))
    np.testing.assert_array_equal(np.asarray(te1.data), np.asarray(te2.data))
    assert (tr2.mmn._min, tr2.mmn._max) == (tr1.mmn._min, tr1.mmn._max)
    # stale fingerprint -> rebuild (no crash, fresh values)
    src = os.path.join(taxibj_dir, "BJ13_M32x32_T30_InOut.h5")
    os.utime(src, (0, 0))
    tr3, _ = TaxiBJ.make_datasets(taxibj_dir, **kw)
    assert not isinstance(tr3.data, np.memmap)
    np.testing.assert_array_equal(np.asarray(tr1.data), np.asarray(tr3.data))


def test_taxibj_sequence_time_reversal(taxibj_dir):
    """Entry frames must be [t-1, t-2, ...]: frame j of entry i equals frame
    j+1 of entry i+1 when both windows are in range (shifted by one slot)."""
    train, _ = TaxiBJ.make_datasets(taxibj_dir, len_closeness=8,
                                    len_test=24, nt_cond=4)
    a = train.data[10]
    b = train.data[11]
    np.testing.assert_allclose(a[0], b[1])


@pytest.fixture
def sst_dir(tmp_path):
    rng = np.random.default_rng(0)
    for zone in (1, 2):
        T = 100
        base = 10 + 5 * np.sin(np.arange(T) / 10)[:, None, None]
        thetao = base + rng.random((T, 64, 64)) * 2
        with h5py.File(tmp_path / f"data_{zone}.nc", "w") as f:
            f.create_dataset("thetao", data=thetao)
            f.create_dataset("daily_mean", data=base[:, 0, 0])
            f.create_dataset("daily_std", data=np.full(T, 2.0))
    return str(tmp_path)


def test_sst_normalization_and_items(sst_dir):
    ds = SST(sst_dir, nt_cond=4, nt_pred=6, train=True, zones=[1, 2])
    cond, target = ds[0]
    assert cond.shape == (4, 64, 64, 1) and target.shape == (6, 64, 64, 1)
    # after two-stage normalization each frame is ~zero-mean unit-std
    flat = ds.data[1].reshape(ds.data[1].shape[0], -1)
    np.testing.assert_allclose(flat.mean(1), 0.0, atol=1e-5)
    np.testing.assert_allclose(flat.std(1), 1.0, atol=1e-4)
    # eval variant returns denorm stats + zone id
    ev = SST(sst_dir, nt_cond=4, nt_pred=6, train=False, zones=[1, 2], eval=True)
    item = ev[0]
    assert len(item) == 7 and item[-1] == 1
    inputs, target, mu_c, std_c, mu_n, std_n, _ = item
    assert mu_c.shape == (6, 1, 1) and std_n.shape == (6, 1, 1)
    # full denormalization recovers physical values
    phys = (target[..., 0] * std_n + mu_n) * std_c + mu_c
    assert 0.0 < phys.mean() < 25.0


def test_sst_split_counts(sst_dir):
    tr = SST(sst_dir, nt_cond=4, nt_pred=6, train=True, zones=[1])
    te = SST(sst_dir, nt_cond=4, nt_pred=6, train=False, zones=[1])
    assert len(tr) == 80 - 6 - 4 - 1
    assert len(te) == 20 - 6 - 4 - 1


class _ToyDataset:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return (np.full((2, 3), i, np.float32), np.full((1,), i, np.float32))


@pytest.mark.parametrize("workers", [0, 2])
def test_batcher(workers):
    b = Batcher(_ToyDataset(), batch_size=4, shuffle=True, seed=0,
                num_workers=workers)
    batches = list(b)
    assert len(batches) == 2  # drop_last
    cond, tgt = batches[0]
    assert cond.shape == (4, 2, 3) and tgt.shape == (4, 1)
    # all indices distinct across the epoch
    seen = np.concatenate([t[1].ravel() for t in batches])
    assert len(set(seen.tolist())) == 8
