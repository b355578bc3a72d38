"""Synthetic stand-in corpora generators: files must load through the real
data stacks (ours AND, format-wise, the reference's — see
tests/test_reference_loader_golden.py for the loader-parity guarantee)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from spatiotemporal_variable_separation_tpu.data import synthetic_corpora as sc


def test_taxibj_corpus_loads(tmp_path):
    sc.make_taxibj(str(tmp_path), days_per_year=6)
    from spatiotemporal_variable_separation_tpu.data.taxibj import TaxiBJ

    train, test = TaxiBJ.make_datasets(str(tmp_path), len_closeness=8,
                                       nt_cond=4, len_test=48)
    assert len(train) > 0 and len(test) == 48
    cond, target = train[0]
    assert cond.shape == (4, 32, 32, 2) and target.shape == (4, 32, 32, 2)
    assert 0.0 <= cond.min() and cond.max() <= 1.0  # min-max normalized


def test_sst_corpus_loads(tmp_path):
    sc.make_sst(str(tmp_path), zones=[1, 2], n_days=80)
    from spatiotemporal_variable_separation_tpu.data.sst import SST

    ds = SST(str(tmp_path), nt_cond=4, nt_pred=6, train=True, zones=[1, 2])
    cond, target = ds[0]
    assert cond.shape == (4, 64, 64, 1)
    with h5py.File(tmp_path / "data_1.nc", "r") as f:
        theta = f["thetao"][:]
        assert 280 < theta.mean() < 310  # Kelvin-like physical range
        assert f["daily_mean"].shape == (80,)


def test_chairs_corpus_loads(tmp_path):
    sc.make_chairs(str(tmp_path), n_objects=4)
    from spatiotemporal_variable_separation_tpu.data.chairs import Chairs

    ds = Chairs(True, str(tmp_path), nt_cond=3, seq_len=15)
    cond, target = ds[0]
    assert cond.shape == (3, 64, 64, 3) and target.shape == (12, 64, 64, 3)
    # views rotate: consecutive renders differ, white background preserved
    assert not np.array_equal(cond[0], cond[1])
    assert cond.max() == 1.0


def test_mnist_standin_corpus_loads(tmp_path):
    pytest.importorskip("sklearn")
    sc.make_mnist_standin(str(tmp_path), seed=3, n_test=100)
    from spatiotemporal_variable_separation_tpu.data.moving_mnist import load_mnist

    tr_img, tr_lbl = load_mnist(str(tmp_path), train=True)
    te_img, te_lbl = load_mnist(str(tmp_path), train=False)
    assert tr_img.shape[1:] == (28, 28) and tr_img.dtype == np.uint8
    assert len(te_img) == 100 and len(tr_img) + len(te_img) == 1797
    # stratified test split: exactly n_test/10 per class
    assert np.bincount(te_lbl, minlength=10).tolist() == [10] * 10
    # MNIST layout: glyph confined to the centered 20x20 box, real contrast
    assert tr_img[:, :4, :].max() == 0 and tr_img[:, :, 24:].max() == 0
    assert tr_img.max() == 255
    # deterministic in the seed
    sc.make_mnist_standin(str(tmp_path / "b"), seed=3, n_test=100)
    tr2, _ = load_mnist(str(tmp_path / "b"), train=True)
    assert np.array_equal(tr_img, tr2)
