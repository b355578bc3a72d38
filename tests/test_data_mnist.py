"""Moving MNIST tests: golden parity with the reference collision geometry
(imported read-only from /root/reference) and pipeline round-trips."""

import os
import sys
import types

import numpy as np
import pytest

from spatiotemporal_variable_separation_tpu.data.moving_mnist import (
    MovingMNIST,
    composite,
    load_mnist,
    make_test_set,
    sample_trajectories,
    synthetic_digits,
)

REFERENCE = "/root/reference"


def _import_reference_mm():
    """Import the reference MovingMNIST with torchvision stubbed (it is only
    used for downloads, which this test never does)."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.datasets = types.SimpleNamespace(MNIST=None)
        sys.modules["torchvision"] = tv
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from var_sep.data.moving_mnist import MovingMNIST as RefMM

    return RefMM


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_deterministic_trajectory_golden_parity():
    RefMM = _import_reference_mm()
    ref = RefMM([], 64, 0, 40, 4, True, 1, True)
    np.random.seed(1234)
    ref_trajs = np.array([ref._compute_trajectory(28, 28) for _ in range(100)])
    ours = sample_trajectories(np.random.RandomState(1234), 100, 40, 64, 28, 4, True)
    np.testing.assert_array_equal(ref_trajs, ours)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_trajectory_parity_small_frame():
    # tighter box (48px, 20px digit) exercises more bounces
    RefMM = _import_reference_mm()
    ref = RefMM([], 48, 0, 30, 4, True, 1, True)
    np.random.seed(7)
    ref_trajs = np.array([ref._compute_trajectory(20, 20) for _ in range(100)])
    ours = sample_trajectories(np.random.RandomState(7), 100, 30, 48, 20, 4, True)
    np.testing.assert_array_equal(ref_trajs, ours)


def test_trajectory_bounds_and_speed_invariants():
    trajs = sample_trajectories(np.random.RandomState(0), 500, 50, 64, 28, 4, True)
    pos, spd = trajs[..., :2], trajs[..., 2:]
    assert pos.min() >= 0 and pos.max() <= 36
    assert np.abs(spd).max() <= 4
    # deterministic: |speed| conserved along each axis
    assert (np.abs(spd[:, 1:]) == np.abs(spd[:, :1])).all()


def test_stochastic_trajectories_stay_in_bounds():
    trajs = sample_trajectories(np.random.RandomState(0), 200, 50, 64, 28, 4, False)
    assert trajs[..., :2].min() >= 0 and trajs[..., :2].max() <= 36
    assert np.abs(trajs[..., 2:]).max() <= 4


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_stochastic_trajectory_golden_parity():
    """Stochastic dynamics byte-identical to the reference retroactive
    solver, including the two-resample-per-bounce RNG call order."""
    RefMM = _import_reference_mm()
    ref = RefMM([], 64, 0, 60, 4, False, 1, True)
    np.random.seed(99)
    ref_trajs = np.array([ref._compute_trajectory(28, 28) for _ in range(200)])
    ours = sample_trajectories(np.random.RandomState(99), 200, 60, 64, 28, 4, False)
    np.testing.assert_array_equal(ref_trajs, ours)


def test_composite_overlap_clipping():
    imgs = np.full((1, 2, 28, 28), 200, np.uint8)
    trajs = np.zeros((1, 2, 1, 4), np.int32)  # both digits at (0, 0)
    video = composite(trajs, imgs, 64)
    assert video.shape == (1, 1, 64, 64, 1)
    assert float(video.max()) == 1.0  # 400 clipped to 255 -> 1.0
    assert float(video[0, 0, 40, 40, 0]) == 0.0


from conftest import write_idx_images as _write_idx_images
from conftest import write_idx_labels as _write_idx_labels


@pytest.fixture
def mnist_dir(tmp_path):
    digits = synthetic_digits(40)
    labels = (np.arange(40) % 10).astype(np.uint8)
    _write_idx_images(tmp_path / "train-images-idx3-ubyte", digits)
    _write_idx_labels(tmp_path / "train-labels-idx1-ubyte", labels)
    _write_idx_images(tmp_path / "t10k-images-idx3-ubyte", digits[:20])
    _write_idx_labels(tmp_path / "t10k-labels-idx1-ubyte", labels[:20])
    return str(tmp_path)


def test_load_mnist_idx(mnist_dir):
    imgs, labels = load_mnist(mnist_dir, train=True)
    assert imgs.shape == (40, 28, 28) and labels.shape == (40,)


def test_make_test_set_and_reload(mnist_dir):
    path = make_test_set(mnist_dir, seq_len=12, seed=42, digits=2)
    d = np.load(path, allow_pickle=True)
    assert d["sequences"].shape == (12, 10, 1, 64, 64)
    assert d["latents"].shape == (12, 10, 2, 4)
    assert d["labels"].shape == (10, 2)
    ds = MovingMNIST.make_dataset(mnist_dir, 64, 3, 10, 4, True, 2, train=False)
    cond, target = ds[0]
    assert cond.shape == (3, 64, 64, 1) and target.shape == (7, 64, 64, 1)
    assert 0.0 <= cond.min() and cond.max() <= 1.0


def test_train_dataset_generates(mnist_dir):
    ds = MovingMNIST.make_dataset(mnist_dir, 64, 3, 8, 4, True, 2, train=True)
    assert len(ds) == 200_000
    cond, target = ds[5]
    assert cond.shape == (3, 64, 64, 1) and target.shape == (5, 64, 64, 1)
    batch = ds.generate_batch(4)
    assert batch.shape == (4, 8, 64, 64, 1)
    assert batch.max() <= 1.0 and batch.min() >= 0.0


def test_make_test_set_n_seq_override(mnist_dir, tmp_path):
    """``n_seq`` extension: below the corpus bound the output is a byte
    -identical truncation of the unforced generator; above it, digits wrap
    modulo the corpus (the paper-scale 5,000-sequence protocol on the
    stand-in corpus) with distinct trajectories throughout."""
    base = np.load(make_test_set(mnist_dir, seq_len=6, seed=42, digits=2),
                   allow_pickle=True)
    small = np.load(make_test_set(mnist_dir, seq_len=6, seed=42, digits=2,
                                  out_dir=str(tmp_path / "small"), n_seq=4),
                    allow_pickle=True)
    np.testing.assert_array_equal(small["sequences"],
                                  base["sequences"][:, :4])
    np.testing.assert_array_equal(small["latents"], base["latents"][:, :4])
    np.testing.assert_array_equal(small["labels"], base["labels"][:4])

    # fixture has 20 test digits -> unforced n_seq = 10; force 25 (wraps)
    big = np.load(make_test_set(mnist_dir, seq_len=6, seed=42, digits=2,
                                out_dir=str(tmp_path / "big"), n_seq=25),
                  allow_pickle=True)
    assert big["sequences"].shape == (6, 25, 1, 64, 64)
    assert big["latents"].shape == (6, 25, 2, 4)
    # the prefix still matches the canonical draw order
    np.testing.assert_array_equal(big["latents"][:, :10], base["latents"])
    # wrapped sequences reuse digit images but carry fresh trajectories
    flat = big["latents"].transpose(1, 2, 0, 3).reshape(25, -1)
    assert np.unique(flat, axis=0).shape[0] == 25


def test_test_set_videos_match_latent_replay(mnist_dir):
    """The stored sequences must equal compositing the stored latents with
    the stored digit images (the disentanglement eval replays latents)."""
    path = make_test_set(mnist_dir, seq_len=6, seed=1, digits=2)
    d = np.load(path, allow_pickle=True)
    lat = d["latents"].transpose(1, 2, 0, 3)  # (N, digits, T, 4)
    videos = composite(lat, d["digits"], 64)
    stored = d["sequences"].transpose(1, 0, 3, 4, 2).astype(np.float32) / 255.0
    np.testing.assert_allclose(videos, stored, atol=1 / 255.0 + 1e-6)
