"""Chairs dataset + disentanglement eval on a synthetic PNG fixture."""

import os

import numpy as np
import pytest

from spatiotemporal_variable_separation_tpu.data.chairs import Chairs

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture
def chairs_dir(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "rendered_chairs"
    for obj in range(8):
        d = root / f"chair_{obj:03d}" / "renders"
        d.mkdir(parents=True)
        base = rng.integers(0, 255, (64, 64, 3), np.uint8)
        for i in range(Chairs.max_length):
            img = np.roll(base, i, axis=1)  # rotation-like dynamics
            Image.fromarray(img).save(d / f"{i}.png")
    (root / "all_chair_names.mat").write_bytes(b"stub")
    return str(tmp_path)


def test_chairs_split_and_items(chairs_dir):
    train = Chairs(True, chairs_dir, nt_cond=3, seq_len=8)
    test = Chairs(False, chairs_dir, nt_cond=3, seq_len=8)
    # 8 objects -> 6 train (85%) / 2 test
    assert train.stop_idx - train.start_idx == 6
    assert test.stop_idx - test.start_idx == 2
    assert len(train) == 62 * 6
    cond, target = train[0]
    assert cond.shape == (3, 64, 64, 3) and target.shape == (5, 64, 64, 3)
    assert cond.max() <= 1.0 and cond.min() >= 0.0


def test_chairs_wraparound(chairs_dir):
    ds = Chairs(True, chairs_dir, nt_cond=2, seq_len=5)
    # start at id 60 -> frames 60, 61, 0, 1, 2 (wraparound mod 62)
    seq = ds.get_sequence(0, chosen_idx=0, chosen_id_st=60)
    direct0 = ds.get_sequence(0, chosen_idx=0, chosen_id_st=0)
    np.testing.assert_array_equal(seq[2], direct0[0])


def test_chairs_deterministic_shuffle(chairs_dir):
    a = Chairs(True, chairs_dir, nt_cond=2, seq_len=5)
    b = Chairs(True, chairs_dir, nt_cond=2, seq_len=5)
    assert a.sequences == b.sequences  # RandomState(42) shuffle


def test_chairs_swap_eval(chairs_dir, tmp_path):
    import jax
    import jax.numpy as jnp

    from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
    from spatiotemporal_variable_separation_tpu.eval.chairs_swap import evaluate
    from spatiotemporal_variable_separation_tpu.models.factory import (
        build_separable_network,
    )

    cfg = ExperimentConfig(data="chairs", architecture="resnet",
                           decoder_architecture="dcgan", code_size_s=16,
                           code_size_t=8, enc_hidden_size=4, dec_hidden_size=4,
                           res_hidden_size=8, nt_cond=2, nt_pred=3, offset=2,
                           precision="f32")
    model = build_separable_network(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((2, 2, 64, 64, 3)),
                           2, train=False)
    out = tmp_path / "xp_out"
    out.mkdir()
    means = evaluate(str(out), chairs_dir, nt_pred=3, batch_size=4, max_batches=1,
                     model_bundle=(model, dict(variables), cfg))
    assert set(means) == {"mse", "psnr", "ssim"}
    assert np.isfinite(means["mse"])


def test_chairs_frame_cache_identical(chairs_dir):
    plain = Chairs(False, chairs_dir, nt_cond=3, seq_len=8)
    cached = Chairs(False, chairs_dir, nt_cond=3, seq_len=8,
                    cache_frames=True)
    for i in (0, 1, len(plain) - 1):
        for a, b in zip(plain[i], cached[i]):
            np.testing.assert_array_equal(a, b)
    # second pass hits the cache and must stay identical
    for a, b in zip(plain[0], cached[0]):
        np.testing.assert_array_equal(a, b)
    assert len(cached._frame_cache) > 0
