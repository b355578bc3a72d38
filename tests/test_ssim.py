"""SSIM golden tests against the reference torch implementation
(imported read-only from /root/reference — torch is available)."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.ops.metrics import mse_per_frame, psnr_from_mse
from spatiotemporal_variable_separation_tpu.ops.ssim import (
    gaussian_window,
    ssim,
    ssim_per_frame,
)

REFERENCE = "/root/reference"


def _ref_ssim():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from var_sep.utils.ssim import ssim_loss

    return ssim_loss


def test_window_sums_to_one():
    w = np.asarray(gaussian_window())
    assert w.shape == (11, 11)
    assert abs(w.sum() - 1.0) < 1e-6
    assert w[5, 5] == w.max()


def test_identical_inputs_give_one():
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 1)), jnp.float32)
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
@pytest.mark.parametrize("channels", [1, 3])
def test_golden_vs_reference_torch(channels):
    import torch

    ssim_loss = _ref_ssim()
    rng = np.random.default_rng(1)
    a = rng.random((4, channels, 48, 48)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    ref = ssim_loss(torch.tensor(a), torch.tensor(b), max_val=1.0,
                    reduction="none").numpy()
    ours = np.asarray(ssim(jnp.asarray(a.transpose(0, 2, 3, 1)),
                           jnp.asarray(b.transpose(0, 2, 3, 1)),
                           reduction="none"))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=2e-5)


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")
def test_per_frame_wrapper_golden():
    import torch

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from var_sep.test.utils import _ssim_wrapper

    rng = np.random.default_rng(2)
    pred = rng.random((2, 5, 1, 64, 64)).astype(np.float32)
    gt = np.clip(pred + rng.normal(0, 0.05, pred.shape), 0, 1).astype(np.float32)
    ref = _ssim_wrapper(torch.tensor(pred), torch.tensor(gt)).numpy()  # (B,T,C)
    ours = np.asarray(ssim_per_frame(jnp.asarray(pred.transpose(0, 1, 3, 4, 2)),
                                     jnp.asarray(gt.transpose(0, 1, 3, 4, 2))))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_mse_psnr():
    pred = jnp.zeros((1, 2, 4, 4, 1))
    gt = jnp.full((1, 2, 4, 4, 1), 0.5)
    mse = mse_per_frame(pred, gt)
    assert mse.shape == (1, 2, 1)
    np.testing.assert_allclose(np.asarray(mse), 0.25)
    np.testing.assert_allclose(np.asarray(psnr_from_mse(mse)),
                               10 * np.log10(1 / 0.25))


def test_ssim_bounded_and_f32_compute_with_bf16_inputs():
    # SSIM is mathematically <= 1 (Cauchy-Schwarz on the weighted moments);
    # the TPU default bf16 conv precision violated this through the
    # E[x^2]-mu^2 cancellation (measured mean 1.05 on a real eval).  The
    # moment convs must compute in f32 regardless of input dtype and at
    # Precision.HIGHEST on accelerators.
    rng = np.random.default_rng(3)
    base = rng.random((64, 64, 3)).astype(np.float32)
    gt = np.stack([np.roll(base, i, axis=1) for i in range(4)])
    pred = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1).astype(np.float32)
    exact = np.asarray(ssim(jnp.asarray(gt), jnp.asarray(pred),
                            reduction="none"))
    assert exact.max() <= 1.0 + 1e-5
    lowp = np.asarray(ssim(jnp.asarray(gt, jnp.bfloat16),
                           jnp.asarray(pred, jnp.bfloat16), reduction="none"))
    assert lowp.dtype == np.float32
    # bf16 inputs quantize the pixels themselves, but the moment math must
    # stay exact: no above-one blowup and close to the f32-input result.
    assert lowp.max() <= 1.0 + 1e-5
    np.testing.assert_allclose(lowp, exact, atol=0.05)
    # the adversarial regime: near-constant bf16 images, where squaring in
    # the input dtype (pre-fix behavior) yields values like 126 / -308.
    flat_gt = (0.7 + rng.normal(0, 0.003, gt.shape)).astype(np.float32)
    flat_pred = (0.7 + rng.normal(0, 0.003, gt.shape)).astype(np.float32)
    m = np.asarray(ssim(jnp.asarray(flat_gt, jnp.bfloat16),
                        jnp.asarray(flat_pred, jnp.bfloat16),
                        reduction="none"))
    assert m.max() <= 1.0 + 1e-5 and m.min() >= -1.0 - 1e-5
