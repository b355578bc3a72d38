"""Pixel metrics used by every evaluation protocol (reference
``test/mnist/test.py:136-142``): per-frame MSE maps and PSNR."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def frame_mse(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """(B, T, ...) -> (B, T): spatial(+channel) mean squared error per
    frame, reduced ON DEVICE so only (B, T) scalars return to the host
    (freeze-resistant eval path).  f32 accumulation (TPUs have no native
    f64): the mean over a frame's <=few-thousand squared errors carries
    ~sqrt(n)*eps ~ 1e-6 relative rounding — immaterial at benchmark metric
    scales; callers do the cross-batch mean in f64 on host."""
    err = (pred.astype(jnp.float32) - gt.astype(jnp.float32)) ** 2
    return err.reshape(err.shape[0], err.shape[1], -1).mean(axis=2)


def mse_per_frame(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, T, C): spatial mean of squared error
    (the reference reduces over H, W first, then channels/time)."""
    err = (pred.astype(jnp.float32) - gt.astype(jnp.float32)) ** 2
    return err.mean(axis=(2, 3))


def psnr_from_mse(mse: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """PSNR = 10 log10(max^2 / mse), elementwise."""
    return 10.0 * jnp.log10((max_val ** 2) / mse)
