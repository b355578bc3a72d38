"""SSIM in JAX (channels-last, jit/vmap-friendly).

Computation parity with the reference's vendored torch implementation
(``var_sep/utils/ssim.py:81-149``, itself from PyTorch PR #22289):

* Gaussian window built by *softmax* over the flattened
  ``-(dx^2+dy^2)/(2 sigma^2)`` grid (equivalent to a normalized Gaussian,
  but kept softmax-exact for golden parity),
* per-channel (depthwise) valid convolutions for the local moments,
* ``c1 = (k1 max)^2``, ``c2 = (k2 max)^2``.

The reference's 2-D/3-D input branches are dead code with a latent bug
(``ssim.py:129-137`` calls ``input.dim(-2)``); only the 4-D path is
reproduced.  Layout here is (B, H, W, C).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def gaussian_window(filter_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """(filter_size, filter_size) window, softmax-normalized."""
    coords = jnp.arange(filter_size, dtype=jnp.float32) - (filter_size - 1) / 2.0
    g = -(coords ** 2) / (2.0 * sigma ** 2)
    grid = g[None, :] + g[:, None]
    return jax.nn.softmax(grid.reshape(-1)).reshape(filter_size, filter_size)


def _depthwise_valid(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    c = x.shape[-1]
    kernel = jnp.broadcast_to(window[:, :, None, None],
                              window.shape + (1, c)).astype(jnp.float32)
    # Precision.HIGHEST: on TPU the default conv precision is bf16 MXU
    # passes, and the E[x^2]-mu^2 variance cancellation downstream amplifies
    # that to metric-breaking error (measured: mean SSIM 1.05 — above the
    # mathematical bound of 1 — on a chairs eval that scores 0.76 in exact
    # arithmetic).  An 11x11 depthwise window is negligible compute; always
    # run it exact.  (Inputs are f32 already: ssim_map casts before the
    # x*x products, which would otherwise quantize in the input dtype.)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)


def ssim_map(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0,
             filter_size: int = 11, k1: float = 0.01, k2: float = 0.03,
             sigma: float = 1.5) -> jnp.ndarray:
    """Per-pixel SSIM map of two (B, H, W, C) batches -> (B, H', W', C)."""
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    # Cast BEFORE the products: a*a in bf16 quantizes exactly the moments
    # whose cancellation the f32/HIGHEST conv path is there to protect.
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    w = gaussian_window(filter_size, sigma)
    mu1 = _depthwise_valid(a, w)
    mu2 = _depthwise_valid(b, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _depthwise_valid(a * a, w) - mu1_sq
    sigma2_sq = _depthwise_valid(b * b, w) - mu2_sq
    sigma12 = _depthwise_valid(a * b, w) - mu1_mu2
    v1 = 2.0 * sigma12 + c2
    v2 = sigma1_sq + sigma2_sq + c2
    return ((2.0 * mu1_mu2 + c1) * v1) / ((mu1_sq + mu2_sq + c1) * v2)


def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0,
         filter_size: int = 11, k1: float = 0.01, k2: float = 0.03,
         sigma: float = 1.5, reduction: str = "mean") -> jnp.ndarray:
    """SSIM of (B, H, W, C) batches; reduction 'mean'|'sum'|'none'."""
    m = ssim_map(a, b, max_val, filter_size, k1, k2, sigma)
    if reduction == "mean":
        return jnp.mean(m)
    if reduction == "sum":
        return jnp.sum(m)
    return m


@partial(jax.jit, static_argnames=("max_val",))
def ssim_per_frame(pred: jnp.ndarray, gt: jnp.ndarray,
                   max_val: float = 1.0) -> jnp.ndarray:
    """Per-frame-per-channel SSIM of (B, T, H, W, C) sequences ->
    (B, T, C); the reference's ``_ssim_wrapper`` (``test/utils.py:19-24``)."""
    b, t = pred.shape[:2]
    m = ssim_map(pred.reshape((b * t,) + pred.shape[2:]),
                 gt.reshape((b * t,) + gt.shape[2:]), max_val)
    return m.mean(axis=(1, 2)).reshape(b, t, -1)
