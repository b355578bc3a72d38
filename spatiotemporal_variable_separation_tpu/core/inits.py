"""Weight-initializer registry with reference-matching semantics.

The reference initializes Conv2d / ConvTranspose2d / Linear weights with one
of ``normal`` / ``xavier`` / ``kaiming`` / ``orthogonal`` and all biases to
zero, and BatchNorm scale with N(1, gain) (``var_sep/networks/utils.py:75-109``).
Those initializers are defined on the *torch* weight layouts:

===============  ===================  =============================
layer            torch weight shape   flax kernel shape (this repo)
===============  ===================  =============================
Linear           (out, in)            (in, out)
Conv             (out, in, kh, kw)    (kh, kw, in, out)
ConvTranspose    (in, out, kh, kw)    (kh, kw, in, out)
===============  ===================  =============================

Distribution-sensitive initializers (orthogonal: which 2-D flattening is
orthogonalized; kaiming: which fan is used — torch uses ``shape[1] * rf``,
which for ConvTranspose is the *output*-channel fan) are computed in the
torch layout and transposed into the flax layout, so parameter distributions
match the reference exactly.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

INIT_TYPES = ("normal", "xavier", "kaiming", "orthogonal")


def _orthogonal_torch(key, rows: int, cols: int, gain: float, dtype) -> jnp.ndarray:
    """Sample an orthogonal matrix with torch.nn.init.orthogonal_ semantics.

    Returns a ``(rows, cols)`` matrix: QR of a Gaussian (taken on the tall
    orientation), sign-corrected by the diagonal of R, scaled by ``gain``.
    """
    tall = rows >= cols
    shape = (rows, cols) if tall else (cols, rows)
    a = jax.random.normal(key, shape, jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))
    if not tall:
        q = q.T
    return (gain * q).astype(dtype)


def dense_kernel_init(init_type: str, gain: float):
    """Initializer for a flax ``Dense`` kernel of shape (in, out)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = int(shape[0]), int(shape[1])
        if init_type == "normal":
            return gain * jax.random.normal(key, shape, dtype)
        if init_type == "xavier":
            std = gain * np.sqrt(2.0 / (fan_in + fan_out))
            return std * jax.random.normal(key, shape, dtype)
        if init_type == "kaiming":
            std = np.sqrt(2.0 / fan_in)
            return std * jax.random.normal(key, shape, dtype)
        if init_type == "orthogonal":
            # torch layout is (out, in); transpose back to (in, out).
            return _orthogonal_torch(key, fan_out, fan_in, gain, dtype).T
        raise NotImplementedError(f"initialization method [{init_type}] is not implemented")

    return init


def conv_kernel_init(init_type: str, gain: float):
    """Initializer for a flax ``Conv`` kernel of shape (kh, kw, in, out)."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = (int(s) for s in shape)
        rf = kh * kw
        if init_type == "normal":
            return gain * jax.random.normal(key, shape, dtype)
        if init_type == "xavier":
            std = gain * np.sqrt(2.0 / ((cin + cout) * rf))
            return std * jax.random.normal(key, shape, dtype)
        if init_type == "kaiming":
            std = np.sqrt(2.0 / (cin * rf))
            return std * jax.random.normal(key, shape, dtype)
        if init_type == "orthogonal":
            w = _orthogonal_torch(key, cout, cin * rf, gain, dtype)
            w = w.reshape(cout, cin, kh, kw)
            return jnp.transpose(w, (2, 3, 1, 0))
        raise NotImplementedError(f"initialization method [{init_type}] is not implemented")

    return init


def conv_transpose_kernel_init(init_type: str, gain: float):
    """Initializer for a flax ``ConvTranspose`` kernel of shape (kh, kw, in, out).

    Note the torch quirk preserved here: for ConvTranspose2d torch's
    ``fan_in`` is ``out_channels * rf`` (it always uses ``shape[1]``), so
    kaiming scaling differs from a regular convolution.
    """

    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = (int(s) for s in shape)
        rf = kh * kw
        if init_type == "normal":
            return gain * jax.random.normal(key, shape, dtype)
        if init_type == "xavier":
            std = gain * np.sqrt(2.0 / ((cin + cout) * rf))
            return std * jax.random.normal(key, shape, dtype)
        if init_type == "kaiming":
            std = np.sqrt(2.0 / (cout * rf))
            return std * jax.random.normal(key, shape, dtype)
        if init_type == "orthogonal":
            # torch layout (in, out, kh, kw) -> flatten rows=in.
            w = _orthogonal_torch(key, cin, cout * rf, gain, dtype)
            w = w.reshape(cin, cout, kh, kw)
            return jnp.transpose(w, (2, 3, 0, 1))
        raise NotImplementedError(f"initialization method [{init_type}] is not implemented")

    return init


def bn_scale_init(gain: float):
    """BatchNorm scale ~ N(1, gain); reference `utils.py:103-107`."""

    def init(key, shape, dtype=jnp.float32):
        return 1.0 + gain * jax.random.normal(key, shape, dtype)

    return init


def zeros_init():
    return jax.nn.initializers.zeros
