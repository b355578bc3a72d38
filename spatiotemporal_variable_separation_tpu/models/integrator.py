"""Temporal residual integrators — one call is one explicit Euler step of the
learned ODE for the dynamic code T (reference ``var_sep/networks/resnet.py``).

* :class:`MLPResnet`  — ``x + MLP(x)`` blocks for flat T codes
  (``resnet.py:22-50``).
* :class:`ConvResnet` — 3x3-conv residual blocks (LeakyReLU + BN) for SST's
  spatial T codes (``resnet.py:53-88``).

Both return ``(x_next, residuals)`` where ``residuals`` is the per-block
residual stacked on a leading axis (the reference returns a Python list;
stacking makes the value scan-carryable on TPU)."""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from spatiotemporal_variable_separation_tpu.models.layers import MLP, ConvBlock

Dtype = Any


class MLPResnet(nn.Module):
    n_blocks: int
    hidden_size: int
    init_type: str = "orthogonal"
    init_gain: float = 1.41
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        del train
        in_size = x.shape[-1]
        residuals = []
        for i in range(self.n_blocks):
            res = MLP(nhid=self.hidden_size, nout=in_size, nlayers=3,
                      init_type=self.init_type, init_gain=self.init_gain,
                      dtype=self.dtype, name=f"block_{i}")(x)
            x = x + res
            residuals.append(res)
        return x, jnp.stack(residuals)


class ConvResnet(nn.Module):
    n_blocks: int = 1
    nf: int = 64
    init_type: str = "orthogonal"
    init_gain: float = 1.41
    dtype: Dtype = jnp.float32
    bn_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        in_c = x.shape[-1]
        kw = dict(kernel=3, stride=1, padding=1, init_type=self.init_type,
                  init_gain=self.init_gain, dtype=self.dtype,
                  bn_dtype=self.bn_dtype)
        residuals = []
        for i in range(self.n_blocks):
            res = x
            for j, (w, act) in enumerate([(self.nf, "leaky_relu"), (self.nf, "leaky_relu"),
                                          (in_c, "none")]):
                res = ConvBlock(features=w, act=act, name=f"block_{i}_conv_{j}", **kw)(res, train=train)
            # in_c == out_c always inside ConvResnet (resnet.py:79), so the
            # shortcut is the identity (reference `up`).
            x = x + res
            residuals.append(res)
        return x, jnp.stack(residuals)
