"""NN primitives: conv/linear blocks and the shared MLP.

TPU-native equivalents of the reference primitives
(``var_sep/networks/conv.py:41-60`` make_conv_block,
``var_sep/networks/mlp.py:24-75`` make_lin_block/MLP):

* ``ConvBlock``  = Conv/ConvTranspose -> BatchNorm -> activation,
* ``LinBlock``   = pre-activation Dense,
* ``MLP``        = stack of LinBlocks (first layer without activation).

All blocks are channels-last, take an explicit ``train`` flag for BatchNorm
mode, compute in ``dtype`` (bf16 by default on TPU) with float32 parameters,
and accept torch-semantics initializers from
:mod:`spatiotemporal_variable_separation_tpu.core.inits`.

Padding translation: torch's integer padding ``p`` maps to explicit
``((p, p), (p, p))`` for Conv and ``((k-1-p, k-1-p), ...)`` for
ConvTranspose (output-size parity with ``torch.nn.ConvTranspose2d``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from spatiotemporal_variable_separation_tpu.core.activations import activation
from spatiotemporal_variable_separation_tpu.core.inits import (
    bn_scale_init,
    conv_kernel_init,
    conv_transpose_kernel_init,
    dense_kernel_init,
)

Dtype = Any


class ConvBlock(nn.Module):
    """Conv (or ConvTranspose) -> optional BatchNorm -> activation."""

    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    transpose: bool = False
    bn: bool = True
    act: Optional[str] = "leaky_relu"
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    bn_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel
        if self.transpose:
            pad = k - 1 - self.padding
            x = nn.ConvTranspose(
                self.features,
                (k, k),
                strides=(self.stride, self.stride),
                padding=((pad, pad), (pad, pad)),
                kernel_init=conv_transpose_kernel_init(self.init_type, self.init_gain),
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
            p = self.padding
            x = nn.Conv(
                self.features,
                (k, k),
                strides=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                kernel_init=conv_kernel_init(self.init_type, self.init_gain),
                dtype=self.dtype,
                name="conv",
            )(x)
        if self.bn:
            # BatchNorm IO runs in ``bn_dtype`` — f32 by default, matching
            # torch/Apex AMP O1 (norms are blacklisted from f16 there).
            # Batch/running statistics accumulate in f32 REGARDLESS of
            # bn_dtype (flax forces f32 reductions): bf16 batch statistics
            # at large activation scale are what corrupted eval-mode
            # quality in the round-2 MNIST run (BASELINE.md "bf16
            # destabilizes" section). ``bn_dtype=compute`` (--bn_io
            # compute) keeps the normalized tensor in the compute dtype —
            # a byte-traffic lever on memory-bound conv steps.
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,  # torch BatchNorm2d momentum=0.1
                epsilon=1e-5,
                scale_init=bn_scale_init(self.init_gain),
                dtype=self.bn_dtype,
                name="bn",
            )(x)
            x = x.astype(self.dtype)
        return activation(self.act)(x)


class LinBlock(nn.Module):
    """Pre-activation linear block (activation, then Dense)."""

    features: int
    act: Optional[str] = "none"
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = activation(self.act)(x)
        return nn.Dense(
            self.features,
            kernel_init=dense_kernel_init(self.init_type, self.init_gain),
            dtype=self.dtype,
            name="linear",
        )(x)


class MLP(nn.Module):
    """n-layer pre-activation MLP (reference ``mlp.py:44-75``).

    Layer il maps ``nhid -> nhid`` (first from input size, last to ``nout``)
    with the activation applied before every Dense except the first.
    """

    nhid: int
    nout: int
    nlayers: int
    act: str = "relu"
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.nhid == 0 or self.nlayers > 1
        for il in range(self.nlayers):
            x = LinBlock(
                features=self.nout if il == self.nlayers - 1 else self.nhid,
                act=self.act if il > 0 else "none",
                init_type=self.init_type,
                init_gain=self.init_gain,
                dtype=self.dtype,
                name=f"block_{il}",
            )(x)
        return x


def merge_time(x: jnp.ndarray) -> jnp.ndarray:
    """Fold a (B, T, H, W, C) sequence into (B, H, W, T*C) channels.

    Channel index t*C + c matches the reference's NCHW
    ``x.view(B, T*C, H, W)`` stacking (``conv.py:90``).
    """
    b, t, h, w, c = x.shape
    return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, t * c)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsampling (torch ``nn.Upsample(mode='nearest')``)."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def max_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def max_pool_3x3_s2_p1(x: jnp.ndarray) -> jnp.ndarray:
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
