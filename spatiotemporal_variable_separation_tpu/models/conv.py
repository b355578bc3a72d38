"""Convolutional encoder/decoder families (channels-last, bf16-ready).

TPU-native re-designs of the reference architectures:

* DCGAN-64 encoder/decoder     (reference ``var_sep/networks/conv.py:102-124,
  233-264``): 4 stride-2 4x4 convs down to 4x4, flatten+Dense to the code;
  mirrored transposed convs up, with optional U-Net skip concatenation.
* VGG-64 (and 32px variant) encoder/decoder (``conv.py:127-171, 267-320``):
  double/triple 3x3 conv stages with 2x max-pooling, final 4x4 valid conv to
  the code; nearest-upsample decoder.
* SST pair (``conv.py:323-426``): encoder to a *spatial* (16x16) code with
  U-Net skips; decoders with/without skip concatenation.

Encoders take (B, T, H, W, C) sequences — the conditioning window is folded
into channels exactly as the reference stacks frames (``conv.py:90``) — and
return a flat (B, nh) code plus optional skip feature maps (outermost stage
last, i.e. reversed, ``conv.py:98``).  Decoders take the mixed (S, T) code
and render one frame.  Everything is static-shaped and jit/scan-friendly.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from spatiotemporal_variable_separation_tpu.core.activations import activation
from spatiotemporal_variable_separation_tpu.core.inits import dense_kernel_init
from spatiotemporal_variable_separation_tpu.models.layers import (
    ConvBlock,
    max_pool_2x,
    merge_time,
    upsample_nearest_2x,
)

Dtype = Any


def mix_codes(mixing: str, z1: jnp.ndarray, z2: jnp.ndarray) -> jnp.ndarray:
    """Combine S and T codes: channel/feature concat or elementwise product
    (reference ``conv.py:220-223``)."""
    if mixing == "concat":
        return jnp.concatenate([z1, z2], axis=-1)
    return z1 * z2


class DCGAN64Encoder(nn.Module):
    """4x stride-2 4x4 conv pyramid -> flatten -> Dense(nh)."""

    nh: int
    nf: int
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    bn_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_skip: bool = False, train: bool = False):
        x = merge_time(x)
        kw = dict(kernel=4, stride=2, padding=1, init_type=self.init_type,
                  init_gain=self.init_gain, dtype=self.dtype, bn_dtype=self.bn_dtype)
        skips = []
        # First conv has no BatchNorm (reference conv.py:119).
        for i, (feats, bn) in enumerate(
            [(self.nf, False), (self.nf * 2, True), (self.nf * 4, True), (self.nf * 8, True)]
        ):
            x = ConvBlock(features=feats, bn=bn, act="leaky_relu", name=f"stage_{i}", **kw)(x, train=train)
            skips.append(x)
        h = x.reshape(x.shape[0], -1)
        h = nn.Dense(self.nh, kernel_init=dense_kernel_init(self.init_type, self.init_gain),
                     dtype=self.dtype, name="to_code")(h)
        if return_skip:
            return h, skips[::-1]
        return h


class VGG64Encoder(nn.Module):
    """VGG-style conv stages with max-pooling; ``vgg32`` drops one pool for
    32x32 inputs (TaxiBJ)."""

    nh: int
    nf: int
    vgg32: bool = False
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    bn_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_skip: bool = False, train: bool = False):
        x = merge_time(x)
        kw = dict(kernel=3, stride=1, padding=1, act="leaky_relu",
                  init_type=self.init_type, init_gain=self.init_gain, dtype=self.dtype, bn_dtype=self.bn_dtype)
        stage_defs = [
            (False, [self.nf, self.nf]),
            (True, [self.nf * 2, self.nf * 2]),
            (True, [self.nf * 4, self.nf * 4, self.nf * 4]),
            (True, [self.nf * 8, self.nf * 8, self.nf * 8]),
        ]
        skips = []
        for i, (pool, widths) in enumerate(stage_defs):
            if pool:
                x = max_pool_2x(x)
            for j, w in enumerate(widths):
                x = ConvBlock(features=w, name=f"stage_{i}_conv_{j}", **kw)(x, train=train)
            skips.append(x)
        if not self.vgg32:
            x = max_pool_2x(x)
        # 4x4 valid conv to the code, BN but no activation (conv.py:170).
        x = ConvBlock(features=self.nh, kernel=4, stride=1, padding=0, act="none",
                      init_type=self.init_type, init_gain=self.init_gain,
                      dtype=self.dtype, bn_dtype=self.bn_dtype,
                      name="to_code")(x, train=train)
        h = x.reshape(x.shape[0], self.nh)
        if return_skip:
            return h, skips[::-1]
        return h


class DCGAN64Decoder(nn.Module):
    """Mirror of :class:`DCGAN64Encoder` with transposed convs.

    With ``skip=True`` the encoder's stage outputs (reversed) are channel-
    concatenated before each stage (``conv.py:226-229``), doubling input
    widths (``coef=2``, ``conv.py:257``).
    """

    nc: int
    nf: int
    skip: bool = False
    last_activation: Optional[str] = None
    mixing: str = "concat"
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    bn_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z1: jnp.ndarray, z2: jnp.ndarray,
                 skip: Optional[Sequence[jnp.ndarray]] = None, train: bool = False):
        assert (skip is None) == (not self.skip)
        z = mix_codes(self.mixing, z1, z2)
        h = z.reshape(z.shape[0], 1, 1, z.shape[-1])
        kw = dict(init_type=self.init_type, init_gain=self.init_gain,
                  dtype=self.dtype, bn_dtype=self.bn_dtype)
        h = ConvBlock(features=self.nf * 8, kernel=4, stride=1, padding=0,
                      transpose=True, act="leaky_relu", name="first_upconv", **kw)(h, train=train)
        widths = [self.nf * 4, self.nf * 2, self.nf]
        for i, w in enumerate(widths):
            if skip is not None:
                h = jnp.concatenate([h, skip[i].astype(h.dtype)], axis=-1)
            h = ConvBlock(features=w, kernel=4, stride=2, padding=1, transpose=True,
                          act="leaky_relu", name=f"up_{i}", **kw)(h, train=train)
        if skip is not None:
            h = jnp.concatenate([h, skip[3].astype(h.dtype)], axis=-1)
        h = ConvBlock(features=self.nc, kernel=4, stride=2, padding=1, transpose=True,
                      bn=False, act="none", name="to_frame", **kw)(h, train=train)
        return activation(self.last_activation)(h)


class VGG64Decoder(nn.Module):
    """VGG mirror decoder: 4x4 transposed stem then conv stages with nearest
    2x upsampling (``conv.py:267-320``)."""

    nc: int
    nf: int
    skip: bool = False
    last_activation: Optional[str] = None
    mixing: str = "concat"
    vgg32: bool = False
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    bn_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z1: jnp.ndarray, z2: jnp.ndarray,
                 skip: Optional[Sequence[jnp.ndarray]] = None, train: bool = False):
        assert (skip is None) == (not self.skip)
        z = mix_codes(self.mixing, z1, z2)
        h = z.reshape(z.shape[0], 1, 1, z.shape[-1])
        kw = dict(kernel=3, stride=1, padding=1, act="leaky_relu",
                  init_type=self.init_type, init_gain=self.init_gain,
                  dtype=self.dtype, bn_dtype=self.bn_dtype)
        h = ConvBlock(features=self.nf * 8, kernel=4, stride=1, padding=0, transpose=True,
                      act="leaky_relu", init_type=self.init_type, init_gain=self.init_gain,
                      dtype=self.dtype, bn_dtype=self.bn_dtype,
                      name="first_upconv")(h, train=train)
        if not self.vgg32:
            h = upsample_nearest_2x(h)
        stage_defs = [
            ([self.nf * 8, self.nf * 8, self.nf * 4], True),
            ([self.nf * 4, self.nf * 4, self.nf * 2], True),
            ([self.nf * 2, self.nf], True),
        ]
        for i, (widths, up) in enumerate(stage_defs):
            if skip is not None:
                h = jnp.concatenate([h, skip[i].astype(h.dtype)], axis=-1)
            for j, w in enumerate(widths):
                h = ConvBlock(features=w, name=f"stage_{i}_conv_{j}", **kw)(h, train=train)
            if up:
                h = upsample_nearest_2x(h)
        if skip is not None:
            h = jnp.concatenate([h, skip[3].astype(h.dtype)], axis=-1)
        h = ConvBlock(features=self.nf, name="stage_3_conv_0", **kw)(h, train=train)
        # Final ConvTranspose2d(nf, nc, 3, 1, 1): same-size, no BN/activation.
        h = ConvBlock(features=self.nc, kernel=3, stride=1, padding=1, transpose=True,
                      bn=False, act="none", init_type=self.init_type,
                      init_gain=self.init_gain, dtype=self.dtype, name="to_frame")(h, train=train)
        return activation(self.last_activation)(h)


class EncoderSST(nn.Module):
    """SST encoder: conv pyramid to a *spatial* (16x16, out_c) code with
    U-Net skips [h3, h2, h1] (``conv.py:323-356``)."""

    out_c: int
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    bn_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_skip: bool = False, train: bool = False):
        x = merge_time(x)
        kw = dict(kernel=3, stride=1, padding=1, act="leaky_relu",
                  init_type=self.init_type, init_gain=self.init_gain,
                  dtype=self.dtype, bn_dtype=self.bn_dtype)
        h1 = x
        for j, w in enumerate([64, 64]):
            h1 = ConvBlock(features=w, name=f"conv1_{j}", **kw)(h1, train=train)  # (64,64,64)
        h2 = max_pool_2x(h1)
        for j, w in enumerate([128, 128]):
            h2 = ConvBlock(features=w, name=f"conv2_{j}", **kw)(h2, train=train)  # (32,32,128)
        h3 = max_pool_2x(h2)
        for j, w in enumerate([256, 256, 256]):
            h3 = ConvBlock(features=w, name=f"conv3_{j}", **kw)(h3, train=train)  # (16,16,256)
        h4 = h3
        h4 = ConvBlock(features=512, name="conv4_0", **kw)(h4, train=train)
        h4 = ConvBlock(features=self.out_c, name="conv4_1", **kw)(h4, train=train)
        h4 = ConvBlock(features=self.out_c, kernel=3, stride=1, padding=1, act="none",
                       bn=False, init_type=self.init_type, init_gain=self.init_gain,
                       dtype=self.dtype, name="conv4_2")(h4, train=train)
        if return_skip:
            return h4, [h3, h2, h1]
        return h4


class DecoderSSTSkip(nn.Module):
    """SST decoder with U-Net skip concatenation (``conv.py:359-396``).

    Input codes are spatial maps; S and T are channel-concatenated
    (concat-only mixing, enforced by the factory)."""

    out_c: int
    last_activation: Optional[str] = None
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    bn_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, s_code: jnp.ndarray, t_code: jnp.ndarray,
                 skip: Sequence[jnp.ndarray], train: bool = False):
        h3, h2, h1 = skip
        kw = dict(kernel=3, stride=1, padding=1, act="leaky_relu",
                  init_type=self.init_type, init_gain=self.init_gain,
                  dtype=self.dtype, bn_dtype=self.bn_dtype)
        out = jnp.concatenate([s_code, t_code], axis=-1)
        for j, w in enumerate([256, 256, 128]):
            out = ConvBlock(features=w, name=f"conv1_{j}", **kw)(out, train=train)
        out = jnp.concatenate([h3.astype(out.dtype), out], axis=-1)
        for j, w in enumerate([128, 64, 64]):
            out = ConvBlock(features=w, name=f"conv2_{j}", **kw)(out, train=train)
        out = upsample_nearest_2x(out)
        out = jnp.concatenate([h2.astype(out.dtype), out], axis=-1)
        for j, w in enumerate([128, 64, 64]):
            out = ConvBlock(features=w, name=f"conv3_{j}", **kw)(out, train=train)
        out = upsample_nearest_2x(out)
        out = jnp.concatenate([h1.astype(out.dtype), out], axis=-1)
        for j, w in enumerate([64, 64, self.out_c]):
            out = ConvBlock(features=w, name=f"conv4_{j}", **kw)(out, train=train)
        return activation(self.last_activation)(out)


class DecoderSST(nn.Module):
    """SST decoder without skips (``conv.py:399-426``)."""

    out_c: int
    last_activation: Optional[str] = None
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    bn_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, s_code: jnp.ndarray, t_code: jnp.ndarray,
                 skip=None, train: bool = False):
        assert skip is None
        kw = dict(kernel=3, stride=1, padding=1, act="leaky_relu",
                  init_type=self.init_type, init_gain=self.init_gain,
                  dtype=self.dtype, bn_dtype=self.bn_dtype)
        x = jnp.concatenate([s_code, t_code], axis=-1)
        for j, w in enumerate([256, 256, 128]):
            x = ConvBlock(features=w, name=f"conv1_{j}", **kw)(x, train=train)
        x = upsample_nearest_2x(x)
        for j, w in enumerate([128, 128, 64]):
            x = ConvBlock(features=w, name=f"conv2_{j}", **kw)(x, train=train)
        x = upsample_nearest_2x(x)
        for j, w in enumerate([64, self.out_c]):
            x = ConvBlock(features=w, name=f"conv3_{j}", **kw)(x, train=train)
        return activation(self.last_activation)(x)
