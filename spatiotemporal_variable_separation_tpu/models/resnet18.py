"""DrNet-style ResNet-18 encoder (reference ``var_sep/networks/conv.py:510-564``).

5x5 stride-2 stem (pad 3) -> BN -> ReLU -> 3x3/2 maxpool -> four stages of two
BasicBlocks (64/128/256/512, stride 2 from stage 2) -> 3x3 valid conv to
``pose_dim`` -> output activation -> flatten.

Divergences from the reference, kept deliberately:
* ``return_skip`` is accepted but skips are never returned — identical to the
  reference, whose ResNet18 ignores it (``conv.py:546-564``); the factory
  forbids skipco for this encoder.
* the reference defines ``bn_out`` but never applies it in ``forward``
  (``conv.py:526``); we do not allocate the dead parameters.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from spatiotemporal_variable_separation_tpu.core.activations import activation
from spatiotemporal_variable_separation_tpu.core.inits import bn_scale_init, conv_kernel_init
from spatiotemporal_variable_separation_tpu.models.layers import max_pool_3x3_s2_p1, merge_time

Dtype = Any


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    bn_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kinit = conv_kernel_init(self.init_type, self.init_gain)
        # BN IO in bn_dtype (f32 default: torch-AMP parity; see
        # layers.ConvBlock) — callers get activations cast back below.
        bn = lambda name: (lambda h: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            scale_init=bn_scale_init(self.init_gain), dtype=self.bn_dtype,
            name=name)(h).astype(self.dtype))
        residual = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), kernel_init=kinit, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)), kernel_init=kinit,
                      dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out)
        if self.downsample:
            residual = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               kernel_init=kinit, dtype=self.dtype, name="down_conv")(x)
            residual = bn("down_bn")(residual)
        return nn.relu(out + residual)


class ResNet18(nn.Module):
    pose_dim: int
    out_f: Optional[str] = None
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32
    bn_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_skip: bool = False, train: bool = False):
        del return_skip  # accepted but ignored, as in the reference
        x = merge_time(x)
        kinit = conv_kernel_init(self.init_type, self.init_gain)
        x = nn.Conv(64, (5, 5), strides=(2, 2), padding=((3, 3), (3, 3)),
                    kernel_init=kinit, dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         scale_init=bn_scale_init(self.init_gain), dtype=self.bn_dtype,
                         name="stem_bn")(x).astype(self.dtype)
        x = nn.relu(x)
        x = max_pool_3x3_s2_p1(x)
        inplanes = 64
        for stage, (planes, stride) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)]):
            for block in range(2):
                s = stride if block == 0 else 1
                down = block == 0 and (s != 1 or inplanes != planes)
                x = BasicBlock(planes=planes, stride=s, downsample=down,
                               init_type=self.init_type, init_gain=self.init_gain,
                               dtype=self.dtype, bn_dtype=self.bn_dtype,
                               name=f"layer{stage + 1}_block{block}")(x, train=train)
            inplanes = planes
        x = nn.Conv(self.pose_dim, (3, 3), padding="VALID", kernel_init=kinit,
                    dtype=self.dtype, name="conv_out")(x)
        x = activation(self.out_f)(x)
        return x.reshape(x.shape[0], -1)
