"""MLP encoder/decoder (reference ``var_sep/networks/mlp_encdec.py``).

Used by the WaveEq/WaveEq-100 benchmarks: the encoder flattens the whole
conditioning window; the decoder mixes (S, T), maps through an MLP, applies
the output activation and reshapes to the frame shape (internal layout —
(H, W, C) for full frames, (N, 1) for partial observations)."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from spatiotemporal_variable_separation_tpu.core.activations import activation
from spatiotemporal_variable_separation_tpu.models.conv import mix_codes
from spatiotemporal_variable_separation_tpu.models.layers import MLP

Dtype = Any


class MLPEncoder(nn.Module):
    nh: int
    hidden_size: int
    nlayers: int
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_skip: bool = False, train: bool = False):
        del return_skip, train  # no skips, no normalization layers
        x = x.reshape(x.shape[0], -1)
        return MLP(nhid=self.hidden_size, nout=self.nh, nlayers=self.nlayers,
                   init_type=self.init_type, init_gain=self.init_gain,
                   dtype=self.dtype, name="mlp")(x)


class MLPDecoder(nn.Module):
    output_shape: Tuple[int, ...]  # internal frame shape, e.g. (64, 64, 1)
    hidden_size: int
    nlayers: int
    last_activation: Optional[str] = None
    mixing: str = "concat"
    init_type: str = "normal"
    init_gain: float = 0.02
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z1: jnp.ndarray, z2: jnp.ndarray, skip=None, train: bool = False):
        assert skip is None
        del train
        z = mix_codes(self.mixing, z1, z2)
        x = MLP(nhid=self.hidden_size, nout=int(np.prod(self.output_shape)),
                nlayers=self.nlayers, init_type=self.init_type,
                init_gain=self.init_gain, dtype=self.dtype, name="mlp")(z)
        x = activation(self.last_activation)(x)
        return x.reshape((-1,) + tuple(self.output_shape))
