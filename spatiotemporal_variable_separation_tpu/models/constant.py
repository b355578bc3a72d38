"""Constant spatial encoder for the ``--no_s`` ablation
(reference ``var_sep/networks/utils.py:21-29``): returns an all-ones code of
``code_size`` so that multiplicative mixing reduces the model to T-only."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConstantS(nn.Module):
    code_size: int
    return_value: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_skip: bool = False, train: bool = False):
        del return_skip, train
        ones = jnp.full((x.shape[0], self.code_size), self.return_value, dtype=self.dtype)
        return ones
