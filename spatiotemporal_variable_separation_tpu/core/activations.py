"""Activation registry.

Mirrors the behaviour of the reference activation factory
(``var_sep/networks/utils.py:50-72``): relu, leaky_relu(0.2), elu, sigmoid,
tanh, identity (``None``/``"identity"``/``"none"``).  Returned values are
plain jnp functions (TPU elementwise ops run on the VPU and are fused into
the surrounding convolution/matmul by XLA, so there is nothing to gain from
module-level activations).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

Activation = Callable[[jnp.ndarray], jnp.ndarray]

_REGISTRY: dict[Optional[str], Activation] = {
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.2),
    "elu": jax.nn.elu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
    None: lambda x: x,
}


def activation(name: Optional[str]) -> Activation:
    """Look up an activation by name.

    ``None`` and ``"identity"`` return the identity; ``"none"`` is accepted
    as the sentinel used by block builders for "no activation".
    """
    if name == "none":
        return _REGISTRY["identity"]
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(f"Activation function `{name}` not implemented") from None


def register_activation(name: str, fn: Activation) -> None:
    """Extension hook: register a custom activation under ``name``."""
    _REGISTRY[name] = fn
