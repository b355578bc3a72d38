"""Functional training state: params + BatchNorm stats + optimizer state.

Capability superset of the reference checkpoint contents (which saves only
module weights, ``utils/helper.py:22-33``): carrying ``opt_state`` and
``step`` makes training resumable, which the reference cannot do."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import core, struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    rng: jax.Array


def create_train_state(model, cfg, tx: optax.GradientTransformation,
                       rng: Optional[jax.Array] = None) -> TrainState:
    """Initialize model variables and optimizer state on host/default device."""
    if rng is None:
        # legacy uint32 key layout: a plain array, so the whole TrainState
        # (rng included) round-trips through Orbax without custom handlers.
        rng = jax.random.PRNGKey(cfg.seed)
    init_rng, state_rng = jax.random.split(rng)
    cond = jnp.zeros((2, cfg.nt_cond) + cfg.frame_shape, jnp.float32)
    variables = model.init(init_rng, cond, 2, train=False)
    params = core.unfreeze(variables["params"])
    batch_stats = core.unfreeze(variables.get("batch_stats", {}))
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state, rng=state_rng)
