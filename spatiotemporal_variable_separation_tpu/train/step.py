"""The jitted, donated, data-parallel train step.

TPU-native replacement for the reference training inner loop
(``var_sep/train.py:107-162``): one fused XLA computation per batch —
loss (4 terms), backward, Adam update, BatchNorm stat update — with the
batch sharded over the mesh's data axis and gradients all-reduced over ICI
by XLA.  bf16 compute with f32 params replaces Apex/torch AMP (no loss
scaling needed on TPU).  The per-step host ``np.random`` draw of the AE
supervision time (``train.py:72-76``) becomes an on-device
``jax.random.randint`` from the state's PRNG key.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import optax
from flax import core

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.parallel.mesh import (
    batch_sharding,
    replicated_sharding,
)
from spatiotemporal_variable_separation_tpu.train.state import TrainState


def multistep_lr(lr: float, milestones: List[int], decay: float,
                 steps_per_epoch: int) -> optax.Schedule:
    """torch ``MultiStepLR`` semantics (``main.py:146-148``): multiply the
    learning rate by ``decay`` at each epoch milestone; epoch-granular."""
    ms = jnp.asarray(sorted(milestones), jnp.int32)

    def schedule(step):
        epoch = step // steps_per_epoch
        n = jnp.sum(epoch >= ms)
        return lr * decay ** n

    return schedule


def make_optimizer(cfg: ExperimentConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam(lr, beta1, beta2) with optional MultiStep schedule
    (reference ``main.py:145-149``; torch Adam eps=1e-8)."""
    if cfg.scheduler:
        lr = multistep_lr(cfg.lr, cfg.scheduler_milestones, cfg.scheduler_decay,
                          steps_per_epoch)
    else:
        lr = cfg.lr
    return optax.adam(lr, b1=cfg.beta1, b2=cfg.beta2, eps=1e-8)


def make_train_step(model, cfg: ExperimentConfig, tx: optax.GradientTransformation,
                    mesh=None, state_shardings=None) -> Callable:
    """Build ``step(state, cond, target) -> (state, metrics)``, jitted.

    With ``mesh``: state replicated, batch sharded on the data axis, state
    donated.  BatchNorm batch statistics are computed over the *global*
    batch (XLA inserts the cross-replica reductions), which matches
    large-batch single-device semantics rather than per-replica stats.

    ``state_shardings`` (optional, from ``parallel.tensor.state_shardings``)
    replaces the replicated state sharding with a tensor-parallel one on a
    2-D ``(data, model)`` mesh; the step function itself is unchanged —
    GSPMD partitions the matmuls and inserts the collectives.
    """
    cfg = cfg.validate()
    step_fn = _make_step_fn(model, cfg, tx)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    state_sh = state_shardings if state_shardings is not None else repl
    return jax.jit(step_fn,
                   in_shardings=(state_sh, data, data),
                   out_shardings=(state_sh, repl),
                   donate_argnums=0)


def _make_step_fn(model, cfg: ExperimentConfig, tx):
    lamb_t = cfg.effective_lamb_t

    def step_fn(state: TrainState, cond: jnp.ndarray, target: jnp.ndarray):
        rng = jax.random.fold_in(state.rng, state.step)
        total_t = cfg.nt_cond + cfg.nt_pred
        # train.py:72-76: t_random in [nt_cond, T) for offset=0, [nt_cond, T] else.
        upper = total_t if cfg.offset == 0 else total_t + 1
        t_random = jax.random.randint(rng, (), cfg.nt_cond, upper, jnp.int32)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (loss, metrics), mutated = model.apply(
                variables, cond, target, t_random, cfg.offset,
                cfg.lamb_ae, cfg.lamb_s, lamb_t, cfg.lamb_pred,
                cfg.average_tloss, True, lamb_s_norm=cfg.lamb_s_norm,
                method=model.compute_losses, mutable=["batch_stats"])
            return loss, (metrics, mutated.get("batch_stats", state.batch_stats))

        grads, (metrics, new_batch_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # keep the pytree *type* identical to the input (plain dict) so the
        # step never retraces between the first and later invocations.
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=core.unfreeze(new_batch_stats),
                                  opt_state=new_opt_state)
        return new_state, metrics

    return step_fn


def make_fused_datagen_step(model, cfg: ExperimentConfig,
                            tx: optax.GradientTransformation, generator,
                            mesh=None, state_shardings=None) -> Callable:
    """Fuse on-device data synthesis into the train step: one XLA program
    generates the batch (sharded over the mesh) and runs the full update —
    the host only enqueues ``state, metrics = step(state, corpus)``.

    ``generator`` must expose ``make_sample_fn() -> f(data, rng, batch)``
    and ``.data`` (the device corpus, passed explicitly so it lowers as an
    executable parameter rather than an embedded constant).
    """
    cfg = cfg.validate()
    inner = _make_step_fn(model, cfg, tx)
    sample = generator.make_sample_fn()
    nt_cond, batch = cfg.nt_cond, cfg.batch_size

    def step_fn(state: TrainState, data):
        gen_rng = jax.random.fold_in(jax.random.fold_in(state.rng, 2_000_003),
                                     state.step)
        video = sample(data, gen_rng, batch)
        if mesh is not None:
            video = jax.lax.with_sharding_constraint(
                video, batch_sharding(mesh))
        return inner(state, video[:, :nt_cond], video[:, nt_cond:])

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)
    repl = replicated_sharding(mesh)
    state_sh = state_shardings if state_shardings is not None else repl
    return jax.jit(step_fn,
                   in_shardings=(state_sh, repl),
                   out_shardings=(state_sh, repl),
                   donate_argnums=0)
