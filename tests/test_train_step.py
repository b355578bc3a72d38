"""Distributed train-step tests on the 8-virtual-device CPU mesh
(SURVEY.md §4: the idiomatic JAX fake-backend replacement)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.models.factory import build_separable_network
from spatiotemporal_variable_separation_tpu.parallel.mesh import (
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from spatiotemporal_variable_separation_tpu.train.state import create_train_state
from spatiotemporal_variable_separation_tpu.train.step import (
    make_optimizer,
    make_train_step,
    multistep_lr,
)


def wave_cfg(**kw):
    base = dict(data="wave", architecture="mlp", mixing="mul", code_size_s=16,
                code_size_t=16, enc_hidden_size=32, dec_hidden_size=32,
                res_hidden_size=32, n_blocks=1, nt_cond=4, nt_pred=3, offset=4,
                precision="f32", batch_size=16, lr=1e-3)
    base.update(kw)
    return ExperimentConfig(**base)


def _batch(cfg, rng):
    seq = rng.random((cfg.batch_size, cfg.nt_cond + cfg.nt_pred) + cfg.frame_shape)
    seq = seq.astype(np.float32)
    return jnp.asarray(seq[:, :cfg.nt_cond]), jnp.asarray(seq[:, cfg.nt_cond:])


def test_multistep_lr_schedule():
    sched = multistep_lr(1.0, [2, 4], 0.5, steps_per_epoch=10)
    assert float(sched(0)) == 1.0
    assert float(sched(19)) == 1.0
    assert float(sched(20)) == 0.5   # epoch 2
    assert float(sched(39)) == 0.5
    assert float(sched(40)) == 0.25  # epoch 4


def test_single_device_step_updates_params():
    cfg = wave_cfg()
    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, 10)
    state = create_train_state(model, cfg, tx)
    step = make_train_step(model, cfg, tx)
    cond, target = _batch(cfg, np.random.default_rng(0))
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, metrics = step(state, cond, target)
    assert int(state.step) == 1
    assert not np.allclose(np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
                           np.asarray(p0))
    assert np.isfinite(float(metrics["loss"]))


def test_mesh_step_runs_and_matches_semantics():
    cfg = wave_cfg()
    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, 10)
    mesh = make_mesh(8)
    step = make_train_step(model, cfg, tx, mesh)
    state = jax.device_put(create_train_state(model, cfg, tx),
                           replicated_sharding(mesh))
    cond, target = shard_batch(mesh, _batch(cfg, np.random.default_rng(0)))
    for _ in range(2):
        state, metrics = step(state, cond, target)
    assert int(state.step) == 2 and np.isfinite(float(metrics["loss"]))


def test_mesh_and_single_device_agree():
    """The sharded step must be numerically equivalent to the single-device
    step (global-batch semantics)."""
    import optax

    cfg = wave_cfg()
    model = build_separable_network(cfg)
    # SGD: updates are linear in the gradients, so sharded-vs-single float
    # noise stays tiny.  (Adam divides by sqrt(v): for params whose gradient
    # is ~0, reduction-order noise flips the update sign and produces O(lr)
    # param differences — expected, and excluded from this equivalence test.)
    tx = optax.sgd(1e-2)
    batch = _batch(cfg, np.random.default_rng(1))

    s1 = create_train_state(model, cfg, tx)
    step1 = make_train_step(model, cfg, tx)
    s1, m1 = step1(s1, *batch)

    mesh = make_mesh(8)
    s8 = jax.device_put(create_train_state(model, cfg, tx),
                        replicated_sharding(mesh))
    step8 = make_train_step(model, cfg, tx, mesh)
    s8, m8 = step8(s8, *shard_batch(mesh, batch))

    # tolerance: sharded reductions sum in a different order than the
    # single-device pass, so bit-identity is not expected.
    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_overfit_fixed_batch():
    cfg = wave_cfg()
    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, 10)
    state = create_train_state(model, cfg, tx)
    step = make_train_step(model, cfg, tx)
    t = np.arange(cfg.nt_cond + cfg.nt_pred)[None, :, None, None, None]
    xx = np.linspace(0, 2 * np.pi, 64)
    field = (np.sin(xx[None, None, :, None, None] + 0.3 * t)
             * np.cos(xx[None, None, None, :, None]))
    seq = (0.5 + 0.4 * field).astype(np.float32)
    seq = np.broadcast_to(seq, (cfg.batch_size,) + seq.shape[1:])
    cond = jnp.asarray(seq[:, :cfg.nt_cond])
    target = jnp.asarray(seq[:, cfg.nt_cond:])
    losses = []
    for _ in range(80):
        state, metrics = step(state, cond, target)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.5 * losses[0]


def test_batchnorm_stats_update_in_dp_step():
    cfg = ExperimentConfig(data="mnist", architecture="dcgan", code_size_s=8,
                           code_size_t=8, enc_hidden_size=4, dec_hidden_size=4,
                           res_hidden_size=8, nt_cond=2, nt_pred=2, offset=2,
                           precision="f32", batch_size=8, mixing="mul")
    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, 10)
    mesh = make_mesh(8)
    state = jax.device_put(create_train_state(model, cfg, tx),
                           replicated_sharding(mesh))
    rng = np.random.default_rng(0)
    seq = rng.random((8, 4, 64, 64, 1)).astype(np.float32)
    cond, target = shard_batch(mesh, (jnp.asarray(seq[:, :2]), jnp.asarray(seq[:, 2:])))
    step = make_train_step(model, cfg, tx, mesh)
    bs0 = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
    state, _ = step(state, cond, target)
    bs1 = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert not np.allclose(np.asarray(bs0), np.asarray(bs1))
