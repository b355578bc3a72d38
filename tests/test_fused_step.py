"""Fused datagen+train step: single XLA program, deterministic, mesh-ready."""

import numpy as np

import jax

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.data.mnist_device import DeviceMovingMNIST
from spatiotemporal_variable_separation_tpu.data.moving_mnist import synthetic_digits
from spatiotemporal_variable_separation_tpu.models.factory import build_separable_network
from spatiotemporal_variable_separation_tpu.parallel.mesh import make_mesh, replicated_sharding
from spatiotemporal_variable_separation_tpu.train.state import create_train_state
from spatiotemporal_variable_separation_tpu.train.step import (
    make_fused_datagen_step,
    make_optimizer,
)


def _setup(mesh=None):
    cfg = ExperimentConfig(data="mnist", architecture="dcgan", code_size_s=8,
                           code_size_t=8, enc_hidden_size=4, dec_hidden_size=4,
                           res_hidden_size=8, n_blocks=1, nt_cond=2, nt_pred=2,
                           offset=2, mixing="mul", precision="f32", batch_size=8)
    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, 10)
    state = create_train_state(model, cfg, tx)
    gen = DeviceMovingMNIST(synthetic_digits(32), cfg.nt_cond,
                            cfg.nt_cond + cfg.nt_pred, cfg.n_object)
    step = make_fused_datagen_step(model, cfg, tx, gen, mesh)
    return state, gen, step


def test_fused_step_runs_and_is_deterministic():
    state0, gen, step = _setup()
    s1, m1 = step(state0, gen.data)
    assert int(s1.step) == 1 and np.isfinite(float(m1["loss"]))
    # same initial state -> identical first step
    state0b, gen_b, step_b = _setup()
    s2, m2 = step_b(state0b, gen_b.data)
    assert float(m1["loss"]) == float(m2["loss"])


def test_fused_step_on_mesh():
    mesh = make_mesh(8)
    state, gen, step = _setup(mesh)
    state = jax.device_put(state, replicated_sharding(mesh))
    corpus = jax.device_put(gen.data, replicated_sharding(mesh))
    for _ in range(2):
        state, metrics = step(state, corpus)
    assert int(state.step) == 2 and np.isfinite(float(metrics["loss"]))
