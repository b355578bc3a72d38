"""Precision policies: BN-in-f32 under bf16 compute (torch/Apex AMP O1
parity — norms are blacklisted from reduced precision there), and the
experimental ``mixed`` policy (bf16 conv stacks, f32 integrator) motivated
by the round-2 bf16 integrator runaway (BASELINE.md)."""

import numpy as np

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.models.factory import (
    build_separable_network,
    compute_dtype,
    integrator_dtype,
)


def _cfg(precision):
    return ExperimentConfig(
        data="mnist", architecture="dcgan", code_size_s=8, code_size_t=4,
        enc_hidden_size=8, dec_hidden_size=8, res_hidden_size=8, n_blocks=1,
        nt_cond=2, nt_pred=2, offset=2, batch_size=4,
        precision=precision, seed=0).validate()


def test_dtype_mapping():
    assert compute_dtype("bf16") == jnp.bfloat16
    assert compute_dtype("mixed") == jnp.bfloat16
    assert compute_dtype("f32") == jnp.float32
    assert integrator_dtype("bf16") == jnp.bfloat16
    assert integrator_dtype("mixed") == jnp.float32
    assert integrator_dtype("f32") == jnp.float32


def test_bn_stats_are_f32_under_bf16():
    cfg = _cfg("bf16")
    model = build_separable_network(cfg)
    cond = jnp.zeros((4, 2, 64, 64, 1), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), cond, 2, train=False,
                   method=model.get_forecast)
    for leaf in jax.tree_util.tree_leaves(v["batch_stats"]):
        assert leaf.dtype == jnp.float32, "BN statistics must stay f32"


def test_mixed_policy_trains():
    cfg = _cfg("mixed")
    model = build_separable_network(cfg)
    cond = jnp.asarray(np.random.default_rng(0).random((4, 2, 64, 64, 1)),
                       jnp.float32)
    target = jnp.asarray(np.random.default_rng(1).random((4, 2, 64, 64, 1)),
                         jnp.float32)
    v = model.init(jax.random.PRNGKey(0), cond, 2, train=False,
                   method=model.get_forecast)

    def loss_fn(params):
        total, metrics = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            cond, target, jnp.int32(2), 2, 10.0, 45.0, 1e-3, 45.0, False,
            True, method=model.compute_losses, mutable=["batch_stats"])[0]
        return total, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        v["params"])
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))


def test_mixed_integrator_runs_f32():
    cfg = _cfg("mixed")
    model = build_separable_network(cfg)
    cond = jnp.zeros((4, 2, 64, 64, 1), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), cond, 2, train=False,
                   method=model.get_forecast)
    # drive the integrator directly: with the mixed policy its output on an
    # f32 code must stay f32 (bf16 policy would downcast)
    t0 = jnp.ones((4, cfg.code_size_t), jnp.float32)
    out, _ = model.apply({"params": v["params"]}, t0,
                         method=lambda m, t: m.t_resnet(t))
    assert out.dtype == jnp.float32
