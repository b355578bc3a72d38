"""--fused_loss: per-step decode+MSE accumulation must be objective- and
gradient-equivalent to the stacked forecast loss (same 4-term objective,
reference ``var_sep/train.py:38-149``; only the reduction order differs)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.models.factory import (
    build_separable_network,
)


def _cfg(**kw):
    base = dict(data="mnist", architecture="dcgan", mixing="mul",
                code_size_s=12, code_size_t=12, enc_hidden_size=8,
                dec_hidden_size=8, res_hidden_size=16, n_blocks=1,
                nt_cond=2, nt_pred=3, offset=2, batch_size=4,
                precision="f32", decode_mode="stepwise")
    base.update(kw)
    return ExperimentConfig(**base).validate()


def _losses_and_grads(cfg, seed=0):
    model = build_separable_network(cfg)
    rng = np.random.default_rng(seed)
    cond = jnp.asarray(rng.random((4, cfg.nt_cond, 64, 64, 1), np.float32))
    target = jnp.asarray(rng.random((4, cfg.nt_pred, 64, 64, 1), np.float32))
    variables = model.init(jax.random.PRNGKey(0), cond, 2, train=False)

    def loss_fn(params):
        (loss, metrics), mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            cond, target, jnp.int32(cfg.nt_cond), cfg.offset,
            1.0, 1.0, 1e-3, 1.0, False, True,
            method=model.compute_losses, mutable=["batch_stats"])
        return loss, (metrics, mut["batch_stats"])

    (loss, (metrics, stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])
    return loss, metrics, stats, grads, variables["params"]


@pytest.mark.parametrize("skipco", [False, True])
def test_fused_matches_stacked(skipco):
    cfg = _cfg(skipco=skipco)
    l0, m0, st0, g0, p0 = _losses_and_grads(cfg)
    lf, mf, stf, gf, pf = _losses_and_grads(
        dataclasses.replace(cfg, fused_loss=True))
    # identical init (same seed/config) — the comparison is meaningful
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(pf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(float(lf), float(l0), rtol=1e-5)
    for k in ("ae", "s_inv", "forecast", "t_reg"):
        np.testing.assert_allclose(float(mf[k]), float(m0[k]), rtol=1e-5,
                                   err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6)
    # BatchNorm batch-stats stream identical (same per-step decoder calls)
    for a, b in zip(jax.tree_util.tree_leaves(st0),
                    jax.tree_util.tree_leaves(stf)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5)


def test_fused_requires_stepwise():
    with pytest.raises(ValueError, match="fused_loss"):
        _cfg(fused_loss=True, decode_mode="batched")


def test_fused_loss_trains():
    # one optimizer step end to end through the jitted train step
    from spatiotemporal_variable_separation_tpu.train.state import (
        create_train_state,
    )
    from spatiotemporal_variable_separation_tpu.train.step import (
        make_optimizer,
        make_train_step,
    )

    cfg = _cfg(fused_loss=True)
    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, cfg, tx)
    step = make_train_step(model, cfg, tx)
    rng = np.random.default_rng(1)
    cond = jnp.asarray(rng.random((4, cfg.nt_cond, 64, 64, 1), np.float32))
    target = jnp.asarray(rng.random((4, cfg.nt_pred, 64, 64, 1), np.float32))
    state, metrics = step(state, cond, target)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
