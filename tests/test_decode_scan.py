"""The scanned stepwise decode (models/separable.py ``_decode_all``) must be
equivalent to the sequential per-step decoder loop it replaced: identical
frames AND an identical BatchNorm batch-stats update stream (reference
per-step decode semantics, ``var_sep/networks/model.py:78-83``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.models.factory import (
    build_separable_network,
)


def _cfg(**kw):
    base = dict(data="mnist", architecture="dcgan", code_size_s=12,
                code_size_t=8, enc_hidden_size=8, dec_hidden_size=8,
                res_hidden_size=16, n_blocks=1, nt_cond=2, nt_pred=3,
                offset=2, batch_size=4, precision="f32",
                decode_mode="stepwise")
    base.update(kw)
    return ExperimentConfig(**base).validate()


@pytest.mark.parametrize("skipco", [False, True])
def test_scanned_stepwise_matches_sequential_loop(skipco):
    cfg = _cfg(skipco=skipco)
    model = build_separable_network(cfg)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.random((4, cfg.nt_cond, 64, 64, 1), np.float32))
    variables = model.init(jax.random.PRNGKey(0), cond, 2, train=False)

    # real-shaped S (and skips) from the encoder, frozen stats
    s_full = model.apply(variables, cond, train=False, method=model.encode_s)
    s_code, skips = s_full if skipco else (s_full, None)
    n = 5
    t_codes = jnp.asarray(
        rng.standard_normal((n, 4, cfg.code_size_t)), jnp.float32)

    # scanned path (train=True: the stepwise branch)
    frames_scan, mut = model.apply(
        variables, s_code, skips, t_codes, True,
        method=model._decode_all, mutable=["batch_stats"])

    # manual sequential loop over the bare decoder submodule, threading
    # batch_stats exactly as the pre-scan Python loop did
    dec_stats = variables["batch_stats"]["decoder"]
    frames_loop = []
    for i in range(n):
        frame, m = model.decoder.apply(
            {"params": variables["params"]["decoder"],
             "batch_stats": dec_stats},
            s_code, t_codes[i], skip=skips, train=True,
            mutable=["batch_stats"])
        dec_stats = m["batch_stats"]
        frames_loop.append(frame)
    frames_loop = jnp.stack(frames_loop, axis=1)

    # f32 fusion-order noise only (scan body vs standalone apply compile to
    # slightly different fusions): last-ulp differences, nothing structural.
    np.testing.assert_allclose(np.asarray(frames_scan),
                               np.asarray(frames_loop), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(mut["batch_stats"]["decoder"]),
                    jax.tree_util.tree_leaves(dec_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-8)


def test_scanned_decode_gradients_flow():
    cfg = _cfg()
    model = build_separable_network(cfg)
    rng = np.random.default_rng(1)
    cond = jnp.asarray(rng.random((4, cfg.nt_cond, 64, 64, 1), np.float32))
    target = jnp.asarray(rng.random((4, cfg.nt_pred, 64, 64, 1), np.float32))
    variables = model.init(jax.random.PRNGKey(0), cond, 2, train=False)

    def loss_fn(params):
        (loss, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            cond, target, jnp.int32(cfg.nt_cond), cfg.offset,
            1.0, 1.0, 1e-3, 1.0, False, True,
            method=model.compute_losses, mutable=["batch_stats"])
        return loss

    grads = jax.grad(loss_fn)(variables["params"])
    total = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert np.isfinite(total) and total > 0.0
