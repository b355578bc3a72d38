"""SeparableNetwork rollout, content-swap, and loss-semantics tests
(reference model.py:52-89 and train.py:38-149)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.models.factory import build_separable_network

def _rand(shape, seed=0):
    return np.random.default_rng(seed).random(shape)


def mlp_cfg(**kw):
    base = dict(data="wave", architecture="mlp", mixing="mul", code_size_s=16,
                code_size_t=16, enc_hidden_size=32, dec_hidden_size=32,
                res_hidden_size=32, n_blocks=2, nt_cond=4, nt_pred=3, offset=4,
                precision="f32")
    base.update(kw)
    return ExperimentConfig(**base)


def _setup(cfg):
    model = build_separable_network(cfg)
    cond = jnp.asarray(_rand((2, cfg.nt_cond) + cfg.frame_shape), jnp.float32)
    variables = model.init(jax.random.key(0), cond, 2, train=False)
    return model, variables, cond


def test_rollout_shapes():
    cfg = mlp_cfg()
    model, variables, cond = _setup(cfg)
    fc, t_codes, s, res = model.apply(variables, cond, 9, train=False,
                                      method=model.get_forecast)
    assert fc.shape == (2, 9, 64, 64, 1)
    assert t_codes.shape == (2, 9, 16)
    assert s.shape == (2, 16)
    assert res.shape == (8, 2, 2, 16)  # (n-1, n_blocks, B, code)


def test_rollout_single_step():
    cfg = mlp_cfg()
    model, variables, cond = _setup(cfg)
    fc, t_codes, _, res = model.apply(variables, cond, 1, train=False,
                                      method=model.get_forecast)
    assert fc.shape[1] == 1 and t_codes.shape[1] == 1 and res is None


def test_euler_chain_in_rollout():
    """t_{k+1} - t_k equals the sum of block residuals at step k."""
    cfg = mlp_cfg()
    model, variables, cond = _setup(cfg)
    _, t_codes, _, res = model.apply(variables, cond, 5, train=False,
                                     method=model.get_forecast)
    diffs = np.asarray(t_codes[:, 1:] - t_codes[:, :-1])  # (B, n-1, code)
    res_sum = np.asarray(res.sum(axis=1)).transpose(1, 0, 2)  # (B, n-1, code)
    np.testing.assert_allclose(diffs, res_sum, atol=1e-5)


def test_content_swap_injection():
    # higher-gain init: with the default tiny normal init a fresh sigmoid
    # decoder outputs ~0.5 regardless of its inputs.
    cfg = mlp_cfg(init_encoder="orthogonal", gain_encoder=1.0)
    model, variables, cond = _setup(cfg)
    _, _, s_code, _ = model.apply(variables, cond, 3, train=False,
                                  method=model.get_forecast)
    other = jnp.asarray(_rand(cond.shape, seed=1), jnp.float32)
    fc_a = model.apply(variables, other, 3, None, s_code, False,
                       method=model.get_forecast)[0]
    fc_b = model.apply(variables, other, 3, train=False,
                       method=model.get_forecast)[0]
    # injecting a different S must change the output
    assert float(jnp.abs(fc_a - fc_b).max()) > 1e-6


def test_init_t_code_injection():
    cfg = mlp_cfg()
    model, variables, cond = _setup(cfg)
    t0 = jnp.zeros((2, 16))
    _, t_codes, _, _ = model.apply(variables, cond, 3, t0, None, False,
                                   method=model.get_forecast)
    np.testing.assert_allclose(np.asarray(t_codes[:, 0]), 0.0)


def test_s_constant_across_rollout_frames():
    """S is encoded once; decoding the same T twice gives identical frames."""
    cfg = mlp_cfg()
    model, variables, cond = _setup(cfg)
    fc1, _, s, _ = model.apply(variables, cond, 4, train=False,
                               method=model.get_forecast)
    fc2 = model.apply(variables, cond, 4, None, s, False,
                      method=model.get_forecast)[0]
    np.testing.assert_allclose(np.asarray(fc1), np.asarray(fc2), atol=1e-6)


def dcgan_cfg(**kw):
    base = dict(data="mnist", architecture="dcgan", code_size_s=16, code_size_t=8,
                enc_hidden_size=8, dec_hidden_size=8, res_hidden_size=16,
                n_blocks=1, nt_cond=3, nt_pred=2, offset=3, precision="f32")
    base.update(kw)
    return ExperimentConfig(**base)


def test_decode_modes_identical_at_eval():
    cfg = dcgan_cfg(decode_mode="stepwise")
    model, variables, cond = _setup(cfg)
    fa = model.apply(variables, cond, 5, train=False, method=model.get_forecast)[0]
    model_b = dataclasses.replace(model, decode_mode="batched")
    fb = model_b.apply(variables, cond, 5, train=False, method=model_b.get_forecast)[0]
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=0)


def test_skipco_full_s_roundtrip():
    cfg = dcgan_cfg(skipco=True)
    model, variables, cond = _setup(cfg)
    fc, _, s_full, _ = model.apply(variables, cond, 4, train=False,
                                   method=model.get_forecast)
    code, skips = s_full
    assert code.shape == (2, 16) and len(skips) == 4
    fc2 = model.apply(variables, cond, 4, None, s_full, False,
                      method=model.get_forecast)[0]
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fc2), atol=1e-6)


def _losses(model, variables, cond, target, t_random, offset, **kw):
    args = dict(lamb_ae=1.0, lamb_s=1.0, lamb_t=1.0, lamb_pred=1.0,
                average_tloss=False, train=False)
    args.update(kw)
    (total, metrics) = model.apply(
        variables, cond, target, jnp.int32(t_random), offset,
        args["lamb_ae"], args["lamb_s"], args["lamb_t"], args["lamb_pred"],
        args["average_tloss"], args["train"],
        method=model.compute_losses)
    return total, metrics


def test_s_invariance_loss_zero_for_static_sequence():
    cfg = mlp_cfg()
    model, variables, _ = _setup(cfg)
    frame = jnp.asarray(_rand((2, 1) + cfg.frame_shape, seed=2), jnp.float32)
    cond = jnp.repeat(frame, cfg.nt_cond, axis=1)
    target = jnp.repeat(frame, cfg.nt_pred, axis=1)
    _, metrics = _losses(model, variables, cond, target, t_random=5, offset=4)
    assert float(metrics["s_inv"]) == pytest.approx(0.0, abs=1e-10)


def test_t_reg_formulas():
    cfg = mlp_cfg()
    model, variables, cond = _setup(cfg)
    target = jnp.asarray(_rand((2, cfg.nt_pred) + cfg.frame_shape, seed=3), jnp.float32)
    _, m_sum = _losses(model, variables, cond, target, 5, 4, average_tloss=False)
    _, m_avg = _losses(model, variables, cond, target, 5, 4, average_tloss=True)
    # sum-over-code vs mean-over-code differ by exactly code_size (train.py:145-149)
    assert float(m_sum["t_reg"]) == pytest.approx(float(m_avg["t_reg"]) * 16, rel=1e-5)


def test_ae_supervision_frame_offset_semantics():
    """offset=nt_cond supervises frame t_random - nt_cond; offset=0 supervises
    t_random itself (train.py:45-88).  Check via a hand-built model where the
    decoder output is directly comparable."""
    cfg = mlp_cfg(offset=0, nt_pred=3)
    model, variables, cond = _setup(cfg)
    target = jnp.asarray(_rand((2, 3) + cfg.frame_shape, seed=4), jnp.float32)
    # t_random ranges differ: offset=0 -> [nt_cond, T); offset=nt -> [nt, T].
    total0, _ = _losses(model, variables, cond, target, t_random=6, offset=0)
    total1, _ = _losses(model, variables, cond, target, t_random=6, offset=4)
    # different supervision frames -> different ae values (generically)
    assert float(total0) != pytest.approx(float(total1))


def test_forecast_horizon_with_offset():
    """offset=nt_cond reconstructs cond frames too: n = nt_pred + offset and
    the target is the full sequence (train.py:132-140)."""
    cfg = mlp_cfg()
    model, variables, cond = _setup(cfg)
    target = jnp.asarray(_rand((2, cfg.nt_pred) + cfg.frame_shape, seed=3), jnp.float32)
    fc, _, _, _ = model.apply(variables, cond, cfg.nt_pred + cfg.offset,
                              train=False, method=model.get_forecast)
    assert fc.shape[1] == cfg.nt_cond + cfg.nt_pred


def test_s_norm_regularizer_opt_in():
    # lamb_s_norm=0 (default): exact 4-term objective, no s_norm metric.
    # lamb_s_norm=w: total grows by exactly w * mean(S^2) and the metric
    # appears; gradients flow into Es through the new term.
    cfg = mlp_cfg()
    model, variables, cond = _setup(cfg)
    target = jnp.asarray(_rand((2, cfg.nt_pred) + cfg.frame_shape, seed=7),
                         jnp.float32)
    base_total, base_metrics = _losses(model, variables, cond, target,
                                       t_random=5, offset=4)
    assert "s_norm" not in base_metrics
    w = 0.37
    total, metrics = model.apply(
        variables, cond, target, jnp.int32(5), 4,
        1.0, 1.0, 1.0, 1.0, False, False, lamb_s_norm=w,
        method=model.compute_losses)
    assert "s_norm" in metrics
    s_code = model.apply(variables, cond, train=False, method=model.encode_s)
    expected = float(np.mean(np.asarray(s_code, np.float32) ** 2))
    assert float(metrics["s_norm"]) == pytest.approx(expected, rel=1e-5)
    assert float(total) == pytest.approx(float(base_total) + w * expected,
                                         rel=1e-5)

    def loss_of_params(params):
        t, _ = model.apply(
            {**variables, "params": params}, cond, target, jnp.int32(5), 4,
            0.0, 0.0, 0.0, 0.0, False, False, lamb_s_norm=1.0,
            method=model.compute_losses)
        return t

    grads = jax.grad(loss_of_params)(variables["params"])
    es_grad = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads["Es"], 0.0)
    assert es_grad > 0.0
