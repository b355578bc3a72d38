"""End-to-end objective parity: with transplanted weights, identical data
and the same supervision time, all four loss terms must match the reference
implementation's values (``var_sep/train.py:38-149``)."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference not mounted")

torch = pytest.importorskip("torch")

NT_COND, NT_PRED = 3, 4
CODE = 8


def _ref():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.datasets = types.SimpleNamespace(MNIST=None)
        sys.modules["torchvision"] = tv
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import var_sep.networks.mlp_encdec as rmlp
    import var_sep.networks.model as rmodel
    import var_sep.networks.resnet as rres
    import var_sep.train as rtrain

    return rmlp, rres, rmodel, rtrain


def _dense_to_torch(lin, params):
    lin.weight.data = torch.tensor(np.asarray(params["kernel"], np.float32)).T.contiguous()
    lin.bias.data = torch.tensor(np.asarray(params["bias"], np.float32))


def _build_pair():
    from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
    from spatiotemporal_variable_separation_tpu.models.factory import (
        build_separable_network,
    )

    rmlp, rres, rmodel, rtrain = _ref()
    cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                           code_size_s=CODE, code_size_t=CODE,
                           enc_hidden_size=16, dec_hidden_size=16,
                           res_hidden_size=16, n_blocks=2, enc_n_layers=3,
                           dec_n_layers=3, nt_cond=NT_COND, nt_pred=NT_PRED,
                           offset=NT_COND, precision="f32")
    model = build_separable_network(cfg)
    cond = jnp.asarray(np.random.default_rng(0).random(
        (2, NT_COND, 16, 16, 1)), jnp.float32)
    # frame shape is dataset-determined (64x64); rebuild for 16x16 frames
    from spatiotemporal_variable_separation_tpu.models.integrator import MLPResnet
    from spatiotemporal_variable_separation_tpu.models.mlp_encdec import (
        MLPDecoder,
        MLPEncoder,
    )
    from spatiotemporal_variable_separation_tpu.models.separable import (
        SeparableNetwork,
    )

    model = SeparableNetwork(
        Es=MLPEncoder(nh=CODE, hidden_size=16, nlayers=3, name="Es"),
        Et=MLPEncoder(nh=CODE, hidden_size=16, nlayers=3, name="Et"),
        # small integrator gain: keeps a 95-step rollout numerically bounded
        # so float-noise divergence stays testable (gain 1.41 rollouts grow
        # to ~1e34 by step 95 with both implementations tracking each other
        # to ~1% relative).
        t_resnet=MLPResnet(n_blocks=2, hidden_size=16, init_gain=0.1,
                           name="t_resnet"),
        decoder=MLPDecoder(output_shape=(16, 16, 1), hidden_size=16, nlayers=3,
                           last_activation="sigmoid", mixing="mul",
                           name="decoder"),
        nt_cond=NT_COND, skipco=False)
    v = model.init(jax.random.PRNGKey(7), cond, 2, train=False)
    p = v["params"]

    in_size = NT_COND * 16 * 16
    ref_es = rmlp.MLPEncoder(in_size, 16, CODE, 3)
    ref_et = rmlp.MLPEncoder(in_size, 16, CODE, 3)
    ref_dec = rmlp.MLPDecoder(CODE, 16, [1, 16, 16], 3, "sigmoid", "mul")
    ref_res = rres.MLPResnet(CODE, 2, 16)
    for il in range(3):
        _dense_to_torch(ref_es.mlp.module[il][-1], p["Es"]["mlp"][f"block_{il}"]["linear"])
        _dense_to_torch(ref_et.mlp.module[il][-1], p["Et"]["mlp"][f"block_{il}"]["linear"])
        _dense_to_torch(ref_dec.mlp.module[il][-1], p["decoder"]["mlp"][f"block_{il}"]["linear"])
    for i in range(2):
        for il in range(3):
            _dense_to_torch(ref_res.blocks[i].mlp.module[il][-1],
                            p["t_resnet"][f"block_{i}"][f"block_{il}"]["linear"])
    ref_net = rmodel.SeparableNetwork(ref_es, ref_et, ref_res, ref_dec,
                                      NT_COND, False)
    return model, v, ref_net, rtrain


def test_four_term_objective_golden():
    model, v, ref_net, rtrain = _build_pair()
    rng = np.random.default_rng(1)
    cond = rng.random((2, NT_COND, 16, 16, 1)).astype(np.float32)
    target = rng.random((2, NT_PRED, 16, 16, 1)).astype(np.float32)
    # C=1: (B,T,H,W,1) and torch (B,T,1,H,W) flatten identically.
    t_cond = torch.tensor(cond.transpose(0, 1, 4, 2, 3))
    t_target = torch.tensor(target.transpose(0, 1, 4, 2, 3))

    offset = NT_COND
    # reference draws t_random from global numpy RNG (train.py:72-76).
    np.random.seed(123)
    with torch.no_grad():
        ref_ae, s_new, s_old = rtrain.ae_loss(t_cond, t_target, ref_net,
                                              NT_COND, offset, False)
        ref_sinv = rtrain.zero_order_loss(s_old, s_new, False)
        full = torch.cat([t_cond, t_target], dim=1)
        forecasts, t_codes, _, _ = ref_net.get_forecast(
            t_cond, NT_PRED + offset, init_s_code=s_old)
        ref_fc = torch.nn.functional.mse_loss(forecasts, full)
        ref_treg = 0.5 * torch.sum(t_codes[:, 0].pow(2), dim=1).mean()
    np.random.seed(123)
    t_random = np.random.randint(NT_COND, NT_COND + NT_PRED + 1)

    (_, metrics) = model.apply(
        v, jnp.asarray(cond), jnp.asarray(target), jnp.int32(t_random),
        offset, 1.0, 1.0, 1.0, 1.0, False, False,
        method=model.compute_losses)

    assert float(metrics["ae"]) == pytest.approx(float(ref_ae), abs=2e-6)
    assert float(metrics["s_inv"]) == pytest.approx(float(ref_sinv), abs=2e-6)
    assert float(metrics["forecast"]) == pytest.approx(float(ref_fc), abs=2e-6)
    assert float(metrics["t_reg"]) == pytest.approx(float(ref_treg), abs=2e-6)


def test_forecast_rollout_golden():
    """95-step rollout parity with transplanted weights."""
    model, v, ref_net, _ = _build_pair()
    rng = np.random.default_rng(2)
    cond = rng.random((2, NT_COND, 16, 16, 1)).astype(np.float32)
    t_cond = torch.tensor(cond.transpose(0, 1, 4, 2, 3))
    with torch.no_grad():
        ref_fc, ref_codes, _, _ = ref_net.get_forecast(t_cond, 95)
    ours_fc, ours_codes, _, _ = model.apply(v, jnp.asarray(cond), 95,
                                            train=False,
                                            method=model.get_forecast)
    np.testing.assert_allclose(np.asarray(ours_codes), ref_codes.numpy(),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(ours_fc).transpose(0, 1, 4, 2, 3),
                               ref_fc.numpy(), atol=5e-5)


def test_total_loss_gradient_golden():
    """Gradients of the weighted 4-term objective must match the reference's
    autograd through the identical computation (``train.py:113-149``) —
    value parity alone would miss a stop-gradient / detached-tensor bug that
    changes training dynamics (e.g. the s_inv term silently not training
    the encoder)."""
    model, v, ref_net, rtrain = _build_pair()
    rng = np.random.default_rng(5)
    cond = rng.random((2, NT_COND, 16, 16, 1)).astype(np.float32)
    target = rng.random((2, NT_PRED, 16, 16, 1)).astype(np.float32)
    t_cond = torch.tensor(cond.transpose(0, 1, 4, 2, 3))
    t_target = torch.tensor(target.transpose(0, 1, 4, 2, 3))
    offset = NT_COND
    lamb_ae, lamb_s, lamb_t, lamb_pred = 10.0, 45.0, 1e-3, 45.0

    np.random.seed(321)
    ref_ae, s_new, s_old = rtrain.ae_loss(t_cond, t_target, ref_net,
                                          NT_COND, offset, False)
    ref_sinv = rtrain.zero_order_loss(s_old, s_new, False)
    full = torch.cat([t_cond, t_target], dim=1)
    forecasts, t_codes, _, _ = ref_net.get_forecast(
        t_cond, NT_PRED + offset, init_s_code=s_old)
    ref_fc = torch.nn.functional.mse_loss(forecasts, full)
    ref_treg = 0.5 * torch.sum(t_codes[:, 0].pow(2), dim=1).mean()
    total = (lamb_ae * ref_ae + lamb_s * ref_sinv + lamb_pred * ref_fc
             + lamb_t * ref_treg)
    total.backward()

    np.random.seed(321)
    t_random = np.random.randint(NT_COND, NT_COND + NT_PRED + 1)

    def loss_fn(params):
        total, _ = model.apply(
            {"params": params}, jnp.asarray(cond), jnp.asarray(target),
            jnp.int32(t_random), offset, lamb_ae, lamb_s, lamb_t, lamb_pred,
            False, False, method=model.compute_losses)
        return total

    grads = jax.grad(loss_fn)(v["params"])

    pairs = [
        (ref_net.Es.mlp.module[0][-1].weight.grad,
         grads["Es"]["mlp"]["block_0"]["linear"]["kernel"], True),
        (ref_net.Es.mlp.module[2][-1].bias.grad,
         grads["Es"]["mlp"]["block_2"]["linear"]["bias"], False),
        (ref_net.Et.mlp.module[0][-1].weight.grad,
         grads["Et"]["mlp"]["block_0"]["linear"]["kernel"], True),
        (ref_net.decoder.mlp.module[0][-1].weight.grad,
         grads["decoder"]["mlp"]["block_0"]["linear"]["kernel"], True),
        (ref_net.t_resnet.blocks[0].mlp.module[0][-1].weight.grad,
         grads["t_resnet"]["block_0"]["block_0"]["linear"]["kernel"], True),
    ]
    for t_grad, j_grad, transpose in pairs:
        ref_g = t_grad.detach().numpy()
        ours = np.asarray(j_grad, np.float32)
        if transpose:
            ours = ours.T
        np.testing.assert_allclose(ours, ref_g, rtol=2e-4, atol=1e-6)
