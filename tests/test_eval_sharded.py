"""Sharded evaluation: data-parallel Evaluator rollouts over the 8-CPU mesh
must match the single-device path bitwise (pure forward, no cross-batch
ops), and the full wave protocol must produce identical metrics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.eval.common import Evaluator
from spatiotemporal_variable_separation_tpu.models.factory import build_separable_network
from spatiotemporal_variable_separation_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def tiny_bundle():
    cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                           code_size_s=8, code_size_t=8, enc_hidden_size=16,
                           dec_hidden_size=16, res_hidden_size=16, n_blocks=1,
                           nt_cond=3, nt_pred=3, offset=3, precision="f32")
    model = build_separable_network(cfg)
    cond = jnp.asarray(np.random.default_rng(0).random((8, 3, 64, 64, 1)),
                       jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), cond, 2, train=False))
    return cfg, model, variables, np.asarray(cond)


def test_sharded_forecast_matches_single_device(tiny_bundle):
    _, model, variables, cond = tiny_bundle
    mesh = make_mesh(8)
    ev1 = Evaluator(model, variables)
    ev8 = Evaluator(model, variables, mesh=mesh)

    fc1, s1 = ev1.forecast(cond, 6)
    fc8, s8 = ev8.forecast(cond, 6)
    np.testing.assert_array_equal(np.asarray(fc1), np.asarray(fc8))

    # the sharded output really is distributed over the mesh
    assert len(fc8.sharding.device_set) == 8

    # content-swap path (init_s_code sharded on the batch axis)
    fc1s, _ = ev1.forecast(cond, 6, init_s_code=s1)
    fc8s, _ = ev8.forecast(cond, 6, init_s_code=s8)
    np.testing.assert_array_equal(np.asarray(fc1s), np.asarray(fc8s))


def test_sharded_forecast_pads_indivisible_batch(tiny_bundle):
    _, model, variables, cond = tiny_bundle
    ev1 = Evaluator(model, variables)
    ev8 = Evaluator(model, variables, mesh=make_mesh(8))
    fc1, s1 = ev1.forecast(cond[:6], 6)
    fc8, s8 = ev8.forecast(cond[:6], 6)
    assert fc8.shape[0] == 6 and s8.shape[0] == 6
    np.testing.assert_array_equal(np.asarray(fc1), np.asarray(fc8))
    fc1s, _ = ev1.forecast(cond[:6], 6, init_s_code=s1)
    fc8s, _ = ev8.forecast(cond[:6], 6, init_s_code=s8)
    np.testing.assert_array_equal(np.asarray(fc1s), np.asarray(fc8s))


def test_sst_protocol_sharded_equals_single(tmp_path):
    """Spatial-code family (encoderSST skips + ConvResnet) over the mesh:
    the full SST eval protocol — device-side factored-denorm MSE and
    renorm SSIM — must match the single-device run, including the batch
    padding path (the eval-zone count is not a mesh multiple)."""
    from spatiotemporal_variable_separation_tpu.core.config import (
        ExperimentConfig as EC,
    )
    from spatiotemporal_variable_separation_tpu.data import synthetic_corpora as sc
    from spatiotemporal_variable_separation_tpu.data.sst import SST
    from spatiotemporal_variable_separation_tpu.eval.sst import evaluate
    from spatiotemporal_variable_separation_tpu.models.factory import (
        build_separable_network,
    )

    size = 16
    sc.make_sst(str(tmp_path), zones=(17, 18), n_days=120, seed=5, size=size)
    cfg = EC(data="sst", architecture="encoderSST",
             decoder_architecture="decoderSST", mixing="concat", skipco=True,
             code_size_s=8, code_size_t=8, res_hidden_size=8, n_blocks=1,
             nt_cond=4, nt_pred=10, offset=0, zone_size=size,
             precision="f32", batch_size=4)
    model = build_separable_network(cfg)
    cond = jnp.ones((1, 4, size, size, 1), jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), cond, 2, train=False))
    bundle = (model, variables, cfg)
    zones = [17, 18]
    test_set = SST(str(tmp_path), 4, 10, train=False, zones=zones, eval=True)
    out = tmp_path / "xp"
    out.mkdir()
    m1 = evaluate(str(out), str(tmp_path), batch_size=6, model_bundle=bundle,
                  zones=zones, test_set=test_set)
    m8 = evaluate(str(out), str(tmp_path), batch_size=6, model_bundle=bundle,
                  zones=zones, test_set=test_set, mesh=make_mesh(8))
    assert m1.keys() == m8.keys()
    for k in m1:
        np.testing.assert_allclose(m1[k], m8[k], rtol=1e-5, err_msg=k)


def test_wave_protocol_sharded_equals_single(tmp_path, tiny_bundle):
    from spatiotemporal_variable_separation_tpu.data.wave_eq import generate_dataset
    from spatiotemporal_variable_separation_tpu.eval.wave import evaluate

    cfg, model, variables, _ = tiny_bundle
    # eval hardcodes nt_pred=40 (test/wave/test.py:74-75): needs
    # (3 + 40) * downsample = 86 frames.
    generate_dataset(str(tmp_path), size=5, seq_len=90, batch=5)
    bundle = (model, variables, cfg)
    m1 = evaluate(str(tmp_path), str(tmp_path), batch_size=8,
                  model_bundle=bundle)
    m8 = evaluate(str(tmp_path), str(tmp_path), batch_size=8,
                  model_bundle=bundle, mesh=make_mesh(8))
    assert m1.keys() == m8.keys()
    for k in m1:
        np.testing.assert_allclose(m1[k], m8[k], rtol=1e-6)
