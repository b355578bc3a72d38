"""Serving surface: AOT-compiled Forecaster — checkpoint round-trip,
padding semantics, mesh sharding, and agreement with the Evaluator path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.eval.common import Evaluator
from spatiotemporal_variable_separation_tpu.models.factory import build_separable_network
from spatiotemporal_variable_separation_tpu.parallel.mesh import make_mesh
from spatiotemporal_variable_separation_tpu.serve import Forecaster


@pytest.fixture(scope="module")
def bundle():
    cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                           code_size_s=8, code_size_t=8, enc_hidden_size=16,
                           dec_hidden_size=16, res_hidden_size=16, n_blocks=1,
                           nt_cond=3, nt_pred=3, offset=3, precision="f32")
    model = build_separable_network(cfg)
    cond = jnp.zeros((4, 3, 64, 64, 1), jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), cond, 2, train=False))
    return cfg, model, variables


def test_forecaster_matches_evaluator(bundle):
    cfg, model, variables = bundle
    fc = Forecaster(model, variables, cfg, batch_size=8, n_forecast=6)
    ev = Evaluator(model, variables)
    cond = np.random.default_rng(0).random((8, 3, 64, 64, 1)).astype(np.float32)
    np.testing.assert_allclose(fc.predict(cond),
                               np.asarray(ev.forecast(cond, 6)[0]),
                               rtol=0, atol=1e-6)


def test_forecaster_pads_small_requests(bundle):
    cfg, model, variables = bundle
    fc = Forecaster(model, variables, cfg, batch_size=8, n_forecast=6)
    cond = np.random.default_rng(1).random((3, 3, 64, 64, 1)).astype(np.float32)
    out = fc.predict(cond)
    assert out.shape == (3, 6, 64, 64, 1)
    np.testing.assert_array_equal(out, fc.predict(np.concatenate(
        [cond, np.repeat(cond[-1:], 5, axis=0)]))[:3])
    with pytest.raises(ValueError, match="exceeds compiled"):
        fc.predict(np.zeros((9, 3, 64, 64, 1), np.float32))


def test_forecaster_sharded_over_mesh(bundle):
    cfg, model, variables = bundle
    mesh = make_mesh(8)
    fc1 = Forecaster(model, variables, cfg, batch_size=8, n_forecast=6)
    fc8 = Forecaster(model, variables, cfg, batch_size=8, n_forecast=6,
                     mesh=mesh)
    cond = np.random.default_rng(2).random((8, 3, 64, 64, 1)).astype(np.float32)
    np.testing.assert_array_equal(fc1.predict(cond), fc8.predict(cond))


def test_forecaster_from_xp_dir_roundtrip(tmp_path, bundle):
    cfg, model, variables = bundle
    import dataclasses

    from spatiotemporal_variable_separation_tpu.checkpoint import save_checkpoint
    from spatiotemporal_variable_separation_tpu.train.state import create_train_state
    from spatiotemporal_variable_separation_tpu.train.step import make_optimizer

    cfg2 = dataclasses.replace(cfg, xp_dir=str(tmp_path))
    cfg2.save(str(tmp_path / "params.json"))
    tx = make_optimizer(cfg2, steps_per_epoch=1)
    state = create_train_state(model, cfg2, tx)
    state = state.replace(params=variables["params"])
    save_checkpoint(str(tmp_path), state, name="final")

    fc = Forecaster.from_xp_dir(str(tmp_path), batch_size=4, n_forecast=5)
    cond = np.random.default_rng(3).random((4, 3, 64, 64, 1)).astype(np.float32)
    ev = Evaluator(model, variables)
    np.testing.assert_allclose(fc.predict(cond),
                               np.asarray(ev.forecast(cond, 5)[0]),
                               rtol=0, atol=1e-6)
    stats = fc.benchmark(n_iters=3, warmup=1)
    assert stats["p50_ms"] > 0 and stats["frames_per_sec"] > 0

    # inference-only precision override: bf16 compute over the f32
    # checkpoint must build, run, and track the f32 forecast closely
    # (params stay f32; only activations are cast).
    fc16 = Forecaster.from_xp_dir(str(tmp_path), batch_size=4, n_forecast=5,
                                  precision="bf16")
    out32 = fc.predict(cond)
    out16 = fc16.predict(cond)
    assert out16.shape == out32.shape
    assert np.max(np.abs(out16 - out32)) < 0.05  # bf16 has ~3 decimal digits
