"""--no_s ablation: constant S, mul mixing, zero T regularization
(reference main.py:119-127, train.py:99-101)."""

import numpy as np

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.models.factory import build_separable_network
from spatiotemporal_variable_separation_tpu.train.state import create_train_state
from spatiotemporal_variable_separation_tpu.train.step import make_optimizer, make_train_step


def test_no_s_training_step():
    cfg = ExperimentConfig(data="wave", architecture="mlp", no_s=True,
                           code_size_t=16, enc_hidden_size=16,
                           dec_hidden_size=16, res_hidden_size=16, n_blocks=1,
                           nt_cond=3, nt_pred=2, offset=3, precision="f32",
                           batch_size=4).validate()
    assert cfg.code_size_s == 16 and cfg.mixing == "mul"
    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, 10)
    state = create_train_state(model, cfg, tx)
    step = make_train_step(model, cfg, tx)
    rng = np.random.default_rng(0)
    seq = rng.random((4, 5, 64, 64, 1)).astype(np.float32)
    state, metrics = step(state, jnp.asarray(seq[:, :3]), jnp.asarray(seq[:, 3:]))
    assert np.isfinite(float(metrics["loss"]))
    # S invariance is exactly zero for a constant S
    assert float(metrics["s_inv"]) == 0.0


def test_no_s_forecast_s_is_ones():
    cfg = ExperimentConfig(data="wave", architecture="mlp", no_s=True,
                           code_size_t=8, res_hidden_size=8, nt_cond=2,
                           nt_pred=2, offset=2, precision="f32").validate()
    model = build_separable_network(cfg)
    cond = jnp.ones((2, 2, 64, 64, 1))
    v = model.init(jax.random.PRNGKey(0), cond, 2, train=False)
    _, _, s, _ = model.apply(v, cond, 3, train=False, method=model.get_forecast)
    np.testing.assert_allclose(np.asarray(s), 1.0)
