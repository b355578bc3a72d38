"""remat'd integrator scan must be numerically identical (it only changes
what is recomputed in backward, not the math)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.models.factory import build_separable_network


def test_remat_identical_forward_and_grads():
    cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                           code_size_s=8, code_size_t=8, res_hidden_size=16,
                           n_blocks=1, nt_cond=3, nt_pred=4, offset=3,
                           precision="f32")
    model = build_separable_network(cfg)
    model_r = dataclasses.replace(model, remat=True)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.random((2, 3, 64, 64, 1)), jnp.float32)
    target = jnp.asarray(rng.random((2, 4, 64, 64, 1)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), cond, 2, train=False)

    fc = model.apply(v, cond, 6, train=False, method=model.get_forecast)[0]
    fc_r = model_r.apply(v, cond, 6, train=False, method=model_r.get_forecast)[0]
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fc_r), atol=1e-6)

    def loss(m, params):
        total, _ = m.apply({"params": params}, cond, target, jnp.int32(4), 3,
                           1.0, 1.0, 1.0, 1.0, False, False,
                           method=m.compute_losses)
        return total

    g = jax.grad(lambda p: loss(model, p))(v["params"])
    g_r = jax.grad(lambda p: loss(model_r, p))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
