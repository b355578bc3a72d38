"""Pallas fused-rollout kernel: golden equivalence in interpreter mode
(CPU; the real-TPU equivalence + benchmark are documented in the module)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.models.integrator import MLPResnet
from spatiotemporal_variable_separation_tpu.ops.pallas.rollout import (
    extract_mlp_resnet_params,
    mlp_resnet_rollout,
    mlp_resnet_rollout_reference,
)


@pytest.mark.parametrize("n_blocks,hidden,batch", [(1, 64, 32), (2, 32, 40)])
def test_rollout_matches_module_and_scan(n_blocks, hidden, batch):
    m = MLPResnet(n_blocks=n_blocks, hidden_size=hidden)
    t0 = jnp.asarray(np.random.default_rng(0).random((batch, 20)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), t0)
    params = extract_mlp_resnet_params(v["params"], n_blocks)

    ref = mlp_resnet_rollout_reference(t0, params, 7)
    # scan reference == module applied sequentially
    t, seq = t0, [t0]
    for _ in range(6):
        t, _ = m.apply(v, t)
        seq.append(t)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(jnp.stack(seq)),
                               atol=1e-5)

    out = mlp_resnet_rollout(t0, params, 7, batch_tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_rollout_batch_padding():
    m = MLPResnet(n_blocks=1, hidden_size=32)
    t0 = jnp.asarray(np.random.default_rng(1).random((13, 8)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), t0)
    params = extract_mlp_resnet_params(v["params"], 1)
    out = mlp_resnet_rollout(t0, params, 4, batch_tile=8, interpret=True)
    ref = mlp_resnet_rollout_reference(t0, params, 4)
    assert out.shape == (4, 13, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
