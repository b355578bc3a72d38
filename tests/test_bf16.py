"""bf16 compute path: training stays finite and tracks f32 closely."""

import numpy as np

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.models.factory import build_separable_network
from spatiotemporal_variable_separation_tpu.train.state import create_train_state
from spatiotemporal_variable_separation_tpu.train.step import make_optimizer, make_train_step


def _run(precision: str, steps: int = 5):
    cfg = ExperimentConfig(data="mnist", architecture="dcgan", code_size_s=8,
                           code_size_t=8, enc_hidden_size=4, dec_hidden_size=4,
                           res_hidden_size=8, n_blocks=1, nt_cond=2, nt_pred=2,
                           offset=2, mixing="mul", precision=precision,
                           batch_size=8, lr=1e-3, seed=0)
    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, 10)
    state = create_train_state(model, cfg, tx)
    step = make_train_step(model, cfg, tx)
    rng = np.random.default_rng(0)
    seq = rng.random((8, 4, 64, 64, 1)).astype(np.float32)
    cond, target = jnp.asarray(seq[:, :2]), jnp.asarray(seq[:, 2:])
    losses = []
    for _ in range(steps):
        state, metrics = step(state, cond, target)
        losses.append(float(metrics["loss"]))
    return losses, state


def test_bf16_training_finite_and_close_to_f32():
    l16, s16 = _run("bf16")
    l32, _ = _run("f32")
    assert all(np.isfinite(l16)), l16
    # bf16 loss tracks f32 within a loose tolerance (7-8 bit mantissa)
    for a, b in zip(l16, l32):
        assert abs(a - b) / max(abs(b), 1e-6) < 0.2, (l16, l32)
    # params remain f32 in both cases
    for leaf in jax.tree_util.tree_leaves(s16.params):
        assert leaf.dtype == jnp.float32
