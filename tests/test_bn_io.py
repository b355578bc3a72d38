"""--bn_io: BatchNorm IO dtype policy (f32 default / follow compute dtype).

The default (``f32``) reproduces the round-1 behavior exactly: BN inputs and
outputs are f32 under any compute policy (torch/Apex-AMP parity — norms are
blacklisted from f16 there, reference ``main.py:35-46``). ``compute`` lets the
normalized tensors stay in the compute dtype (a byte-traffic lever on the
memory-bound conv train steps) while batch/running statistics still
accumulate in f32 (flax forces f32 reductions; running stats live in
param_dtype = f32)."""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from spatiotemporal_variable_separation_tpu.core.config import (
    ConfigError,
    ExperimentConfig,
)
from spatiotemporal_variable_separation_tpu.models.factory import (
    bn_io_dtype,
    build_separable_network,
)


def _tiny_cfg(**kw):
    return ExperimentConfig(
        data="mnist", architecture="dcgan", code_size_s=16, code_size_t=8,
        enc_hidden_size=8, dec_hidden_size=8, res_hidden_size=16, n_blocks=1,
        nt_cond=2, nt_pred=2, offset=2, batch_size=4, seed=0, **kw)


def test_bn_io_validation():
    with pytest.raises(ConfigError):
        _tiny_cfg(precision="bf16", bn_io="bf16").validate()
    _tiny_cfg(precision="bf16", bn_io="compute").validate()


def test_bn_io_dtype_selection():
    assert bn_io_dtype(_tiny_cfg(precision="bf16", bn_io="f32")) == jnp.float32
    assert bn_io_dtype(_tiny_cfg(precision="bf16", bn_io="compute")) == jnp.bfloat16
    assert bn_io_dtype(_tiny_cfg(precision="f32", bn_io="compute")) == jnp.float32


def _init_and_step(cfg):
    model = build_separable_network(cfg)
    cond = jnp.linspace(0, 1, 4 * 2 * 64 * 64).reshape(4, 2, 64, 64, 1)
    cond = cond.astype(jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), cond, 2, train=False)
    out, muts = model.apply(variables, cond, 3, train=True,
                            mutable=["batch_stats"])
    return variables, out, muts


def test_bn_io_compute_runs_bf16_and_keeps_f32_stats():
    cfg = _tiny_cfg(precision="bf16", bn_io="compute")
    variables, out, muts = _init_and_step(cfg)
    forecasts = out[0]
    assert forecasts.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(forecasts.astype(jnp.float32)).all())
    # Running statistics stay f32 regardless of the IO dtype.
    for leaf in jax.tree_util.tree_leaves(muts["batch_stats"]):
        assert leaf.dtype == jnp.float32


def test_bn_io_is_noop_under_f32_policy():
    """Under f32 compute, 'compute' and 'f32' are the same program."""
    cfg_a = _tiny_cfg(precision="f32", bn_io="f32")
    cfg_b = _tiny_cfg(precision="f32", bn_io="compute")
    _, out_a, _ = _init_and_step(cfg_a)
    _, out_b, _ = _init_and_step(cfg_b)
    assert jnp.array_equal(out_a[0], out_b[0])


def test_bn_io_param_structure_unchanged():
    """bn_io must not alter parameter/stat tree structure (checkpoint
    compatibility with round-1 checkpoints)."""
    va, _, _ = _init_and_step(_tiny_cfg(precision="bf16", bn_io="f32"))
    vb, _, _ = _init_and_step(_tiny_cfg(precision="bf16", bn_io="compute"))
    ta = jax.tree_util.tree_structure(va)
    tb = jax.tree_util.tree_structure(vb)
    assert ta == tb
