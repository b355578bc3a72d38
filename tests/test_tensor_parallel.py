"""Tensor-parallel (2-D data x model mesh) train-step tests.

The reference has no model parallelism (single GPU, ``var_sep/main.py:54``);
this is a TPU-native capability extension (parallel/tensor.py): kernel
leaves shard over a "model" mesh axis via GSPMD annotations and the step
must stay numerically equivalent to the single-device step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from spatiotemporal_variable_separation_tpu.core.config import (
    ConfigError,
    ExperimentConfig,
)
from spatiotemporal_variable_separation_tpu.models.factory import build_separable_network
from spatiotemporal_variable_separation_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    shard_batch,
)
from spatiotemporal_variable_separation_tpu.parallel.tensor import (
    kernel_partition_spec,
    model_axis_size,
    shard_state,
    state_shardings,
)
from spatiotemporal_variable_separation_tpu.train.state import create_train_state
from spatiotemporal_variable_separation_tpu.train.step import (
    make_optimizer,
    make_train_step,
)

from tests.test_train_step import _batch, wave_cfg


def mnist_cfg(**kw):
    base = dict(data="mnist", architecture="dcgan", code_size_s=16,
                code_size_t=16, enc_hidden_size=8, dec_hidden_size=8,
                res_hidden_size=64, n_blocks=1, nt_cond=2, nt_pred=2,
                offset=2, precision="f32", batch_size=8, mixing="mul")
    base.update(kw)
    return ExperimentConfig(**base)


def sst_cfg(**kw):
    """The spatial-code family: encoderSST U-Net skips + ConvResnet
    integrator (spatial T maps, pytree S) — the shape-polymorphic hard
    part (SURVEY §7) must survive tensor-parallel kernel sharding too."""
    base = dict(data="sst", architecture="encoderSST",
                decoder_architecture="decoderSST", mixing="concat",
                skipco=True, code_size_s=8, code_size_t=8, res_hidden_size=8,
                n_blocks=1, nt_cond=2, nt_pred=2, offset=0, zone_size=16,
                precision="f32", batch_size=8)
    base.update(kw)
    return ExperimentConfig(**base)


def test_make_mesh_2d_shape_and_axis_order():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.axis_names == (DATA_AXIS, MODEL_AXIS)
    assert dict(mesh.shape) == {DATA_AXIS: 4, MODEL_AXIS: 2}
    with pytest.raises(ValueError):
        make_mesh(6, model_parallel=4)


def test_kernel_partition_spec_rules():
    # column-parallel: hidden output dim is larger -> shard the output.
    assert kernel_partition_spec((16, 64), 2) == P(None, MODEL_AXIS)
    # row-parallel: large input dim wins -> code output stays replicated.
    assert kernel_partition_spec((64, 16), 2) == P(MODEL_AXIS, None)
    # tie -> output dim (classic hid x hid middle layer).
    assert kernel_partition_spec((64, 64), 2) == P(None, MODEL_AXIS)
    # conv kernels shard a channel dim, never the spatial taps.
    assert kernel_partition_spec((4, 4, 32, 64), 2) == P(None, None, None, MODEL_AXIS)
    assert kernel_partition_spec((4, 4, 8, 1), 2) == P(None, None, MODEL_AXIS, None)
    # nothing divisible -> replicate.
    assert kernel_partition_spec((3, 1), 2) == P()
    assert kernel_partition_spec((7,), 2) == P()


def test_state_shardings_shard_kernels_and_adam_moments():
    cfg = wave_cfg()
    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, 10)
    state = create_train_state(model, cfg, tx)
    mesh = make_mesh(8, model_parallel=2)
    assert model_axis_size(mesh) == 2
    sh = state_shardings(state, mesh)
    sharded_params = [s for s in jax.tree_util.tree_leaves(sh.params)
                      if s.spec != P()]
    assert sharded_params, "no kernel leaf picked up a model-axis shard"
    # Adam mu/nu mirror their parameter's sharding (same leaf paths).
    assert jax.tree_util.tree_structure(sh.params) == \
        jax.tree_util.tree_structure(sh.opt_state[0].mu)
    for ps, ms in zip(jax.tree_util.tree_leaves(sh.params),
                      jax.tree_util.tree_leaves(sh.opt_state[0].mu)):
        assert ps.spec == ms.spec
    # batch stats / step / rng always replicate.
    for s in jax.tree_util.tree_leaves(state_shardings(state.batch_stats, mesh)):
        assert s.spec == P()


@pytest.mark.parametrize("cfg_fn", [wave_cfg, mnist_cfg])
def test_tp_step_matches_single_device(cfg_fn):
    """(data=4, model=2) sharded step == single-device step (SGD: linear in
    gradients, so cross-device reduction noise stays tiny)."""
    import optax

    cfg = cfg_fn()
    model = build_separable_network(cfg)
    tx = optax.sgd(1e-2)
    batch = _batch(cfg, np.random.default_rng(1))

    s1 = create_train_state(model, cfg, tx)
    step1 = make_train_step(model, cfg, tx)
    s1, m1 = step1(s1, *batch)

    mesh = make_mesh(8, model_parallel=2)
    s_tp = create_train_state(model, cfg, tx)
    sh = state_shardings(s_tp, mesh)
    s_tp = jax.device_put(s_tp, sh)
    step_tp = make_train_step(model, cfg, tx, mesh, state_shardings=sh)
    s_tp, m_tp = step_tp(s_tp, *shard_batch(mesh, batch))

    assert float(m1["loss"]) == pytest.approx(float(m_tp["loss"]), rel=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tp_step_matches_single_device_sst_spatial():
    """Tensor parallelism on the spatial-code family (encoderSST U-Net
    skips + ConvResnet integrator, SURVEY §7's shape-polymorphic hard
    part).  A pure model-parallel mesh isolates the kernel-sharding axis:
    measured, (model=2) matches single-device to ~3e-7 while any
    data-parallel split adds ~5e-4 of reduction-order noise through the
    17-block BN conv stack (grad averaging reassociation amplified by
    rsqrt(var) — present with plain dp too, no TP involved), so the
    combined 4x2 mesh is checked at the loss level only."""
    import optax

    cfg = sst_cfg()
    model = build_separable_network(cfg)
    tx = optax.sgd(1e-2)
    batch = _batch(cfg, np.random.default_rng(1))

    s1 = create_train_state(model, cfg, tx)
    step1 = make_train_step(model, cfg, tx)
    s1, m1 = step1(s1, *batch)

    mesh = make_mesh(2, model_parallel=2)  # pure TP: no data split
    s_tp = create_train_state(model, cfg, tx)
    sh = state_shardings(s_tp, mesh)
    assert any(s.spec != P() for s in jax.tree_util.tree_leaves(sh.params)), \
        "no encoderSST kernel picked up a model-axis shard"
    s_tp = jax.device_put(s_tp, sh)
    step_tp = make_train_step(model, cfg, tx, mesh, state_shardings=sh)
    s_tp, m_tp = step_tp(s_tp, *shard_batch(mesh, batch))

    assert float(m1["loss"]) == pytest.approx(float(m_tp["loss"]), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # combined (data=4, model=2) mesh: executes and agrees at loss level.
    mesh2 = make_mesh(8, model_parallel=2)
    s_42 = create_train_state(model, cfg, tx)
    sh2 = state_shardings(s_42, mesh2)
    s_42 = jax.device_put(s_42, sh2)
    step_42 = make_train_step(model, cfg, tx, mesh2, state_shardings=sh2)
    s_42, m_42 = step_42(s_42, *shard_batch(mesh2, batch))
    assert float(m_42["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-4)
    assert int(s_42.step) == 1


def test_tp_kernels_physically_sharded_and_step_advances():
    cfg = wave_cfg()
    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, 10)
    mesh = make_mesh(8, model_parallel=2)
    state = shard_state(create_train_state(model, cfg, tx), mesh)
    # the integrator hidden kernel must actually live split across devices.
    k = state.params["t_resnet"]["block_0"]["block_0"]["linear"]["kernel"]
    assert k.sharding.spec == P(None, MODEL_AXIS)
    assert len({d for shard in k.addressable_shards for d in [shard.device]}) == 8
    assert k.addressable_shards[0].data.shape == (k.shape[0], k.shape[1] // 2)
    sh = state_shardings(state, mesh)
    step = make_train_step(model, cfg, tx, mesh, state_shardings=sh)
    cond, target = shard_batch(mesh, _batch(cfg, np.random.default_rng(0)))
    for _ in range(2):
        state, metrics = step(state, cond, target)
    assert int(state.step) == 2 and np.isfinite(float(metrics["loss"]))
    # updated kernels keep their tensor-parallel layout (no silent gather).
    k = state.params["t_resnet"]["block_0"]["block_0"]["linear"]["kernel"]
    assert k.sharding.spec == P(None, MODEL_AXIS)


def test_config_validates_model_parallel():
    with pytest.raises(ConfigError):
        wave_cfg(model_parallel=0).validate()
    with pytest.raises(ConfigError):
        wave_cfg(model_parallel=3, num_devices=8).validate()
    wave_cfg(model_parallel=2, num_devices=8).validate()


def test_run_training_smoke_with_model_parallel(tmp_path):
    """End-to-end: the CLI-level config drives a 2-D mesh through
    run_training (host dataset path) for one tiny epoch."""
    from spatiotemporal_variable_separation_tpu.train.loop import run_training

    cfg = wave_cfg(model_parallel=2, num_devices=4, epochs=1, batch_size=8,
                   steps_per_epoch=2, xp_dir=str(tmp_path))
    rng = np.random.default_rng(0)
    seq = rng.random((8, cfg.nt_cond + cfg.nt_pred) + cfg.frame_shape,
                     ).astype(np.float32)

    class _DS:
        def __len__(self):
            return 8

        def generate_batch(self, n, rng=None):
            return seq[:n]

    state = run_training(cfg, dataset=_DS(), log_every=1)
    assert int(state.step) == 2
