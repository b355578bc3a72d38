"""Coverage for smaller paths: prefetch, stochastic test-set prefix,
skipco eval swap, WaveEq window validation, mesh errors."""

import struct

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.data.loader import Batcher, prefetch_to_device
from spatiotemporal_variable_separation_tpu.parallel.mesh import make_mesh


class _Toy:
    def __len__(self):
        return 7

    def __getitem__(self, i):
        return (np.full((2,), i, np.float32),)


def test_prefetch_to_device():
    it = iter([(np.ones((2, 3)),), (np.zeros((2, 3)),)])
    out = list(prefetch_to_device(it, size=2))
    assert len(out) == 2
    assert isinstance(out[0][0], jax.Array)
    np.testing.assert_allclose(np.asarray(out[1][0]), 0.0)


def test_batcher_keep_last():
    b = Batcher(_Toy(), batch_size=4, shuffle=False, drop_last=False)
    batches = list(b)
    assert len(batches) == 2
    assert batches[0][0].shape == (4, 2)
    assert batches[1][0].shape == (3, 2)


def test_make_mesh_too_many_devices():
    with pytest.raises(ValueError):
        make_mesh(10_000)


def test_wave_seq_len_validation(tmp_path):
    from spatiotemporal_variable_separation_tpu.data.wave_eq import (
        WaveEq,
        generate_dataset,
    )

    generate_dataset(str(tmp_path), size=5, seq_len=20, batch=5)
    with pytest.raises(ValueError, match="seq_len"):
        WaveEq(str(tmp_path), nt_cond=5, seq_len=45, train=False, downsample=2)


def test_stochastic_test_set_prefix(tmp_path):
    """make_dataset(train=False, deterministic=False) loads the 's'-prefixed
    npz (reference moving_mnist.py:333-338)."""
    from spatiotemporal_variable_separation_tpu.data.moving_mnist import MovingMNIST

    seqs = np.random.default_rng(0).integers(0, 255, (6, 4, 1, 64, 64)).astype(np.uint8)
    np.savez_compressed(tmp_path / "smmnist_test_2digits_64.npz", sequences=seqs)
    ds = MovingMNIST.make_dataset(str(tmp_path), 64, 2, 6, 4, deterministic=False,
                                  num_digits=2, train=False)
    cond, target = ds[0]
    assert cond.shape == (2, 64, 64, 1) and target.shape == (4, 64, 64, 1)


def test_evaluator_swap_with_skipco():
    from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
    from spatiotemporal_variable_separation_tpu.eval.common import Evaluator
    from spatiotemporal_variable_separation_tpu.models.factory import (
        build_separable_network,
    )

    cfg = ExperimentConfig(data="mnist", architecture="dcgan", code_size_s=8,
                           code_size_t=8, enc_hidden_size=4, dec_hidden_size=4,
                           res_hidden_size=8, nt_cond=2, nt_pred=2, offset=2,
                           skipco=True, precision="f32")
    model = build_separable_network(cfg)
    cond = jnp.asarray(np.random.default_rng(0).random((2, 2, 64, 64, 1)),
                       jnp.float32)
    v = model.init(jax.random.PRNGKey(0), cond, 2, train=False)
    ev = Evaluator(model, dict(v))
    fc, s_full = ev.forecast(np.asarray(cond), 4)
    assert fc.shape == (2, 4, 64, 64, 1)
    fc2, _ = ev.forecast(np.asarray(cond), 4, init_s_code=s_full)
    np.testing.assert_allclose(np.asarray(fc), np.asarray(fc2), atol=1e-6)


def test_platform_flag_plumbing():
    # --platform cpu must parse on every CLI that offers it and apply
    # before the mesh/backend initializes (in the test env the platform is
    # already cpu, so applying it is an idempotent no-op we can assert on).
    import argparse

    from spatiotemporal_variable_separation_tpu.cli.options import (
        add_devices_arg,
        add_platform_arg,
        apply_platform,
        mesh_from_args,
    )

    p = argparse.ArgumentParser()
    add_devices_arg(p)
    add_platform_arg(p)
    args = p.parse_args(["--platform", "cpu", "--devices", "2"])
    apply_platform(args)
    assert jax.config.jax_platforms == "cpu"
    mesh = mesh_from_args(args)  # applies platform, then builds the mesh
    assert mesh.devices.size == 2
    assert all(d.platform == "cpu" for d in mesh.devices.flat)
    with pytest.raises(SystemExit):
        p.parse_args(["--platform", "tpu"])  # only cpu is a valid override
