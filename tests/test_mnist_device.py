"""On-device Moving MNIST generator: exact equivalence with the host
pipeline given identical initial conditions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.data.mnist_device import (
    DeviceMovingMNIST,
    fold_positions,
    render_frames,
)
from spatiotemporal_variable_separation_tpu.data.moving_mnist import (
    composite,
    sample_trajectories,
    synthetic_digits,
)


def test_fold_matches_host_trajectories():
    rng = np.random.RandomState(3)
    n, t = 300, 40
    init = np.empty((n, 4), np.int64)
    init[:, 0] = rng.randint(0, 37, n)
    init[:, 1] = rng.randint(0, 37, n)
    init[:, 2] = rng.randint(-4, 5, n)
    init[:, 3] = rng.randint(-4, 5, n)
    host = sample_trajectories(rng, n, t, 64, 28, 4, True, init=init)
    dev = np.asarray(fold_positions(jnp.asarray(init[:, :2], jnp.int32),
                                    jnp.asarray(init[:, 2:], jnp.int32), t, 36))
    np.testing.assert_array_equal(host[..., :2], dev)


def test_render_matches_host_composite():
    rng = np.random.RandomState(0)
    b, d, t = 4, 2, 6
    digits = synthetic_digits(b * d).reshape(b, d, 28, 28)
    init = np.stack([rng.randint(0, 37, (b, d)), rng.randint(0, 37, (b, d)),
                     rng.randint(-4, 5, (b, d)), rng.randint(-4, 5, (b, d))], axis=-1)
    trajs = sample_trajectories(rng, b * d, t, 64, 28, 4, True,
                                init=init.reshape(-1, 4)).reshape(b, d, t, 4)
    host = composite(trajs, digits, 64)
    dev = np.asarray(render_frames(jnp.asarray(trajs[..., :2], jnp.int32),
                                   jnp.asarray(digits), 64))
    # bf16 matmuls place exact 0/1 one-hots times uint8 -> integers <= 255;
    # representable exactly, so the match is exact after the /255.
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_device_generator_end_to_end():
    gen = DeviceMovingMNIST(synthetic_digits(64), nt_cond=3, seq_len=9,
                            num_digits=2)
    cond, target = gen.generate_device_batch(jax.random.PRNGKey(0), 8)
    assert cond.shape == (8, 3, 64, 64, 1)
    assert target.shape == (8, 6, 64, 64, 1)
    v = np.asarray(cond)
    assert v.min() >= 0.0 and v.max() <= 1.0
    assert v.max() > 0.1  # digits actually rendered
    # different keys give different batches
    cond2, _ = gen.generate_device_batch(jax.random.PRNGKey(1), 8)
    assert np.abs(np.asarray(cond2) - v).max() > 0.01
