"""Initializer distribution tests (torch-semantics parity,
reference utils.py:75-109)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.core.inits import (
    bn_scale_init,
    conv_kernel_init,
    conv_transpose_kernel_init,
    dense_kernel_init,
)


def test_normal_std():
    w = dense_kernel_init("normal", 0.02)(jax.random.key(0), (512, 512))
    assert abs(float(jnp.std(w)) - 0.02) < 0.002
    assert abs(float(jnp.mean(w))) < 0.002


def test_kaiming_dense_std():
    # torch kaiming_normal fan_in: std = sqrt(2 / fan_in), fan_in = in.
    w = dense_kernel_init("kaiming", 0.0)(jax.random.key(0), (800, 100))
    assert abs(float(jnp.std(w)) - np.sqrt(2 / 800)) < 0.005


def test_kaiming_conv_fans():
    # Conv fan_in = cin * k * k.
    w = conv_kernel_init("kaiming", 0.0)(jax.random.key(0), (3, 3, 64, 32))
    assert abs(float(jnp.std(w)) - np.sqrt(2 / (64 * 9))) < 0.005
    # torch quirk: ConvTranspose fan uses shape[1] = out channels.
    wt = conv_transpose_kernel_init("kaiming", 0.0)(jax.random.key(0), (3, 3, 64, 32))
    assert abs(float(jnp.std(wt)) - np.sqrt(2 / (32 * 9))) < 0.005


def test_xavier_std():
    w = dense_kernel_init("xavier", 1.0)(jax.random.key(0), (300, 500))
    assert abs(float(jnp.std(w)) - np.sqrt(2 / 800)) < 0.005


def test_orthogonal_dense():
    gain = 1.41
    w = dense_kernel_init("orthogonal", gain)(jax.random.key(1), (64, 32))
    # torch layout (out=32, in=64): rows orthogonal; w is its transpose.
    wt = np.asarray(w).T  # (32, 64)
    gram = wt @ wt.T / gain**2
    np.testing.assert_allclose(gram, np.eye(32), atol=1e-5)


def test_orthogonal_conv():
    gain = 1.0
    w = conv_kernel_init("orthogonal", gain)(jax.random.key(2), (4, 4, 8, 16))
    # torch layout: (out=16, in*k*k=128) rows orthonormal.
    wt = np.transpose(np.asarray(w), (3, 2, 0, 1)).reshape(16, -1)
    np.testing.assert_allclose(wt @ wt.T, np.eye(16), atol=1e-5)


def test_bn_scale():
    s = bn_scale_init(0.02)(jax.random.key(0), (4096,))
    assert abs(float(jnp.mean(s)) - 1.0) < 0.01
    assert abs(float(jnp.std(s)) - 0.02) < 0.005


def test_unknown_init_raises():
    with pytest.raises(NotImplementedError):
        dense_kernel_init("bogus", 1.0)(jax.random.key(0), (4, 4))
