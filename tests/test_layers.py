"""Primitive-layer tests: torch-parity output shapes and MLP structure."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.core.activations import activation
from spatiotemporal_variable_separation_tpu.models.layers import (
    MLP,
    ConvBlock,
    LinBlock,
    max_pool_3x3_s2_p1,
    merge_time,
    upsample_nearest_2x,
)


def _run(mod, *args, **kwargs):
    v = mod.init(jax.random.key(0), *args, **kwargs)
    return mod.apply(v, *args, **kwargs)


def test_activation_registry():
    x = jnp.array([-1.0, 0.0, 2.0])
    assert float(activation("leaky_relu")(x)[0]) == pytest.approx(-0.2)
    assert float(activation("relu")(x)[0]) == 0.0
    np.testing.assert_allclose(np.asarray(activation("none")(x)), np.asarray(x))
    np.testing.assert_allclose(np.asarray(activation(None)(x)), np.asarray(x))
    with pytest.raises(ValueError):
        activation("bogus")


@pytest.mark.parametrize(
    "kernel,stride,pad,transpose,insize,expected",
    [
        (4, 2, 1, False, 64, 32),   # DCGAN encoder conv
        (3, 1, 1, False, 32, 32),   # VGG conv
        (4, 1, 0, False, 4, 1),     # VGG to-code conv
        (5, 2, 3, False, 64, 33),   # ResNet stem
        (4, 2, 1, True, 8, 16),     # DCGAN decoder upconv
        (4, 1, 0, True, 1, 4),      # first_upconv on 1x1
        (3, 1, 1, True, 64, 64),    # VGG decoder final convT
    ],
)
def test_convblock_shapes(kernel, stride, pad, transpose, insize, expected):
    x = jnp.ones((2, insize, insize, 3))
    m = ConvBlock(features=5, kernel=kernel, stride=stride, padding=pad,
                  transpose=transpose, bn=False, act="none")
    y = _run(m, x)
    assert y.shape == (2, expected, expected, 5)


def test_maxpool_torch_parity():
    # torch MaxPool2d(3, 2, 1): 33 -> 17.
    x = jnp.ones((1, 33, 33, 4))
    assert max_pool_3x3_s2_p1(x).shape == (1, 17, 17, 4)


def test_merge_time_channel_order():
    # channel index must be t*C + c (reference conv.py:90 view semantics).
    b, t, h, w, c = 1, 3, 2, 2, 2
    x = jnp.arange(b * t * h * w * c, dtype=jnp.float32).reshape(b, t, h, w, c)
    m = merge_time(x)
    assert m.shape == (b, h, w, t * c)
    for ti in range(t):
        for ci in range(c):
            np.testing.assert_allclose(np.asarray(m[0, :, :, ti * c + ci]),
                                       np.asarray(x[0, ti, :, :, ci]))


def test_upsample_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = upsample_nearest_2x(x)
    assert y.shape == (1, 4, 4, 1)
    assert float(y[0, 0, 1, 0]) == 0.0 and float(y[0, 1, 1, 0]) == 0.0
    assert float(y[0, 0, 2, 0]) == 1.0


def test_mlp_structure_and_preactivation():
    m = MLP(nhid=7, nout=4, nlayers=3)
    x = jnp.ones((2, 5))
    v = m.init(jax.random.key(0), x)
    p = v["params"]
    assert p["block_0"]["linear"]["kernel"].shape == (5, 7)
    assert p["block_1"]["linear"]["kernel"].shape == (7, 7)
    assert p["block_2"]["linear"]["kernel"].shape == (7, 4)
    assert m.apply(v, x).shape == (2, 4)


def test_mlp_single_layer():
    m = MLP(nhid=0, nout=4, nlayers=1)
    x = jnp.ones((2, 5))
    v = m.init(jax.random.key(0), x)
    assert m.apply(v, x).shape == (2, 4)


def test_linblock_preactivation_order():
    # Pre-activation: negative inputs must be zeroed before the matmul.
    m = LinBlock(features=1, act="relu")
    x = jnp.array([[-5.0, -3.0]])
    v = {"params": {"linear": {"kernel": jnp.ones((2, 1)), "bias": jnp.zeros((1,))}}}
    assert float(m.apply(v, x)[0, 0]) == 0.0


def test_batchnorm_train_vs_eval():
    m = ConvBlock(features=4, kernel=3, stride=1, padding=1, bn=True, act="none")
    x = jax.random.normal(jax.random.key(0), (8, 8, 8, 2)) * 5 + 3
    v = m.init(jax.random.key(1), x, train=True)
    y_train, mutated = m.apply(v, x, train=True, mutable=["batch_stats"])
    # train mode: output normalized per batch (approximately standardized
    # modulo the learned N(1, gain) scale).
    assert abs(float(jnp.mean(y_train))) < 0.1
    # running stats moved toward batch stats.
    assert not np.allclose(np.asarray(mutated["batch_stats"]["bn"]["mean"]), 0.0)
    # eval mode must use the running statistics: with fresh stats
    # (mean 0, var 1) the un-normalized conv output passes through, so it
    # differs from the train-mode (batch-normalized) output...
    y_eval_fresh = m.apply(v, x, train=False)
    assert float(jnp.abs(y_eval_fresh - y_train).max()) > 0.5
    # ...and with mutated stats the eval output changes accordingly
    # (momentum 0.9: stats moved 10% toward the batch after one step).
    y_eval_updated = m.apply({"params": v["params"],
                              "batch_stats": mutated["batch_stats"]},
                             x, train=False)
    assert float(jnp.abs(y_eval_updated - y_eval_fresh).max()) > 0.05
