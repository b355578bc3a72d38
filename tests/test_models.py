"""Encoder/decoder/integrator shape and invariant tests (reference parity
documented per class in the modules under models/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.models.constant import ConstantS
from spatiotemporal_variable_separation_tpu.models.conv import (
    DCGAN64Decoder,
    DCGAN64Encoder,
    DecoderSST,
    DecoderSSTSkip,
    EncoderSST,
    VGG64Decoder,
    VGG64Encoder,
)
from spatiotemporal_variable_separation_tpu.models.integrator import ConvResnet, MLPResnet
from spatiotemporal_variable_separation_tpu.models.mlp_encdec import MLPDecoder, MLPEncoder
from spatiotemporal_variable_separation_tpu.models.resnet18 import ResNet18

B, T = 2, 3


def _run(mod, *args, **kwargs):
    v = mod.init(jax.random.key(0), *args, **kwargs)
    return mod.apply(v, *args, **kwargs)


def seq(c=1, hw=64):
    return jnp.asarray(np.random.default_rng(0).random((B, T, hw, hw, c)), jnp.float32)


def test_dcgan_encoder_shapes_and_skips():
    enc = DCGAN64Encoder(nh=12, nf=8)
    h, skips = _run(enc, seq(), return_skip=True)
    assert h.shape == (B, 12)
    # reversed stage outputs: deepest first (conv.py:98).
    assert [s.shape for s in skips] == [
        (B, 4, 4, 64), (B, 8, 8, 32), (B, 16, 16, 16), (B, 32, 32, 8)]


def test_dcgan_decoder_roundtrip_and_skip():
    s, t = jnp.ones((B, 16)), jnp.ones((B, 8))
    dec = DCGAN64Decoder(nc=1, nf=8, mixing="concat", last_activation="sigmoid")
    y = _run(dec, s, t)
    assert y.shape == (B, 64, 64, 1)
    assert float(y.min()) >= 0 and float(y.max()) <= 1
    skips = [jnp.ones((B, 4, 4, 64)), jnp.ones((B, 8, 8, 32)),
             jnp.ones((B, 16, 16, 16)), jnp.ones((B, 32, 32, 8))]
    dec2 = DCGAN64Decoder(nc=1, nf=8, skip=True, mixing="concat")
    assert _run(dec2, s, t, skip=skips).shape == (B, 64, 64, 1)


@pytest.mark.parametrize("hw,vgg32", [(64, False), (32, True)])
def test_vgg_enc_dec(hw, vgg32):
    enc = VGG64Encoder(nh=10, nf=4, vgg32=vgg32)
    h, skips = _run(enc, seq(c=2, hw=hw), return_skip=True)
    assert h.shape == (B, 10)
    top = hw  # stage 1 resolution
    assert skips[-1].shape == (B, top, top, 4)
    dec = VGG64Decoder(nc=2, nf=4, mixing="concat", vgg32=vgg32)
    y = _run(dec, jnp.ones((B, 6)), jnp.ones((B, 4)))
    assert y.shape == (B, hw, hw, 2)


def test_vgg_skip_decoder():
    enc = VGG64Encoder(nh=10, nf=4)
    _, skips = _run(enc, seq(c=1), return_skip=True)
    dec = VGG64Decoder(nc=1, nf=4, skip=True, mixing="concat")
    y = _run(dec, jnp.ones((B, 6)), jnp.ones((B, 4)), skip=skips)
    assert y.shape == (B, 64, 64, 1)


def test_resnet18_encoder():
    enc = ResNet18(pose_dim=20)
    h = _run(enc, seq(c=3))
    assert h.shape == (B, 20)
    # return_skip accepted but ignored (reference conv.py:546-564).
    h2 = _run(enc, seq(c=3), return_skip=True)
    assert h2.shape == (B, 20)


def test_sst_encoder_decoder():
    enc = EncoderSST(out_c=64)
    code, skips = _run(enc, seq(c=1), return_skip=True)
    assert code.shape == (B, 16, 16, 64)
    assert [s.shape for s in skips] == [
        (B, 16, 16, 256), (B, 32, 32, 128), (B, 64, 64, 64)]
    s_code = jnp.ones((B, 16, 16, 196))
    t_code = jnp.ones((B, 16, 16, 64))
    dec = DecoderSSTSkip(out_c=1)
    y = _run(dec, s_code, t_code, skip=skips)
    assert y.shape == (B, 64, 64, 1)
    dec2 = DecoderSST(out_c=1)
    assert _run(dec2, s_code, t_code).shape == (B, 64, 64, 1)


def test_mlp_encoder_decoder():
    enc = MLPEncoder(nh=32, hidden_size=64, nlayers=3)
    x = seq(c=1)
    h = _run(enc, x)
    assert h.shape == (B, 32)
    dec = MLPDecoder(output_shape=(64, 64, 1), hidden_size=64, nlayers=3,
                     mixing="mul", last_activation="sigmoid")
    y = _run(dec, jnp.ones((B, 32)), h)
    assert y.shape == (B, 64, 64, 1)
    # partial-observation frame shape
    dec2 = MLPDecoder(output_shape=(100, 1), hidden_size=64, nlayers=3,
                      mixing="concat")
    assert _run(dec2, jnp.ones((B, 32)), h).shape == (B, 100, 1)


def test_constant_s():
    m = ConstantS(code_size=20)
    y = _run(m, seq())
    assert y.shape == (B, 20)
    np.testing.assert_allclose(np.asarray(y), 1.0)


def test_mlp_resnet_euler_property():
    m = MLPResnet(n_blocks=3, hidden_size=16)
    x = jnp.asarray(np.random.default_rng(1).random((B, 8)), jnp.float32)
    v = m.init(jax.random.key(0), x)
    y, res = m.apply(v, x)
    assert y.shape == x.shape and res.shape == (3, B, 8)
    # one call == one Euler step: x_out = x_in + sum of block residuals.
    np.testing.assert_allclose(np.asarray(y), np.asarray(x + res.sum(0)), atol=1e-5)


def test_conv_resnet_euler_property():
    m = ConvResnet(n_blocks=2, nf=8)
    x = jnp.asarray(np.random.default_rng(1).random((B, 16, 16, 4)), jnp.float32)
    v = m.init(jax.random.key(0), x)
    (y, res), _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == x.shape and res.shape == (2, B, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x + res.sum(0)), atol=1e-5)


def test_bf16_compute_path():
    enc = DCGAN64Encoder(nh=12, nf=8, dtype=jnp.bfloat16)
    h = _run(enc, seq())
    assert h.dtype == jnp.bfloat16
    v = enc.init(jax.random.key(0), seq())
    # params stay f32
    leaves = jax.tree_util.tree_leaves(v["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
