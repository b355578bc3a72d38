"""Structural parity: trainable-parameter counts must match the reference
torch modules exactly (imported read-only from /root/reference).

This catches silent architecture drift (a missing BatchNorm, a wrong
hidden width, an extra layer) that shape tests can't see."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference not mounted")


def _ref():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.datasets = types.SimpleNamespace(MNIST=None)
        sys.modules["torchvision"] = tv
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import var_sep.networks.conv as rconv
    import var_sep.networks.mlp_encdec as rmlp
    import var_sep.networks.resnet as rres

    return rconv, rmlp, rres


def _torch_trainable(module) -> int:
    return sum(p.numel() for p in module.parameters() if p.requires_grad)


def _flax_trainable(module, *args, **kwargs) -> int:
    v = module.init(jax.random.PRNGKey(0), *args, **kwargs)
    return sum(x.size for x in jax.tree_util.tree_leaves(v["params"]))


SEQ = jnp.ones((1, 3, 64, 64, 1))  # (B, T, H, W, C), nt_cond=3, nc=1


def test_dcgan_encoder_params():
    rconv, _, _ = _ref()
    from spatiotemporal_variable_separation_tpu.models.conv import DCGAN64Encoder

    ref = rconv.DCGAN64Encoder(3, 128, 8)  # nc*nt_cond=3, nh=128, nf=8
    ours = _flax_trainable(DCGAN64Encoder(nh=128, nf=8), SEQ)
    assert ours == _torch_trainable(ref)


@pytest.mark.parametrize("skip", [False, True])
def test_dcgan_decoder_params(skip):
    rconv, _, _ = _ref()
    from spatiotemporal_variable_separation_tpu.models.conv import DCGAN64Decoder

    ref = rconv.DCGAN64Decoder(1, 24, 8, skip, "sigmoid", "concat")
    dec = DCGAN64Decoder(nc=1, nf=8, skip=skip, last_activation="sigmoid",
                         mixing="concat")
    s, t = jnp.ones((1, 16)), jnp.ones((1, 8))
    skips = None
    if skip:
        skips = [jnp.ones((1, 4, 4, 64)), jnp.ones((1, 8, 8, 32)),
                 jnp.ones((1, 16, 16, 16)), jnp.ones((1, 32, 32, 8))]
    ours = _flax_trainable(dec, s, t, skip=skips)
    assert ours == _torch_trainable(ref)


@pytest.mark.parametrize("vgg32", [False, True])
def test_vgg_encoder_params(vgg32):
    rconv, _, _ = _ref()
    from spatiotemporal_variable_separation_tpu.models.conv import VGG64Encoder

    ref = rconv.VGG64Encoder(3, 128, 16, vgg32=vgg32)
    hw = 32 if vgg32 else 64
    seq = jnp.ones((1, 3, hw, hw, 1))
    ours = _flax_trainable(VGG64Encoder(nh=128, nf=16, vgg32=vgg32), seq)
    assert ours == _torch_trainable(ref)


@pytest.mark.parametrize("skip", [False, True])
def test_vgg_decoder_params(skip):
    rconv, _, _ = _ref()
    from spatiotemporal_variable_separation_tpu.models.conv import VGG64Decoder

    ref = rconv.VGG64Decoder(2, 24, 16, skip, None, "concat")
    dec = VGG64Decoder(nc=2, nf=16, skip=skip, mixing="concat")
    s, t = jnp.ones((1, 16)), jnp.ones((1, 8))
    skips = None
    if skip:
        skips = [jnp.ones((1, 8, 8, 128)), jnp.ones((1, 16, 16, 64)),
                 jnp.ones((1, 32, 32, 32)), jnp.ones((1, 64, 64, 16))]
    ours = _flax_trainable(dec, s, t, skip=skips)
    assert ours == _torch_trainable(ref)


def test_resnet18_params():
    rconv, _, _ = _ref()
    from spatiotemporal_variable_separation_tpu.models.resnet18 import ResNet18

    ref = rconv.ResNet18(20, nc=3)
    ours = _flax_trainable(ResNet18(pose_dim=20), SEQ)
    # documented divergence: the reference allocates bn_out but never uses
    # it in forward (conv.py:526,546-564); we don't allocate the dead params.
    dead_bn_out = 2 * 20
    assert ours == _torch_trainable(ref) - dead_bn_out


def test_sst_pair_params():
    rconv, _, _ = _ref()
    from spatiotemporal_variable_separation_tpu.models.conv import (
        DecoderSST,
        DecoderSSTSkip,
        EncoderSST,
    )

    ref_enc = rconv.EncoderSST(4, 64)
    seq = jnp.ones((1, 4, 64, 64, 1))
    assert _flax_trainable(EncoderSST(out_c=64), seq) == _torch_trainable(ref_enc)

    s = jnp.ones((1, 16, 16, 196))
    t = jnp.ones((1, 16, 16, 64))
    ref_dec = rconv.DecoderSST(260, 1, None)
    assert _flax_trainable(DecoderSST(out_c=1), s, t) == _torch_trainable(ref_dec)

    ref_skip = rconv.DecoderSST_Skip(260, 1, None)
    skips = [jnp.ones((1, 16, 16, 256)), jnp.ones((1, 32, 32, 128)),
             jnp.ones((1, 64, 64, 64))]
    assert (_flax_trainable(DecoderSSTSkip(out_c=1), s, t, skip=skips)
            == _torch_trainable(ref_skip))


def test_mlp_encdec_params():
    _, rmlp, _ = _ref()
    from spatiotemporal_variable_separation_tpu.models.mlp_encdec import (
        MLPDecoder,
        MLPEncoder,
    )

    ref_enc = rmlp.MLPEncoder(3 * 64 * 64, 1200, 32, 3)
    ours = _flax_trainable(MLPEncoder(nh=32, hidden_size=1200, nlayers=3), SEQ)
    assert ours == _torch_trainable(ref_enc)

    ref_dec = rmlp.MLPDecoder(32, 1200, [1, 64, 64], 4, "sigmoid", "mul")
    dec = MLPDecoder(output_shape=(64, 64, 1), hidden_size=1200, nlayers=4,
                     last_activation="sigmoid", mixing="mul")
    ours = _flax_trainable(dec, jnp.ones((1, 32)), jnp.ones((1, 32)))
    assert ours == _torch_trainable(ref_dec)


def test_integrator_params():
    _, _, rres = _ref()
    from spatiotemporal_variable_separation_tpu.models.integrator import (
        ConvResnet,
        MLPResnet,
    )

    ref = rres.MLPResnet(32, 3, 512)
    ours = _flax_trainable(MLPResnet(n_blocks=3, hidden_size=512),
                           jnp.ones((1, 32)))
    assert ours == _torch_trainable(ref)

    ref_c = rres.ConvResnet(64, n_blocks=2, nf=64)
    ours_c = _flax_trainable(ConvResnet(n_blocks=2, nf=64),
                             jnp.ones((1, 16, 16, 64)))
    assert ours_c == _torch_trainable(ref_c)
