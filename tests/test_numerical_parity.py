"""Numerical forward parity: transplant this framework's weights into the
reference torch modules and compare outputs to float tolerance.

This is the strongest possible parity evidence short of training runs: the
same weights must produce the same functions.  Weight-layout mappings:

=============== ===================== ==============================
layer           flax kernel            torch weight
=============== ===================== ==============================
Dense           (in, out)              (out, in)        = k.T
Conv            (kh, kw, in, out)      (out, in, kh, kw) = k.transpose(3,2,0,1)
ConvTranspose   (kh, kw, in, out)      (in, out, kh, kw) = flip_hw(k).transpose(2,3,0,1)
=============== ===================== ==============================

(flax ConvTranspose with default ``transpose_kernel=False`` equals torch's
conv_transpose2d after a spatial flip + in/out transpose of the kernel.)
"""

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

torch = pytest.importorskip("torch")


def _ref_modules():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.datasets = types.SimpleNamespace(MNIST=None)
        sys.modules["torchvision"] = tv
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import var_sep.networks.conv as rconv
    import var_sep.networks.mlp_encdec as rmlp
    import var_sep.networks.model as rmodel
    import var_sep.networks.resnet as rres

    return rconv, rmlp, rres, rmodel


def _t(x):
    return torch.tensor(np.asarray(x, np.float32))


def _dense_to_torch(lin, params):
    lin.weight.data = _t(params["kernel"]).T.contiguous()
    lin.bias.data = _t(params["bias"])


def _conv_to_torch(conv, params):
    conv.weight.data = _t(np.transpose(np.asarray(params["kernel"]), (3, 2, 0, 1)))
    conv.bias.data = _t(params["bias"])


def _convT_to_torch(conv, params):
    k = np.asarray(params["kernel"])[::-1, ::-1].copy()  # flip spatial
    conv.weight.data = _t(np.transpose(k, (2, 3, 0, 1)))
    conv.bias.data = _t(params["bias"])


def _bn_to_torch(bn, params, stats=None):
    bn.weight.data = _t(params["scale"])
    bn.bias.data = _t(params["bias"])
    if stats is not None:
        bn.running_mean.data = _t(stats["mean"])
        bn.running_var.data = _t(stats["var"])


def test_mlp_encoder_decoder_forward_parity():
    _, rmlp, _, _ = _ref_modules()
    from spatiotemporal_variable_separation_tpu.models.mlp_encdec import (
        MLPDecoder,
        MLPEncoder,
    )

    rng = np.random.default_rng(0)
    seq = rng.random((3, 4, 16, 16, 1)).astype(np.float32)

    enc = MLPEncoder(nh=12, hidden_size=32, nlayers=3)
    v = enc.init(jax.random.PRNGKey(1), jnp.asarray(seq))
    ref = rmlp.MLPEncoder(4 * 16 * 16, 32, 12, 3)
    for il in range(3):
        _dense_to_torch(ref.mlp.module[il][-1],
                        v["params"]["mlp"][f"block_{il}"]["linear"])
    ours = np.asarray(enc.apply(v, jnp.asarray(seq)))
    # torch flattens (B, T, C, H, W): channel-major per frame; ours flattens
    # (B, T, H, W, C).  For C=1 the flattenings coincide.
    with torch.no_grad():
        theirs = ref(_t(seq.transpose(0, 1, 4, 2, 3))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)

    dec = MLPDecoder(output_shape=(16, 16, 1), hidden_size=32, nlayers=3,
                     last_activation="sigmoid", mixing="mul")
    z1 = rng.random((3, 12)).astype(np.float32)
    z2 = rng.random((3, 12)).astype(np.float32)
    vd = dec.init(jax.random.PRNGKey(2), jnp.asarray(z1), jnp.asarray(z2))
    ref_d = rmlp.MLPDecoder(12, 32, [1, 16, 16], 3, "sigmoid", "mul")
    for il in range(3):
        _dense_to_torch(ref_d.mlp.module[il][-1],
                        vd["params"]["mlp"][f"block_{il}"]["linear"])
    ours_d = np.asarray(dec.apply(vd, jnp.asarray(z1), jnp.asarray(z2)))
    with torch.no_grad():
        theirs_d = ref_d(_t(z1), _t(z2)).numpy()  # (B, 1, 16, 16)
    np.testing.assert_allclose(ours_d.transpose(0, 3, 1, 2), theirs_d, atol=2e-5)


def test_mlp_resnet_forward_parity():
    _, _, rres, _ = _ref_modules()
    from spatiotemporal_variable_separation_tpu.models.integrator import MLPResnet

    rng = np.random.default_rng(1)
    x = rng.random((5, 8)).astype(np.float32)
    m = MLPResnet(n_blocks=2, hidden_size=16)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = rres.MLPResnet(8, 2, 16)
    for i in range(2):
        for il in range(3):
            _dense_to_torch(ref.blocks[i].mlp.module[il][-1],
                            v["params"][f"block_{i}"][f"block_{il}"]["linear"])
    ours, ours_res = m.apply(v, jnp.asarray(x))
    with torch.no_grad():
        theirs, theirs_res = ref(_t(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours_res[0]), theirs_res[0].numpy(),
                               atol=2e-5)


def test_dcgan_encoder_forward_parity():
    rconv, _, _, _ = _ref_modules()
    from spatiotemporal_variable_separation_tpu.models.conv import DCGAN64Encoder

    rng = np.random.default_rng(2)
    seq = rng.random((2, 3, 64, 64, 1)).astype(np.float32)
    enc = DCGAN64Encoder(nh=10, nf=4)
    v = enc.init(jax.random.PRNGKey(0), jnp.asarray(seq))
    ref = rconv.DCGAN64Encoder(3, 10, 4)

    p = v["params"]
    s = v["batch_stats"]
    # stage 0: conv only (no BN); stages 1-3: conv + BN.
    _conv_to_torch(ref.conv[0][0], p["stage_0"]["conv"])
    for i in (1, 2, 3):
        _conv_to_torch(ref.conv[i][0], p[f"stage_{i}"]["conv"])
        _bn_to_torch(ref.conv[i][1], p[f"stage_{i}"]["bn"], s[f"stage_{i}"]["bn"])
    _dense_to_torch(ref.last_op[1], p["to_code"])

    ref.eval()
    ours = np.asarray(enc.apply(v, jnp.asarray(seq), train=False))
    with torch.no_grad():
        theirs = ref(_t(seq.transpose(0, 1, 4, 2, 3))).numpy()
    # tolerance: different conv accumulation orders across a 4-conv stack
    # (XLA vs torch CPU) — agreement to ~1e-4 absolute.
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_resnet18_forward_parity():
    rconv, _, _, _ = _ref_modules()
    from spatiotemporal_variable_separation_tpu.models.resnet18 import ResNet18

    rng = np.random.default_rng(6)
    seq = rng.random((2, 1, 64, 64, 3)).astype(np.float32)
    enc = ResNet18(pose_dim=5)
    v = enc.init(jax.random.PRNGKey(0), jnp.asarray(seq))
    ref = rconv.ResNet18(5, nc=3)

    p, s = v["params"], v["batch_stats"]
    _conv_to_torch(ref.conv1, p["stem_conv"])
    _bn_to_torch(ref.bn1, p["stem_bn"], s["stem_bn"])
    for stage in range(4):
        layer = getattr(ref, f"layer{stage + 1}")
        for block in range(2):
            name = f"layer{stage + 1}_block{block}"
            rb = layer[block]
            _conv_to_torch(rb.conv1, p[name]["conv1"])
            _bn_to_torch(rb.bn1, p[name]["bn1"], s[name]["bn1"])
            _conv_to_torch(rb.conv2, p[name]["conv2"])
            _bn_to_torch(rb.bn2, p[name]["bn2"], s[name]["bn2"])
            if rb.downsample is not None:
                _conv_to_torch(rb.downsample[0], p[name]["down_conv"])
                _bn_to_torch(rb.downsample[1], p[name]["down_bn"],
                             s[name]["down_bn"])
    _conv_to_torch(ref.conv_out, p["conv_out"])

    ref.eval()
    ours = np.asarray(enc.apply(v, jnp.asarray(seq), train=False))
    with torch.no_grad():
        theirs = ref(_t(seq.transpose(0, 1, 4, 2, 3))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_vgg_encoder_forward_parity():
    rconv, _, _, _ = _ref_modules()
    from spatiotemporal_variable_separation_tpu.models.conv import VGG64Encoder

    rng = np.random.default_rng(4)
    seq = rng.random((2, 2, 64, 64, 1)).astype(np.float32)
    enc = VGG64Encoder(nh=6, nf=4)
    v = enc.init(jax.random.PRNGKey(0), jnp.asarray(seq))
    ref = rconv.VGG64Encoder(2, 6, 4)

    p, s = v["params"], v["batch_stats"]
    # stage i, conv j -> reference nn.Sequential structure: stage 0 has
    # convs at [0], [1]; stages 1-3 start with MaxPool so convs at [1]...
    widths = [2, 2, 3, 3]
    for i, w in enumerate(widths):
        off = 0 if i == 0 else 1
        for j in range(w):
            blk = ref.conv[i][off + j]
            name = f"stage_{i}_conv_{j}"
            _conv_to_torch(blk[0], p[name]["conv"])
            _bn_to_torch(blk[1], p[name]["bn"], s[name]["bn"])
    # last_op: MaxPool, then conv+BN (no activation)
    _conv_to_torch(ref.last_op[1][0], p["to_code"]["conv"])
    _bn_to_torch(ref.last_op[1][1], p["to_code"]["bn"], s["to_code"]["bn"])

    ref.eval()
    ours = np.asarray(enc.apply(v, jnp.asarray(seq), train=False))
    with torch.no_grad():
        theirs = ref(_t(seq.transpose(0, 1, 4, 2, 3))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_sst_decoder_forward_parity():
    rconv, _, _, _ = _ref_modules()
    from spatiotemporal_variable_separation_tpu.models.conv import DecoderSST

    rng = np.random.default_rng(5)
    s_code = rng.random((1, 16, 16, 6)).astype(np.float32)
    t_code = rng.random((1, 16, 16, 4)).astype(np.float32)
    dec = DecoderSST(out_c=1, last_activation=None)
    v = dec.init(jax.random.PRNGKey(0), jnp.asarray(s_code), jnp.asarray(t_code))
    ref = rconv.DecoderSST(10, 1, None)

    p, s = v["params"], v["batch_stats"]
    # conv1: 3 blocks then Upsample; conv2: 3 blocks then Upsample; conv3: 2.
    for stage, n_convs in (("conv1", 3), ("conv2", 3), ("conv3", 2)):
        for j in range(n_convs):
            blk = getattr(ref, stage)[j]
            name = f"{stage}_{j}"
            _conv_to_torch(blk[0], p[name]["conv"])
            _bn_to_torch(blk[1], p[name]["bn"], s[name]["bn"])

    ref.eval()
    ours = np.asarray(dec.apply(v, jnp.asarray(s_code), jnp.asarray(t_code),
                                train=False))
    with torch.no_grad():
        theirs = ref(_t(s_code.transpose(0, 3, 1, 2)),
                     _t(t_code.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), theirs, atol=5e-4)


def test_dcgan_decoder_forward_parity():
    rconv, _, _, _ = _ref_modules()
    from spatiotemporal_variable_separation_tpu.models.conv import DCGAN64Decoder

    rng = np.random.default_rng(3)
    z1 = rng.random((2, 6)).astype(np.float32)
    z2 = rng.random((2, 4)).astype(np.float32)
    dec = DCGAN64Decoder(nc=1, nf=4, last_activation="sigmoid", mixing="concat")
    v = dec.init(jax.random.PRNGKey(0), jnp.asarray(z1), jnp.asarray(z2))
    ref = rconv.DCGAN64Decoder(1, 10, 4, False, "sigmoid", "concat")

    p, s = v["params"], v["batch_stats"]
    _convT_to_torch(ref.first_upconv[0], p["first_upconv"]["conv"])
    _bn_to_torch(ref.first_upconv[1], p["first_upconv"]["bn"],
                 s["first_upconv"]["bn"])
    for i in range(3):
        _convT_to_torch(ref.conv[i][0], p[f"up_{i}"]["conv"])
        _bn_to_torch(ref.conv[i][1], p[f"up_{i}"]["bn"], s[f"up_{i}"]["bn"])
    _convT_to_torch(ref.conv[3], p["to_frame"]["conv"])

    ref.eval()
    ours = np.asarray(dec.apply(v, jnp.asarray(z1), jnp.asarray(z2), train=False))
    with torch.no_grad():
        theirs = ref(_t(z1), _t(z2)).numpy()  # (B, 1, 64, 64)
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), theirs, atol=5e-5)
