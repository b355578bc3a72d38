"""Reference-checkpoint importer: round-trip every architecture family
through the ACTUAL reference classes — build the reference's modules with
its own factory (random torch init + randomized BN stats), pickle them the
way ``var_sep/utils/helper.py:22-33`` does, import with
``utils.transplant``, and require the imported flax components to
reproduce the torch forwards in eval mode."""

import json
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.utils.transplant import (
    import_reference_checkpoint,
)

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference not mounted")

torch = pytest.importorskip("torch")


def _ref_factory():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.datasets = types.SimpleNamespace(MNIST=None)
        sys.modules["torchvision"] = tv
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import var_sep.networks.factory as rfac
    from var_sep.networks.utils import ConstantS

    return rfac, ConstantS


def _randomize_bn_stats(module, rng):
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            n = m.running_mean.numel()
            m.running_mean.data = torch.tensor(
                rng.standard_normal(n).astype(np.float32) * 0.3)
            m.running_var.data = torch.tensor(
                (rng.random(n).astype(np.float32) * 1.5 + 0.25))


def _build_reference_xp(tmp_path, cfg: ExperimentConfig, seed=0):
    """Assemble the 4 torch modules exactly as ``var_sep/main.py:116-140``
    and save a reference-layout experiment dir."""
    rfac, ConstantS = _ref_factory()
    rng = np.random.default_rng(seed)
    torch.manual_seed(seed)
    cfg = cfg.validate()
    h, w = cfg.frame_shape[0], cfg.frame_shape[1] if len(cfg.frame_shape) == 3 else 1
    shape = [cfg.channels, h, w]  # reference shape layout: (C, H, W)
    if cfg.no_s:
        es = ConstantS(return_value=1, code_size=cfg.code_size_s)
    else:
        es = rfac.get_encoder(cfg.architecture, shape, cfg.code_size_s,
                              cfg.enc_hidden_size, cfg.enc_n_layers, cfg.nt_cond,
                              cfg.init_encoder, cfg.gain_encoder)
    et = rfac.get_encoder(cfg.architecture, shape, cfg.code_size_t,
                          cfg.enc_hidden_size, cfg.enc_n_layers, cfg.nt_cond,
                          cfg.init_encoder, cfg.gain_encoder)
    decoder = rfac.get_decoder(cfg.decoder_arch, shape, cfg.code_size_t,
                               cfg.code_size_s, cfg.last_activation,
                               cfg.dec_hidden_size, cfg.dec_n_layers, cfg.mixing,
                               cfg.skipco, cfg.init_encoder, cfg.gain_encoder)
    t_resnet = rfac.get_resnet(cfg.code_size_t, cfg.n_blocks, cfg.res_hidden_size,
                               cfg.init_resnet, cfg.gain_resnet,
                               cfg.fully_conv_integrator)
    for m in (es, et, decoder, t_resnet):
        _randomize_bn_stats(m, rng)
        m.eval()
    ref_dir = tmp_path / "ref_xp"
    ref_dir.mkdir()
    cfg.save(str(ref_dir / "params.json"))
    torch.save(et, str(ref_dir / "ov_Et.pt"))
    torch.save(es, str(ref_dir / "ov_Es.pt"))
    torch.save(decoder, str(ref_dir / "decoder.pt"))
    torch.save(t_resnet, str(ref_dir / "t_resnet.pt"))
    return ref_dir, {"Es": es, "Et": et, "decoder": decoder, "t_resnet": t_resnet}


def _import_and_load(tmp_path, ref_dir):
    out_dir = tmp_path / "native_xp"
    logs = []
    import_reference_checkpoint(str(ref_dir), str(out_dir),
                                reference_root=REFERENCE, log_fn=logs.append)
    from spatiotemporal_variable_separation_tpu.checkpoint import load_for_eval

    model, variables, cfg = load_for_eval(str(out_dir))
    return model, variables, cfg, logs


def _sub_vars(variables, key):
    v = {"params": variables["params"][key]}
    stats = variables.get("batch_stats", {})
    if key in stats:
        v["batch_stats"] = stats[key]
    return v


def _t(x):
    return torch.tensor(np.ascontiguousarray(x, np.float32))


def _to_torch_seq(x):  # (B, T, H, W, C) -> (B, T, C, H, W)
    return _t(np.transpose(x, (0, 1, 4, 2, 3)))


def _check_encoder(model, variables, ref, key, x, atol):
    m = getattr(model, key).clone(name=None)
    ours = np.asarray(m.apply(_sub_vars(variables, key), jnp.asarray(x),
                              train=False))
    with torch.no_grad():
        theirs = ref(_to_torch_seq(x)).numpy()
    np.testing.assert_allclose(ours.reshape(theirs.shape if ours.ndim == 2
                                            else ours.shape),
                               theirs if ours.ndim == 2
                               else np.moveaxis(theirs, 1, -1),
                               rtol=2e-4, atol=atol)


def _check_integrator(model, variables, ref, x, atol, spatial=False):
    m = model.t_resnet.clone(name=None)
    ours, _ = m.apply(_sub_vars(variables, "t_resnet"), jnp.asarray(x),
                      train=False)
    with torch.no_grad():
        t_in = _t(np.moveaxis(x, -1, 1)) if spatial else _t(x)
        theirs, _ = ref(t_in)
        theirs = theirs.numpy()
    ours = np.asarray(ours)
    if spatial:
        ours = np.moveaxis(ours, -1, 1)
    np.testing.assert_allclose(ours, theirs, atol=atol)


def test_import_wave_mlp_family(tmp_path):
    cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                           code_size_s=8, code_size_t=8, enc_hidden_size=24,
                           dec_hidden_size=24, res_hidden_size=16, n_blocks=2,
                           enc_n_layers=2, dec_n_layers=2, nt_cond=3, nt_pred=3,
                           offset=3, precision="f32")
    ref_dir, refs = _build_reference_xp(tmp_path, cfg)
    model, variables, cfg, logs = _import_and_load(tmp_path, ref_dir)
    rng = np.random.default_rng(1)
    x = rng.random((2, 3, 64, 64, 1)).astype(np.float32)
    _check_encoder(model, variables, refs["Es"], "Es", x, 2e-5)
    _check_encoder(model, variables, refs["Et"], "Et", x, 2e-5)
    _check_integrator(model, variables, refs["t_resnet"],
                      rng.random((4, 8)).astype(np.float32), 2e-5)
    z1 = rng.random((2, 8)).astype(np.float32)
    z2 = rng.random((2, 8)).astype(np.float32)
    dec = model.decoder.clone(name=None)
    ours = np.asarray(dec.apply(_sub_vars(variables, "decoder"),
                                jnp.asarray(z1), jnp.asarray(z2), train=False))
    with torch.no_grad():
        theirs = refs["decoder"](_t(z1), _t(z2)).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), theirs, atol=2e-5)
    # the imported dir is a first-class experiment dir: full rollout works
    fc, *_ = model.apply(variables, jnp.asarray(x), 6, train=False,
                         method=model.get_forecast)
    assert fc.shape == (2, 6, 64, 64, 1)
    assert np.isfinite(np.asarray(fc)).all()


def test_import_mnist_dcgan_skipco_family(tmp_path):
    # gain_encoder is raised so late-stage activations vary spatially —
    # at the default 0.02 the 4x4 pre-code map is near-constant and a wrong
    # flatten order (the channels-last vs channel-major permutation in
    # ``to_code``) would go undetected.
    cfg = ExperimentConfig(data="mnist", architecture="dcgan", mixing="mul",
                           code_size_s=12, code_size_t=12, enc_hidden_size=8,
                           dec_hidden_size=8, res_hidden_size=16, n_blocks=1,
                           nt_cond=2, nt_pred=2, offset=2, skipco=True,
                           gain_encoder=0.5, precision="f32")
    ref_dir, refs = _build_reference_xp(tmp_path, cfg)
    model, variables, cfg, logs = _import_and_load(tmp_path, ref_dir)
    rng = np.random.default_rng(2)
    x = rng.random((2, 2, 64, 64, 1)).astype(np.float32)
    _check_encoder(model, variables, refs["Es"], "Es", x, 5e-4)
    _check_encoder(model, variables, refs["Et"], "Et", x, 5e-4)
    # decoder with skip connections: feed the same random skips to both
    z1 = rng.random((2, 12)).astype(np.float32)
    z2 = rng.random((2, 12)).astype(np.float32)
    nf = cfg.dec_hidden_size
    skips = [rng.random((2, h, w, c)).astype(np.float32) * 0.5
             for (h, w, c) in [(4, 4, nf * 8), (8, 8, nf * 4),
                               (16, 16, nf * 2), (32, 32, nf)]]
    dec = model.decoder.clone(name=None)
    ours = np.asarray(dec.apply(_sub_vars(variables, "decoder"),
                                jnp.asarray(z1), jnp.asarray(z2),
                                skip=[jnp.asarray(s) for s in skips],
                                train=False))
    with torch.no_grad():
        theirs = refs["decoder"](
            _t(z1), _t(z2),
            skip=[_t(np.transpose(s, (0, 3, 1, 2))) for s in skips]).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), theirs, atol=5e-4)


def test_import_chairs_resnet_family(tmp_path):
    # ResNet18 encoders: exercises the dead-bn_out skip.
    cfg = ExperimentConfig(data="chairs", architecture="resnet",
                           decoder_architecture="dcgan", mixing="concat",
                           code_size_s=10, code_size_t=6, enc_hidden_size=8,
                           dec_hidden_size=8, res_hidden_size=16, n_blocks=1,
                           nt_cond=2, nt_pred=2, offset=2, precision="f32")
    ref_dir, refs = _build_reference_xp(tmp_path, cfg)
    model, variables, cfg, logs = _import_and_load(tmp_path, ref_dir)
    rng = np.random.default_rng(3)
    x = rng.random((2, 2, 64, 64, 3)).astype(np.float32)
    _check_encoder(model, variables, refs["Es"], "Es", x, 1e-3)
    _check_encoder(model, variables, refs["Et"], "Et", x, 1e-3)


def test_import_taxibj_vgg32_family(tmp_path):
    cfg = ExperimentConfig(data="taxibj", architecture="vgg", mixing="concat",
                           code_size_s=10, code_size_t=6, enc_hidden_size=8,
                           dec_hidden_size=8, res_hidden_size=16, n_blocks=1,
                           nt_cond=2, nt_pred=2, offset=2, precision="f32")
    ref_dir, refs = _build_reference_xp(tmp_path, cfg)
    model, variables, cfg, logs = _import_and_load(tmp_path, ref_dir)
    rng = np.random.default_rng(4)
    x = rng.random((2, 2, 32, 32, 2)).astype(np.float32)
    _check_encoder(model, variables, refs["Et"], "Et", x, 5e-4)
    z1 = rng.random((2, 10)).astype(np.float32)
    z2 = rng.random((2, 6)).astype(np.float32)
    dec = model.decoder.clone(name=None)
    ours = np.asarray(dec.apply(_sub_vars(variables, "decoder"),
                                jnp.asarray(z1), jnp.asarray(z2), train=False))
    with torch.no_grad():
        theirs = refs["decoder"](_t(z1), _t(z2)).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), theirs, atol=5e-4)


def test_import_sst_family(tmp_path):
    # EncoderSST + DecoderSST_Skip + ConvResnet (spatial codes).
    cfg = ExperimentConfig(data="sst", architecture="encoderSST",
                           decoder_architecture="decoderSST", mixing="concat",
                           code_size_s=6, code_size_t=4, res_hidden_size=8,
                           n_blocks=2, nt_cond=2, nt_pred=2, offset=0,
                           skipco=True, precision="f32")
    ref_dir, refs = _build_reference_xp(tmp_path, cfg)
    model, variables, cfg, logs = _import_and_load(tmp_path, ref_dir)
    rng = np.random.default_rng(5)
    x = rng.random((1, 2, 64, 64, 1)).astype(np.float32)
    _check_encoder(model, variables, refs["Et"], "Et", x, 1e-3)
    _check_integrator(model, variables, refs["t_resnet"],
                      rng.random((1, 16, 16, 4)).astype(np.float32), 1e-3,
                      spatial=True)
    s_code = rng.random((1, 16, 16, 6)).astype(np.float32)
    t_code = rng.random((1, 16, 16, 4)).astype(np.float32)
    skips = [rng.random((1, h, w, c)).astype(np.float32) * 0.5
             for (h, w, c) in [(16, 16, 256), (32, 32, 128), (64, 64, 64)]]
    dec = model.decoder.clone(name=None)
    ours = np.asarray(dec.apply(_sub_vars(variables, "decoder"),
                                jnp.asarray(s_code), jnp.asarray(t_code),
                                skip=[jnp.asarray(s) for s in skips],
                                train=False))
    with torch.no_grad():
        theirs = refs["decoder"](
            _t(np.transpose(s_code, (0, 3, 1, 2))),
            _t(np.transpose(t_code, (0, 3, 1, 2))),
            skip=[_t(np.transpose(s, (0, 3, 1, 2))) for s in skips]).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), theirs, atol=1e-3)


def test_import_no_s_constant(tmp_path):
    # --no_s: reference pickles a parameterless ConstantS for Es.
    cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                           code_size_s=8, code_size_t=8, enc_hidden_size=24,
                           dec_hidden_size=24, res_hidden_size=16, n_blocks=1,
                           enc_n_layers=2, dec_n_layers=2, nt_cond=3, nt_pred=3,
                           offset=3, no_s=True, precision="f32")
    ref_dir, refs = _build_reference_xp(tmp_path, cfg)
    model, variables, cfg, logs = _import_and_load(tmp_path, ref_dir)
    rng = np.random.default_rng(6)
    x = rng.random((2, 3, 64, 64, 1)).astype(np.float32)
    _check_encoder(model, variables, refs["Et"], "Et", x, 2e-5)
    fc, *_ = model.apply(variables, jnp.asarray(x), 5, train=False,
                         method=model.get_forecast)
    assert np.isfinite(np.asarray(fc)).all()


def test_import_epoch_snapshot_and_missing_file(tmp_path):
    cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                           code_size_s=8, code_size_t=8, enc_hidden_size=24,
                           dec_hidden_size=24, res_hidden_size=16, n_blocks=1,
                           enc_n_layers=2, dec_n_layers=2, nt_cond=3, nt_pred=3,
                           offset=3, precision="f32")
    ref_dir, refs = _build_reference_xp(tmp_path, cfg)
    # epoch-suffixed snapshots (helper.py:23 `append`)
    for key, stem in (("Et", "ov_Et"), ("Es", "ov_Es"),
                      ("decoder", "decoder"), ("t_resnet", "t_resnet")):
        os.rename(str(ref_dir / f"{stem}.pt"), str(ref_dir / f"{stem}_40.pt"))
    with pytest.raises(FileNotFoundError, match="not a reference experiment"):
        import_reference_checkpoint(str(ref_dir), str(tmp_path / "out0"),
                                    reference_root=REFERENCE, log_fn=lambda *_: None)
    out = tmp_path / "out"
    import_reference_checkpoint(str(ref_dir), str(out), epoch=40,
                                reference_root=REFERENCE, log_fn=lambda *_: None)
    assert (out / "checkpoints" / "40").is_dir()
    from spatiotemporal_variable_separation_tpu.checkpoint import load_for_eval

    model, variables, _ = load_for_eval(str(out), name="40")
    rng = np.random.default_rng(7)
    x = rng.random((1, 3, 64, 64, 1)).astype(np.float32)
    _check_encoder(model, variables, refs["Et"], "Et", x, 2e-5)


def test_import_pins_f32_when_reference_params_lack_precision(tmp_path):
    # A real reference params.json has no 'precision' key (var_sep/options.py);
    # the importer must not inherit this framework's bf16 default — the torch
    # modules were trained in f32.
    cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                           code_size_s=8, code_size_t=8, enc_hidden_size=24,
                           dec_hidden_size=24, res_hidden_size=16, n_blocks=1,
                           enc_n_layers=2, dec_n_layers=2, nt_cond=3, nt_pred=3,
                           offset=3, precision="f32")
    ref_dir, refs = _build_reference_xp(tmp_path, cfg)
    params = json.load(open(ref_dir / "params.json"))
    del params["precision"]
    (ref_dir / "params.json").write_text(json.dumps(params))
    model, variables, out_cfg, logs = _import_and_load(tmp_path, ref_dir)
    assert out_cfg.precision == "f32"
    assert any("pinning f32" in l for l in logs)


def test_import_rejects_multichannel_mlp(tmp_path):
    # Torch flattens (C,H,W) channel-major, we flatten (H,W,C): shapes match
    # but inputs would be permuted — must refuse instead of silently importing.
    cfg = ExperimentConfig(data="taxibj", architecture="mlp", mixing="mul",
                           code_size_s=8, code_size_t=8, enc_hidden_size=24,
                           dec_hidden_size=24, res_hidden_size=16, n_blocks=1,
                           enc_n_layers=2, dec_n_layers=2, nt_cond=2, nt_pred=2,
                           offset=2, precision="f32")
    ref_dir = tmp_path / "mlp2c"
    ref_dir.mkdir()
    cfg.validate().save(str(ref_dir / "params.json"))
    with pytest.raises(ValueError, match="channel-major"):
        import_reference_checkpoint(str(ref_dir), str(tmp_path / "out"),
                                    reference_root=REFERENCE,
                                    log_fn=lambda *_: None)


def test_import_cli_entry(tmp_path):
    cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                           code_size_s=8, code_size_t=8, enc_hidden_size=24,
                           dec_hidden_size=24, res_hidden_size=16, n_blocks=1,
                           enc_n_layers=2, dec_n_layers=2, nt_cond=3, nt_pred=3,
                           offset=3, precision="f32")
    ref_dir, _ = _build_reference_xp(tmp_path, cfg)
    from spatiotemporal_variable_separation_tpu.cli import import_torch

    out = tmp_path / "cli_out"
    import_torch.main(["--ref_xp_dir", str(ref_dir), "--xp_dir", str(out),
                       "--reference_path", REFERENCE])
    assert (out / "checkpoints" / "final").is_dir()
    assert json.load(open(out / "params.json"))["data"] == "wave"
