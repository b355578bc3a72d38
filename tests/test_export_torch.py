"""Native-checkpoint exporter: the reverse migration path.

A briefly-trained native experiment dir (Adam-perturbed weights +
non-trivial BN running stats) is exported to the reference's torch layout
(``utils.export``), then (a) the reference's OWN ``SeparableNetwork``
(``var_sep/networks/model.py:20-89``) must reproduce this framework's
eval-mode rollout from the pickled modules, and (b) importing the
exported dir back through ``utils.transplant`` must be the identity —
float32 layout transforms are pure permutations, so equality is exact."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.checkpoint import (
    load_for_eval,
    save_checkpoint,
)
from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.models.factory import build_separable_network
from spatiotemporal_variable_separation_tpu.train.state import create_train_state
from spatiotemporal_variable_separation_tpu.train.step import make_optimizer, make_train_step
from spatiotemporal_variable_separation_tpu.utils.export import (
    export_reference_checkpoint,
)
from spatiotemporal_variable_separation_tpu.utils.transplant import (
    import_reference_checkpoint,
)

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference not mounted")

torch = pytest.importorskip("torch")


def _ref_model_cls():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.datasets = types.SimpleNamespace(MNIST=None)
        sys.modules["torchvision"] = tv
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from var_sep.networks.model import SeparableNetwork

    return SeparableNetwork


def _make_native_xp(tmp_path, cfg, n_steps=2, seed=0):
    """Train ``n_steps`` on random data and save a native experiment dir."""
    cfg = cfg.validate()
    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, 10)
    state = create_train_state(model, cfg, tx)
    step = make_train_step(model, cfg, tx)
    rng = np.random.default_rng(seed)
    nt = cfg.nt_cond + cfg.nt_pred
    seq = rng.random((cfg.batch_size, nt) + cfg.frame_shape).astype(np.float32)
    for _ in range(n_steps):
        state, _ = step(state, jnp.asarray(seq[:, :cfg.nt_cond]),
                        jnp.asarray(seq[:, cfg.nt_cond:]))
    xp_dir = tmp_path / "native_xp"
    xp_dir.mkdir()
    cfg.save(str(xp_dir / "params.json"))
    save_checkpoint(str(xp_dir), jax.device_get(state), name="final")
    return str(xp_dir), model, state, cfg


def _torch_forecast(ref_dir, cond_np, n_forecast, cfg):
    """Rollout through the reference's SeparableNetwork on the exported
    pickles, exactly as its eval scripts do (``test/utils.py:8-16``)."""
    SeparableNetwork = _ref_model_cls()
    mods = {stem: torch.load(os.path.join(ref_dir, f"{stem}.pt"),
                             map_location="cpu", weights_only=False)
            for stem in ("ov_Es", "ov_Et", "t_resnet", "decoder")}
    sep = SeparableNetwork(mods["ov_Es"], mods["ov_Et"], mods["t_resnet"],
                           mods["decoder"], cfg.nt_cond, cfg.skipco)
    sep.eval()
    cond_t = torch.tensor(np.transpose(cond_np, (0, 1, 4, 2, 3)).copy())
    with torch.no_grad():
        forecasts, *_ = sep.get_forecast(cond_t, n_forecast)
    return np.moveaxis(forecasts.numpy(), 2, -1)  # (B, n, H, W, C)


def _native_forecast(xp_dir, cond_np, n_forecast):
    model, variables, _ = load_for_eval(xp_dir, name="final")
    fc, *_ = model.apply(variables, jnp.asarray(cond_np), n_forecast,
                         train=False, method=model.get_forecast)
    return np.asarray(fc)


def _assert_reimport_identity(tmp_path, xp_dir, ref_dir, state):
    """import(export(xp)) must reproduce params and BN stats exactly."""
    back_dir = tmp_path / "reimported_xp"
    import_reference_checkpoint(str(ref_dir), str(back_dir),
                                reference_root=REFERENCE,
                                log_fn=lambda *_: None)
    _, variables, _ = load_for_eval(str(back_dir))
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(variables["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    if state.batch_stats:
        for a, b in zip(jax.tree_util.tree_leaves(state.batch_stats),
                        jax.tree_util.tree_leaves(variables["batch_stats"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_wave_mlp_family(tmp_path):
    cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                           code_size_s=8, code_size_t=8, enc_hidden_size=24,
                           dec_hidden_size=24, res_hidden_size=16, n_blocks=2,
                           enc_n_layers=2, dec_n_layers=2, nt_cond=3, nt_pred=3,
                           offset=3, batch_size=4, precision="f32")
    xp_dir, model, state, cfg = _make_native_xp(tmp_path, cfg)
    ref_dir = tmp_path / "ref_xp"
    export_reference_checkpoint(xp_dir, str(ref_dir),
                                reference_root=REFERENCE,
                                log_fn=lambda *_: None)
    for stem in ("ov_Es", "ov_Et", "t_resnet", "decoder"):
        assert (ref_dir / f"{stem}.pt").is_file()
    rng = np.random.default_rng(1)
    cond = rng.random((2, 3, 64, 64, 1)).astype(np.float32)
    ours = _native_forecast(xp_dir, cond, 5)
    theirs = _torch_forecast(str(ref_dir), cond, 5, cfg)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)
    _assert_reimport_identity(tmp_path, xp_dir, ref_dir, state)


def test_export_mnist_dcgan_skipco_family(tmp_path):
    # gain_encoder raised so the 4x4 pre-code maps vary spatially — a wrong
    # inverse flatten permutation in the dense export would go undetected
    # at the near-constant default gain (see test_import_torch).
    cfg = ExperimentConfig(data="mnist", architecture="dcgan", mixing="mul",
                           code_size_s=12, code_size_t=12, enc_hidden_size=8,
                           dec_hidden_size=8, res_hidden_size=16, n_blocks=1,
                           nt_cond=2, nt_pred=2, offset=2, skipco=True,
                           gain_encoder=0.5, batch_size=8, precision="f32")
    xp_dir, model, state, cfg = _make_native_xp(tmp_path, cfg)
    ref_dir = tmp_path / "ref_xp"
    export_reference_checkpoint(xp_dir, str(ref_dir),
                                reference_root=REFERENCE,
                                log_fn=lambda *_: None)
    rng = np.random.default_rng(2)
    cond = rng.random((2, 2, 64, 64, 1)).astype(np.float32)
    ours = _native_forecast(xp_dir, cond, 4)
    theirs = _torch_forecast(str(ref_dir), cond, 4, cfg)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=5e-4)
    _assert_reimport_identity(tmp_path, xp_dir, ref_dir, state)


def test_export_sst_family(tmp_path):
    # EncoderSST + DecoderSST_Skip + ConvResnet: spatial (16,16) codes.
    cfg = ExperimentConfig(data="sst", architecture="encoderSST",
                           decoder_architecture="decoderSST", mixing="concat",
                           code_size_s=6, code_size_t=4, res_hidden_size=8,
                           n_blocks=2, nt_cond=2, nt_pred=2, offset=0,
                           skipco=True, batch_size=4, precision="f32")
    xp_dir, model, state, cfg = _make_native_xp(tmp_path, cfg)
    ref_dir = tmp_path / "ref_xp"
    export_reference_checkpoint(xp_dir, str(ref_dir),
                                reference_root=REFERENCE,
                                log_fn=lambda *_: None)
    rng = np.random.default_rng(3)
    cond = rng.random((2, 2, 64, 64, 1)).astype(np.float32)
    ours = _native_forecast(xp_dir, cond, 4)
    theirs = _torch_forecast(str(ref_dir), cond, 4, cfg)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=5e-4)
    _assert_reimport_identity(tmp_path, xp_dir, ref_dir, state)


def test_export_no_s_constant(tmp_path):
    # --no_s: Es is the parameterless ConstantS on both sides.
    cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                           code_size_s=8, code_size_t=8, enc_hidden_size=16,
                           dec_hidden_size=16, res_hidden_size=16, n_blocks=1,
                           enc_n_layers=2, dec_n_layers=2, nt_cond=3,
                           nt_pred=2, offset=3, no_s=True, batch_size=4,
                           precision="f32")
    xp_dir, model, state, cfg = _make_native_xp(tmp_path, cfg)
    ref_dir = tmp_path / "ref_xp"
    export_reference_checkpoint(xp_dir, str(ref_dir),
                                reference_root=REFERENCE,
                                log_fn=lambda *_: None)
    rng = np.random.default_rng(4)
    cond = rng.random((2, 3, 64, 64, 1)).astype(np.float32)
    ours = _native_forecast(xp_dir, cond, 4)
    theirs = _torch_forecast(str(ref_dir), cond, 4, cfg)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)
    # exercises the `key not in params` branch (parameterless ConstantS)
    # on both the export and the reimport side.
    _assert_reimport_identity(tmp_path, xp_dir, ref_dir, state)


@pytest.mark.parametrize("arch,dec_arch", [
    ("mlp", "mlp"),          # mlp encoder (decoder defaults to encoder arch)
    ("vgg", "mlp"),          # conv encoder, mlp *decoder*: the decoder's
                             # final dense emits channels-last pixel rows
])
def test_export_rejects_multichannel_mlp(tmp_path, arch, dec_arch):
    # taxibj frames have 2 channels: torch's channel-major flatten differs
    # from this framework's channels-last order, so export must refuse
    # (mirrors the import-direction guard).
    cfg = ExperimentConfig(data="taxibj", architecture=arch,
                           decoder_architecture=dec_arch, mixing="mul",
                           code_size_s=8, code_size_t=8, enc_hidden_size=16,
                           dec_hidden_size=16, res_hidden_size=16, n_blocks=1,
                           enc_n_layers=2, dec_n_layers=2, nt_cond=2,
                           nt_pred=2, offset=2, batch_size=4, precision="f32")
    xp_dir, *_ = _make_native_xp(tmp_path, cfg)
    with pytest.raises(ValueError, match="channel-major"):
        export_reference_checkpoint(xp_dir, str(tmp_path / "ref_xp"),
                                    reference_root=REFERENCE,
                                    log_fn=lambda *_: None)


def test_export_cli(tmp_path):
    cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                           code_size_s=8, code_size_t=8, enc_hidden_size=16,
                           dec_hidden_size=16, res_hidden_size=16, n_blocks=1,
                           enc_n_layers=2, dec_n_layers=2, nt_cond=3,
                           nt_pred=2, offset=3, batch_size=4, precision="f32")
    xp_dir, *_ = _make_native_xp(tmp_path, cfg)
    from spatiotemporal_variable_separation_tpu.cli import export_torch as cli

    out = tmp_path / "cli_ref_xp"
    cli.main(["--xp_dir", xp_dir, "--ref_xp_dir", str(out),
              "--reference_path", REFERENCE])
    assert (out / "params.json").is_file()
    assert all((out / f"{s}.pt").is_file()
               for s in ("ov_Es", "ov_Et", "t_resnet", "decoder"))
