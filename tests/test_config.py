"""Config validation tests mirroring the reference's factory/main/train
asserts (SURVEY.md §4)."""

import json

import pytest

from spatiotemporal_variable_separation_tpu.core.config import ConfigError, ExperimentConfig


def test_default_config_valid():
    ExperimentConfig().validate()


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(data="taxibj", architecture="dcgan"),  # factory.py:29
        dict(data="taxibj", decoder_architecture="dcgan", architecture="vgg"),
        dict(mixing="mul", code_size_s=10, code_size_t=20),  # factory.py:51-53
        dict(offset=3, nt_cond=5),  # train.py:103
        dict(data="wave_partial", architecture="vgg"),  # main.py:98
        dict(data="wave_partial", architecture="dcgan"),
        dict(no_s=True, skipco=True),  # main.py:124
        dict(architecture="resnet", skipco=True, decoder_architecture=None),
        dict(architecture="encoderSST", mixing="mul"),
        dict(architecture="encoderSST", decoder_architecture="dcgan"),
        dict(data="nope"),
        dict(mixing="bad"),
        dict(precision="fp64"),
    ],
)
def test_invalid_configs_raise(kwargs):
    with pytest.raises(ConfigError):
        ExperimentConfig(**kwargs).validate()


def test_no_s_normalization():
    # main.py:119-127: no_s forces code_size_s = code_size_t and mul mixing.
    cfg = ExperimentConfig(no_s=True, code_size_s=128, code_size_t=20,
                           mixing="concat").validate()
    assert cfg.code_size_s == 20 and cfg.mixing == "mul"
    assert cfg.effective_lamb_t == 0.0  # train.py:99-101


def test_last_activation_per_dataset():
    # main.py:70-102
    assert ExperimentConfig(data="mnist").last_activation == "sigmoid"
    assert ExperimentConfig(data="wave", architecture="mlp").last_activation == "sigmoid"
    assert ExperimentConfig(data="taxibj", architecture="vgg").last_activation is None
    assert ExperimentConfig(data="sst", architecture="encoderSST",
                            decoder_architecture="decoderSST").last_activation is None


def test_json_roundtrip(tmp_path):
    cfg = ExperimentConfig(data="wave", architecture="mlp", code_size_s=32,
                           code_size_t=32, mixing="mul")
    p = tmp_path / "params.json"
    cfg.save(str(p))
    cfg2 = ExperimentConfig.from_json_file(str(p))
    assert cfg2 == cfg


def test_reference_params_json_compat(tmp_path):
    """A reference-style params.json (with torch-only keys) loads cleanly."""
    ref = {
        "apex_amp": False, "torch_amp": True, "device": 0, "num_workers": 4,
        "data": "mnist", "architecture": "dcgan", "nt_cond": 5, "nt_pred": 10,
        "code_size_s": 128, "code_size_t": 20, "offset": 5, "xp_dir": "/xp",
        "data_dir": "/data", "lamb_ae": 10, "lamb_s": 45, "lamb_t": 1e-3,
        "lamb_pred": 45, "batch_size": 128, "lr": 4e-4, "beta1": 0.9,
        "beta2": 0.99, "epochs": 200, "scheduler": False, "chkpt_interval": None,
    }
    p = tmp_path / "params.json"
    p.write_text(json.dumps(ref))
    cfg = ExperimentConfig.from_json_file(str(p)).validate()
    assert cfg.architecture == "dcgan" and cfg.nt_pred == 10


def test_frame_shapes():
    assert ExperimentConfig(data="mnist").frame_shape == (64, 64, 1)
    assert ExperimentConfig(data="chairs").frame_shape == (64, 64, 3)
    assert ExperimentConfig(data="taxibj", architecture="vgg").frame_shape == (32, 32, 2)
    assert ExperimentConfig(data="wave_partial", architecture="mlp",
                            n_wave_points=100).frame_shape == (100, 1)
