"""run_training integration: device-datagen path (Moving MNIST) and host
path (WaveEq), each a tiny end-to-end run with final checkpoint."""

import os

import numpy as np
import pytest

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.train.loop import run_training


from conftest import write_idx_images as _write_idx_images


def test_run_training_mnist_device_datagen(tmp_path):
    from spatiotemporal_variable_separation_tpu.data.moving_mnist import synthetic_digits

    data_dir = tmp_path / "data"
    xp_dir = tmp_path / "xp"
    data_dir.mkdir()
    xp_dir.mkdir()
    _write_idx_images(data_dir / "train-images-idx3-ubyte", synthetic_digits(32))

    cfg = ExperimentConfig(data="mnist", architecture="dcgan", code_size_s=8,
                           code_size_t=8, enc_hidden_size=4, dec_hidden_size=4,
                           res_hidden_size=8, n_blocks=1, nt_cond=2, nt_pred=2,
                           offset=2, mixing="mul", precision="f32", batch_size=8,
                           epochs=1, steps_per_epoch=3, seed=0,
                           xp_dir=str(xp_dir), data_dir=str(data_dir))
    logs = []
    state = run_training(cfg, log_every=1, log_fn=logs.append)
    assert int(state.step) == 3
    assert os.path.isdir(xp_dir / "checkpoints" / "final")
    assert any("loss" in l for l in logs)


def test_run_training_wave_host_path(tmp_path):
    from spatiotemporal_variable_separation_tpu.data.wave_eq import generate_dataset

    data_dir = tmp_path / "data"
    xp_dir = tmp_path / "xp"
    data_dir.mkdir()
    xp_dir.mkdir()
    generate_dataset(str(data_dir), size=5, seq_len=30, batch=5)

    cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                           code_size_s=8, code_size_t=8, enc_hidden_size=16,
                           dec_hidden_size=16, res_hidden_size=16, n_blocks=1,
                           nt_cond=3, nt_pred=3, offset=3, precision="f32",
                           batch_size=8, epochs=2, seed=0, num_workers=2,
                           xp_dir=str(xp_dir), data_dir=str(data_dir))
    state = run_training(cfg, log_every=0, log_fn=lambda s: None)
    # 4 train files x (15 - 6 + 1) windows = 40 items -> 5 steps/epoch x 2.
    assert int(state.step) == 10
    assert os.path.isdir(xp_dir / "checkpoints" / "final")


def test_run_training_monitor_stability(tmp_path):
    from spatiotemporal_variable_separation_tpu.data.moving_mnist import synthetic_digits

    data_dir = tmp_path / "data"
    xp_dir = tmp_path / "xp"
    data_dir.mkdir()
    xp_dir.mkdir()
    _write_idx_images(data_dir / "train-images-idx3-ubyte", synthetic_digits(32))

    cfg = ExperimentConfig(data="mnist", architecture="dcgan", code_size_s=8,
                           code_size_t=8, enc_hidden_size=4, dec_hidden_size=4,
                           res_hidden_size=8, n_blocks=1, nt_cond=2, nt_pred=2,
                           offset=2, mixing="mul", precision="f32", batch_size=8,
                           epochs=2, steps_per_epoch=2, chkpt_interval=1,
                           seed=0, xp_dir=str(xp_dir), data_dir=str(data_dir))
    logs = []
    run_training(cfg, log_every=0, log_fn=logs.append, monitor_stability=True)
    stab = [l for l in logs if l.startswith("stability @")]
    assert len(stab) == 2, logs  # one per periodic checkpoint
    assert "gain/step" in stab[0] and "BN max var" in stab[0]
    with open(os.path.join(str(xp_dir), "stability.csv")) as f:
        text = f.read()
    assert "stability_gain" in text and len(text.splitlines()) == 3
