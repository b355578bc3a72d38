"""Preemption safety: SIGTERM mid-training must still write the 'final'
checkpoint and leave the run resumable (TPU pools send SIGTERM before
reclaiming a VM; the reference loses everything on preemption)."""

import os
import signal
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import os, sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.data.wave_eq import generate_dataset
from spatiotemporal_variable_separation_tpu.train.loop import run_training

data_dir, xp_dir = sys.argv[1], sys.argv[2]
generate_dataset(data_dir, size=5, seq_len=30, batch=5)
cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                       code_size_s=8, code_size_t=8, enc_hidden_size=16,
                       dec_hidden_size=16, res_hidden_size=16, n_blocks=1,
                       nt_cond=3, nt_pred=3, offset=3, precision="f32",
                       batch_size=8, epochs=100000, steps_per_epoch=5,
                       seed=0, xp_dir=xp_dir, data_dir=data_dir)


def log(msg):
    print(msg, flush=True)
    if "epoch 2 done" in msg:
        # signal readiness; the parent SIGTERMs us after seeing this
        print("READY_FOR_SIGTERM", flush=True)


run_training(cfg, log_every=0, log_fn=log)
print("EXITED_CLEANLY", flush=True)
"""


@pytest.mark.slow
def test_sigterm_saves_final_checkpoint(tmp_path):
    script = tmp_path / "train.py"
    script.write_text(SCRIPT)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, str(script), str(tmp_path / "data"), str(tmp_path / "xp")],
        stdout=subprocess.PIPE, text=True, env=env, cwd=str(tmp_path))
    saw_ready = False
    lines = []
    try:
        for line in proc.stdout:
            lines.append(line)
            if "READY_FOR_SIGTERM" in line:
                saw_ready = True
                proc.send_signal(signal.SIGTERM)
                break
        assert saw_ready, "".join(lines)
        proc.wait(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
    out = "".join(lines) + proc.stdout.read()
    assert proc.returncode == 0, out
    assert "interrupted" in out and "EXITED_CLEANLY" in out
    assert os.path.isdir(tmp_path / "xp" / "checkpoints" / "final"), out
