"""End-to-end eval CLI tests (flag plumbing on a real xp_dir layout).

The evaluate() functions are covered by test_checkpoint_eval.py; these
exercise the CLI mains against a trained-and-checkpointed experiment
directory — in particular the shared ``--max_batches`` subsampling flag
(pinned-epoch selection on a slow host) and its evals.json provenance
record.
"""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.checkpoint import save_checkpoint
from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.models.factory import (
    build_separable_network,
)
from spatiotemporal_variable_separation_tpu.train.state import create_train_state
from spatiotemporal_variable_separation_tpu.train.step import (
    make_optimizer,
    make_train_step,
)


def _wave_xp(tmp_path):
    from spatiotemporal_variable_separation_tpu.data.wave_eq import (
        generate_dataset,
        generate_pixels,
    )

    data_dir = tmp_path / "data"
    xp_dir = tmp_path / "xp"
    data_dir.mkdir()
    xp_dir.mkdir()
    generate_dataset(str(data_dir), size=5, seq_len=96, batch=5)
    generate_pixels(str(data_dir), number=10)

    cfg = ExperimentConfig(data="wave", architecture="mlp", mixing="mul",
                           code_size_s=16, code_size_t=16, enc_hidden_size=32,
                           dec_hidden_size=32, res_hidden_size=32, n_blocks=1,
                           nt_cond=4, nt_pred=3, offset=4, precision="f32",
                           batch_size=8, xp_dir=str(xp_dir),
                           data_dir=str(data_dir))
    cfg.save(os.path.join(str(xp_dir), "params.json"))
    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, 10)
    state = create_train_state(model, cfg, tx)
    step = make_train_step(model, cfg, tx)
    rng = np.random.default_rng(0)
    seq = rng.random((cfg.batch_size, 7) + cfg.frame_shape).astype(np.float32)
    state, _ = step(state, jnp.asarray(seq[:, :4]), jnp.asarray(seq[:, 4:]))
    save_checkpoint(str(xp_dir), state, name="final")
    return str(xp_dir), str(data_dir)


def test_wave_cli_max_batches_records_provenance(tmp_path):
    from spatiotemporal_variable_separation_tpu.cli import test_wave as cli

    xp_dir, data_dir = _wave_xp(tmp_path)
    cli.main(["--xp_dir", xp_dir, "--data_dir", data_dir,
              "--batch_size", "4", "--max_batches", "1"])
    with open(os.path.join(xp_dir, "evals.json")) as f:
        rec = json.load(f)["wave"]
    assert np.isfinite(rec["mse_t40"])
    assert rec["max_batches"] == 1  # subsampled score is marked as such


def test_wave_cli_full_run_has_no_max_batches_key(tmp_path):
    from spatiotemporal_variable_separation_tpu.cli import test_wave as cli

    xp_dir, data_dir = _wave_xp(tmp_path)
    cli.main(["--xp_dir", xp_dir, "--data_dir", data_dir,
              "--batch_size", "8"])
    with open(os.path.join(xp_dir, "evals.json")) as f:
        rec = json.load(f)["wave"]
    assert np.isfinite(rec["mse_t40"])
    assert "max_batches" not in rec  # protocol records stay clean
