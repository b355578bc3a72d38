"""Resume must be OUTCOME-invariant, not just schedule-invariant.

Extends test_resume_schedule / test_preemption: a training run interrupted
mid-epoch at an arbitrary step and resumed must reproduce the loss
trajectory and the final state of an uninterrupted run bit-for-bit.
This holds because every source of per-step randomness is keyed on the
step counter carried in the checkpoint (train/step.py folds state.rng with
state.step; the device data generator likewise), so no training state
lives outside the checkpoint.  The reference cannot make this promise at
all — it has no optimizer-state checkpointing and no resume
(var_sep/utils/helper.py:22-33 stores eval-only module pickles).
"""

import csv
import os

import jax
import numpy as np
import pytest

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.data.wave_eq import generate_dataset
from spatiotemporal_variable_separation_tpu.train.loop import run_training


def _cfg(xp_dir, data_dir, **kw):
    base = dict(data="wave", architecture="mlp", mixing="mul",
                code_size_s=8, code_size_t=8, enc_hidden_size=16,
                dec_hidden_size=16, res_hidden_size=16, n_blocks=1,
                nt_cond=3, nt_pred=3, offset=3, precision="f32",
                batch_size=8, epochs=4, seed=0, scheduler=True,
                scheduler_milestones=[2], scheduler_decay=0.5,
                xp_dir=str(xp_dir), data_dir=str(data_dir))
    base.update(kw)
    return ExperimentConfig(**base)


def _loss_by_step(xp_dir):
    out = {}
    with open(os.path.join(xp_dir, "metrics.csv")) as f:
        for row in csv.DictReader(f):
            out[int(row["step"])] = row["loss"]  # exact string: bitwise test
    return out


def test_interrupted_resume_matches_uninterrupted_run(tmp_path):
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    generate_dataset(str(data_dir), size=5, seq_len=30, batch=5)

    # --- run A: uninterrupted, 4 epochs x 5 steps ---------------------
    xp_a = tmp_path / "xp_a"
    xp_a.mkdir()
    cfg_a = _cfg(xp_a, data_dir)
    cfg_a.save(str(xp_a / "params.json"))
    state_a = run_training(cfg_a, log_every=1, log_fn=lambda s: None)
    assert int(state_a.step) == 20

    # --- run B: interrupted mid-epoch, then resumed -------------------
    xp_b = tmp_path / "xp_b"
    xp_b.mkdir()
    cfg_b = _cfg(xp_b, data_dir)
    cfg_b.save(str(xp_b / "params.json"))

    class _Interrupt(KeyboardInterrupt):
        pass

    def killer(msg):
        # per-step loss lines are lagged by one boundary; raising on the
        # "step 7" line lands the interrupt mid-epoch 1 (of 0..3), between
        # steps — exactly where a SIGTERM's cooperative stop raises.
        if "step 7:" in msg:
            raise _Interrupt

    state_b1 = run_training(cfg_b, log_every=1, log_fn=killer)
    assert 0 < int(state_b1.step) < 20  # genuinely mid-run
    interrupt_step = int(state_b1.step)
    assert interrupt_step % 5 != 0, "interrupt landed on an epoch boundary"

    logs = []
    state_b = run_training(_cfg(xp_b, data_dir), log_every=1,
                           log_fn=logs.append, resume=True)
    assert any(f"resumed from step {interrupt_step}" in l for l in logs)
    assert int(state_b.step) == 20

    # --- bit-for-bit equality of the final state ----------------------
    for leaf_a, leaf_b in zip(jax.tree_util.tree_leaves(state_a.params),
                              jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))
    for leaf_a, leaf_b in zip(jax.tree_util.tree_leaves(state_a.opt_state),
                              jax.tree_util.tree_leaves(state_b.opt_state)):
        np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))

    # --- bit-for-bit equality of the loss trajectory -------------------
    # (exact decimal strings from metrics.csv; covers pre- and
    # post-interrupt steps, so the restored state reproduced the stream)
    loss_a, loss_b = _loss_by_step(str(xp_a)), _loss_by_step(str(xp_b))
    # the interrupt unwinds through the lagged log boundary, so B may lose
    # the (at most two) rows in flight at the interrupt itself — bounded
    # logging loss, not state divergence (params above are bit-identical).
    missing = set(loss_a) - set(loss_b)
    assert missing <= {interrupt_step - 1, interrupt_step}, (
        f"rows missing beyond the interrupt boundary: {sorted(missing)}")
    assert set(loss_b) <= set(loss_a)
    mismatched = {s for s in loss_b if loss_a[s] != loss_b[s]}
    assert not mismatched, f"loss trajectory diverged at steps {sorted(mismatched)}"
