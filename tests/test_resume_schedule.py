"""Resume must not re-base the epoch-granular MultiStepLR schedule.

The schedule divides step by steps_per_epoch (train/step.py:multistep_lr,
reference main.py:146-148); run_training freezes the derived value into
params.json on the first run and resumed runs adopt it, so a changed
dataset size between runs cannot silently shift the milestones."""

import json
import os

import numpy as np

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.data.wave_eq import generate_dataset
from spatiotemporal_variable_separation_tpu.train.loop import run_training


def _cfg(xp_dir, data_dir, **kw):
    base = dict(data="wave", architecture="mlp", mixing="mul",
                code_size_s=8, code_size_t=8, enc_hidden_size=16,
                dec_hidden_size=16, res_hidden_size=16, n_blocks=1,
                nt_cond=3, nt_pred=3, offset=3, precision="f32",
                batch_size=8, epochs=1, seed=0, scheduler=True,
                scheduler_milestones=[2, 4], scheduler_decay=0.5,
                xp_dir=str(xp_dir), data_dir=str(data_dir))
    base.update(kw)
    return ExperimentConfig(**base)


def test_steps_per_epoch_frozen_and_adopted_on_resume(tmp_path):
    data_dir = tmp_path / "data"
    xp_dir = tmp_path / "xp"
    data_dir.mkdir()
    xp_dir.mkdir()
    generate_dataset(str(data_dir), size=5, seq_len=30, batch=5)

    cfg = _cfg(xp_dir, data_dir)
    params = xp_dir / "params.json"
    cfg.save(str(params))  # what cli/main.py does before run_training
    run_training(cfg, log_every=0, log_fn=lambda s: None)

    # first run froze the derived value (4 files x 10 windows / batch 8 = 5)
    saved = json.loads(params.read_text())
    assert saved["steps_per_epoch"] == 5

    # grow the dataset; an un-hardened resume would now derive 10 steps /
    # epoch and halve every epoch milestone in optimizer-step terms.
    generate_dataset(str(data_dir), size=10, seq_len=30, batch=5)
    logs = []
    cfg2 = _cfg(xp_dir, data_dir, epochs=2)
    state = run_training(cfg2, log_every=0, log_fn=logs.append, resume=True)
    assert any("adopting frozen steps_per_epoch=5" in l for l in logs)
    # epoch 2 of 2 runs with the frozen 5 steps: resume at step 5 -> 10.
    assert int(state.step) == 10


def test_explicit_steps_per_epoch_wins_over_frozen(tmp_path):
    data_dir = tmp_path / "data"
    xp_dir = tmp_path / "xp"
    data_dir.mkdir()
    xp_dir.mkdir()
    generate_dataset(str(data_dir), size=5, seq_len=30, batch=5)

    cfg = _cfg(xp_dir, data_dir, steps_per_epoch=3)
    cfg.save(str(xp_dir / "params.json"))
    run_training(cfg, log_every=0, log_fn=lambda s: None)

    logs = []
    cfg2 = _cfg(xp_dir, data_dir, epochs=2, steps_per_epoch=3)
    state = run_training(cfg2, log_every=0, log_fn=logs.append, resume=True)
    assert not any("adopting" in l for l in logs)
    assert int(state.step) == 6

def test_generate_batch_stream_replays_per_epoch():
    """generate_batch datasets are re-seeded per (seed, epoch) by
    epoch_iterator, so a mid-epoch resume's skip-replay trains on the
    exact pre-interrupt batches on this path too (round-3 advisor note:
    previously only the map-style Batcher path had this guarantee)."""
    from spatiotemporal_variable_separation_tpu.data.moving_mnist import (
        MovingMNIST,
        synthetic_digits,
    )
    from spatiotemporal_variable_separation_tpu.data.registry import epoch_iterator

    cfg = ExperimentConfig(
        data="mnist", architecture="dcgan", code_size_s=8, code_size_t=8,
        enc_hidden_size=8, dec_hidden_size=8, res_hidden_size=8, n_blocks=1,
        nt_cond=2, nt_pred=2, offset=0, batch_size=4, seed=3,
        steps_per_epoch=3, num_workers=0)
    ds = MovingMNIST(synthetic_digits(16), 64, 2, 4, 4, True, 2, train=True,
                     seed=cfg.seed)
    first = [c.copy() for c, _ in epoch_iterator(cfg, ds, epoch=1)]
    ds.generate_batch(4)  # perturb the stream state, as an interrupt would
    replay = [c.copy() for c, _ in epoch_iterator(cfg, ds, epoch=1)]
    other = [c.copy() for c, _ in epoch_iterator(cfg, ds, epoch=2)]
    assert all(np.array_equal(a, b) for a, b in zip(first, replay))
    assert not np.array_equal(first[0], other[0])
