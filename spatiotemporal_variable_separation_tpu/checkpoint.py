"""Orbax checkpointing: params + BatchNorm stats + optimizer state + step.

Capability superset of the reference's checkpointing, which pickles whole
torch modules with no optimizer state and no resume
(``var_sep/utils/helper.py:22-33``).  Layout under ``xp_dir``:

    params.json      — the ExperimentConfig (flag-compatible round-trip)
    checkpoints/
        <step>/      — full TrainState (resume-capable)
        final/       — alias written at the end of training

The reference's epoch-suffixed files (``ov_Es_{N}.pt`` ...) map to the
per-step directories; ``load_for_eval`` is the ``load_model`` equivalent
(``test/utils.py:8-16``)."""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp
from flax import core

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.models.factory import build_separable_network
from spatiotemporal_variable_separation_tpu.train.state import TrainState


def _ckpt_dir(xp_dir: str) -> str:
    return os.path.join(os.path.abspath(xp_dir), "checkpoints")


def save_checkpoint(xp_dir: str, state: TrainState, name: Optional[str] = None) -> str:
    """Save the full train state under ``checkpoints/<name or step>/``.

    Atomic with respect to the previous checkpoint of the same name: the
    state is fully written to a dot-prefixed staging dir first and only
    then swapped in.  ``ocp.save(path, force=True)`` deletes the existing
    ``path`` *before* the (tunnel-slow) write starts, so a kill landing
    mid-save would destroy the last good save together with the new one —
    observed when a supervisor kill-escalation interrupted a final save.
    """
    name = name if name is not None else str(int(state.step))
    base = _ckpt_dir(xp_dir)
    path = os.path.join(base, name)
    staging = os.path.join(base, f".tmp.{name}.{os.getpid()}")
    retired = os.path.join(base, f".old.{name}.{os.getpid()}")
    for leftover in (staging, retired):
        if os.path.isdir(leftover):
            shutil.rmtree(leftover)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(staging, jax.device_get(state), force=True)
    # Commit: retire the old dir, move the staging dir in, drop the retiree.
    # The exposed window is now two renames instead of the whole write.
    if os.path.isdir(path):
        os.rename(path, retired)
    os.rename(staging, path)
    if os.path.isdir(retired):
        shutil.rmtree(retired)
    return path


def list_checkpoints(xp_dir: str):
    d = _ckpt_dir(xp_dir)
    if not os.path.isdir(d):
        return []
    # Dot-prefixed entries are save_checkpoint staging/retired dirs (crash
    # leftovers at worst) — never valid checkpoints.
    return sorted(n for n in os.listdir(d) if not n.startswith("."))


def restore_checkpoint(xp_dir: str, state_template: TrainState,
                       name: Optional[str] = None) -> TrainState:
    """Restore a TrainState; ``name`` defaults to the latest numeric step or
    ``final``."""
    names = list_checkpoints(xp_dir)
    if name is None:
        # Prefer the NEWEST checkpoint, not blindly "final": a SIGKILL
        # escalation (or the guarded final-save skip when an interrupt lands
        # inside the donated step, train/loop.py) can end a resumed segment
        # with no final write — leaving a *stale* "final" from the previous
        # segment next to newer periodic (epoch-named) saves.  Recency comes
        # from the checkpoint dir's mtime: save_checkpoint writes into a
        # fresh staging dir and renames it in, so the mtime is the save
        # time regardless of the name it was committed under.
        candidates = [n for n in names if n == "final" or n.isdigit()]
        if not candidates:
            raise FileNotFoundError(f"no checkpoints under {xp_dir!r}")

        def _mtime(n: str) -> float:
            try:
                return os.path.getmtime(os.path.join(_ckpt_dir(xp_dir), n))
            except OSError:
                return 0.0

        # ties (same mtime second) resolve to "final", then highest epoch.
        name = max(candidates,
                   key=lambda n: (_mtime(n), n == "final",
                                  int(n) if n.isdigit() else -1))
    path = os.path.join(_ckpt_dir(xp_dir), name)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, state_template)
    return restored


def load_for_eval(xp_dir: str, name: Optional[str] = None,
                  overrides: Optional[dict] = None) -> Tuple[Any, dict, ExperimentConfig]:
    """Rebuild (model, variables, config) from an experiment directory —
    the ``load_model`` equivalent (``test/utils.py:8-16``).

    ``overrides``: config fields to replace (eval CLIs override nt_pred
    etc., as the reference does)."""
    import dataclasses

    cfg = ExperimentConfig.from_json_file(os.path.join(xp_dir, "params.json"))
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    cfg = cfg.validate()
    model = build_separable_network(cfg)

    # Build an abstract template to restore into.
    import jax.numpy as jnp
    import optax

    from spatiotemporal_variable_separation_tpu.train.state import create_train_state
    from spatiotemporal_variable_separation_tpu.train.step import make_optimizer

    tx = make_optimizer(cfg, steps_per_epoch=max(1, cfg.steps_per_epoch or 1))
    template = jax.eval_shape(lambda: create_train_state(model, cfg, tx))
    state = restore_checkpoint(xp_dir, template, name)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    return model, variables, cfg
