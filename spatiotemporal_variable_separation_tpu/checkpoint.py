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

import json
import os
import shutil
import time
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp
from flax import core

from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.models.factory import build_separable_network
from spatiotemporal_variable_separation_tpu.train.state import TrainState


def _ckpt_dir(xp_dir: str) -> str:
    return os.path.join(os.path.abspath(xp_dir), "checkpoints")


_META = "_varsep_meta.json"
# Leftover dot-dirs younger than this may belong to a live writer mid-swap;
# the repair sweep leaves them alone.
_REPAIR_MIN_AGE_S = 120.0


def _write_meta(path: str, step: int) -> None:
    with open(os.path.join(path, _META), "w") as f:
        json.dump({"step": int(step), "saved_at": time.time()}, f)


def _read_meta_step(path: str) -> Optional[int]:
    try:
        with open(os.path.join(path, _META)) as f:
            return int(json.load(f)["step"])
    except (OSError, ValueError, KeyError):
        return None


def _repair_leftovers(base: str) -> None:
    """Recover/clean crash leftovers from interrupted saves (any pid).

    ``.tmp.<name>.<pid>`` with the meta marker is a COMPLETE save whose
    commit renames never ran; adopt it if ``<name>`` is missing.  A
    ``.old.<name>.<pid>`` is the previous good save retired right before
    the swap-in; restore it if ``<name>`` is missing (kill landed between
    the two renames).  Everything else — markerless staging, shadowed
    retirees — is deleted so kill-escalation cycles cannot accumulate
    full-size hidden checkpoints.  Entries younger than
    ``_REPAIR_MIN_AGE_S`` are skipped: they may belong to a live writer.
    """
    if not os.path.isdir(base):
        return
    now = time.time()
    entries = [n for n in os.listdir(base) if n.startswith((".tmp.", ".old."))]
    # .tmp (newer, complete iff marked) before .old (previous good save).
    for n in sorted(entries, key=lambda n: not n.startswith(".tmp.")):
        p = os.path.join(base, n)
        try:
            if now - os.path.getmtime(p) < _REPAIR_MIN_AGE_S:
                continue
            name = n.split(".", 3)[2]  # ".tmp.<name>.<pid>"
            target = os.path.join(base, name)
            complete = (n.startswith(".old.")
                        or _read_meta_step(p) is not None)
            if complete and not os.path.isdir(target):
                os.rename(p, target)
            else:
                shutil.rmtree(p)
        except OSError:
            continue  # racing writer or vanished entry — leave it


def save_checkpoint(xp_dir: str, state: TrainState, name: Optional[str] = None) -> str:
    """Save the full train state under ``checkpoints/<name or step>/``.

    Atomic with respect to the previous checkpoint of the same name: the
    state is fully written to a dot-prefixed staging dir first and only
    then swapped in.  ``ocp.save(path, force=True)`` deletes the existing
    ``path`` *before* the (tunnel-slow) write starts, so a kill landing
    mid-save would destroy the last good save together with the new one —
    observed when a supervisor kill-escalation interrupted a final save.
    A meta marker written after the Orbax save records the step (used for
    newest-checkpoint selection) and proves the staging dir is complete;
    ``_repair_leftovers`` adopts or removes crash leftovers from any pid.
    """
    name = name if name is not None else str(int(state.step))
    base = _ckpt_dir(xp_dir)
    path = os.path.join(base, name)
    staging = os.path.join(base, f".tmp.{name}.{os.getpid()}")
    retired = os.path.join(base, f".old.{name}.{os.getpid()}")
    _repair_leftovers(base)
    for leftover in (staging, retired):
        if os.path.isdir(leftover):
            shutil.rmtree(leftover)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(staging, jax.device_get(state), force=True)
    _write_meta(staging, int(state.step))
    # Commit: retire the old dir, move the staging dir in, drop the retiree.
    # The exposed window is now two renames instead of the whole write, and
    # a kill inside it is recoverable: the marked .tmp (or the .old) is
    # adopted by the next _repair_leftovers sweep.
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
    # leftovers at worst) — never valid checkpoints.  Recover/clean any
    # that are old enough to be certainly dead.
    if any(n.startswith(".") for n in os.listdir(d)):
        _repair_leftovers(d)
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
        # segment next to newer periodic (epoch-named) saves.  Recency is
        # the step recorded in each checkpoint's meta marker; dir mtime is
        # only the fallback for pre-marker checkpoints (mtime alone breaks
        # when an xp_dir is copied without ``cp -p``: copy order becomes
        # the ordering).
        candidates = [n for n in names if n == "final" or n.isdigit()]
        if not candidates:
            raise FileNotFoundError(f"no checkpoints under {xp_dir!r}")

        def _recency(n: str):
            p = os.path.join(_ckpt_dir(xp_dir), n)
            step = _read_meta_step(p)
            if step is not None:
                return (1, step, 0.0)
            try:
                return (0, 0, os.path.getmtime(p))
            except OSError:
                return (0, 0, 0.0)

        # ties (same step / same mtime second) resolve to "final", then
        # highest epoch name.
        name = max(candidates,
                   key=lambda n: (_recency(n), n == "final",
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
