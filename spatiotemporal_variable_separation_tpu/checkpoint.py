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
    """Save the full train state under ``checkpoints/<name or step>/``."""
    name = name if name is not None else str(int(state.step))
    path = os.path.join(_ckpt_dir(xp_dir), name)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def list_checkpoints(xp_dir: str):
    d = _ckpt_dir(xp_dir)
    if not os.path.isdir(d):
        return []
    return sorted(os.listdir(d))


def restore_checkpoint(xp_dir: str, state_template: TrainState,
                       name: Optional[str] = None) -> TrainState:
    """Restore a TrainState; ``name`` defaults to the latest numeric step or
    ``final``."""
    names = list_checkpoints(xp_dir)
    if name is None:
        # "final" is written on every clean or interrupted exit, so when it
        # exists it is at least as new as any periodic (epoch-named) save.
        if "final" in names:
            name = "final"
        else:
            numeric = sorted((int(n) for n in names if n.isdigit()))
            if not numeric:
                raise FileNotFoundError(f"no checkpoints under {xp_dir!r}")
            name = str(numeric[-1])
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
