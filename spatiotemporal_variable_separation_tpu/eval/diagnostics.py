"""Rollout-stability diagnostics: integrator gain, code norms, BN health.

Motivation (measured, BASELINE.md "bf16 destabilizes the MNIST recipe"):
nothing in the reference's 4-term objective (``var_sep/train.py:91-163``)
constrains pre-BatchNorm scale, so a training run can look healthy on its
train-mode losses while the latent rollout diverges and eval-mode BN
collapses — the first visible symptom is eval MSE drifting *up* epoch
over epoch.  The quantities that detected and explained that failure are
packaged here as a reusable probe over any checkpoint:

* **integrator gain** — per-step growth factor of ``||T_t||`` under the
  learned residual integrator (``resnet.py:27-29``'s ``x + MLP(x)``); a
  geometric-mean gain persistently > 1 compounds exponentially over the
  95-frame eval horizons.
* **code norms** — mean ``|S|`` and ``||T_0||``; the runaway manifests as
  ``|S|`` growing past O(100) while train losses keep improving.
* **BatchNorm health** — extrema of the running statistics per
  collection; a running variance of 1e29 means eval mode is dead even
  though train mode (batch statistics) still decodes perfectly.

The probe is forward-only, jitted once, and cheap (one conditioning
batch), so it can run per-checkpoint during training or from the CLI
(``python -m spatiotemporal_variable_separation_tpu.cli.diagnose``).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


def _norms(x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample L2 norm over all non-batch axes; x: (B, ...) -> (B,)."""
    return jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)),
                            axis=tuple(range(1, x.ndim))))


def make_rollout_probe(model, n_steps: int):
    """Build the jitted latent-path probe once (see :func:`rollout_probe`).

    Returns ``probe(variables, cond) -> dict`` of device arrays; callers
    that probe repeatedly (the training loop's ``--monitor_stability``)
    must reuse this function so each checkpoint probe is a cache hit, not
    a recompile (remote compiles cost minutes on the tunneled platform)."""

    @jax.jit
    def probe(variables, cond):
        s_full = model.apply(variables, cond, method=model.encode_s)
        s_code = s_full[0] if isinstance(s_full, tuple) else s_full
        t0 = model.apply(variables, cond, method=model.encode_t)
        t_codes, _ = model.apply(variables, t0, n_steps + 1, False,
                                 method=model._integrate)
        # t_codes: (n_steps+1, B, ...)
        norms = jax.vmap(_norms)(t_codes)            # (n+1, B)
        mean_norms = norms.mean(axis=1)
        gains = mean_norms[1:] / jnp.maximum(mean_norms[:-1], 1e-30)
        return {
            "t_norms": mean_norms,
            "gains": gains,
            "s_mean_abs": jnp.mean(jnp.abs(s_code.astype(jnp.float32))),
            "s_norm": jnp.mean(_norms(s_code)),
            "t0_norm": mean_norms[0],
        }

    return probe


def finalize_probe(raw: Dict[str, Any]) -> Dict[str, Any]:
    """Fetch a probe's device outputs and derive the scalar gain summary."""
    out = dict(jax.device_get(raw))
    gains = np.asarray(out["gains"], np.float64)
    out["gain_geomean"] = float(np.exp(np.mean(np.log(np.maximum(gains, 1e-30)))))
    out["gain_final"] = float(gains[-1]) if gains.size else 1.0
    return out


def rollout_probe(model, variables: dict, cond: np.ndarray,
                  n_steps: int) -> Dict[str, Any]:
    """Roll the integrator ``n_steps`` ahead of a conditioning batch and
    measure gain/norm trajectories (no decoding — probe the latent path).

    Returns per-step T-code norms (n_steps+1,), per-step gains (n_steps,),
    their geometric mean, and S statistics."""
    probe = make_rollout_probe(model, n_steps)
    return finalize_probe(probe(variables, jnp.asarray(cond)))


def bn_health(variables: dict) -> Dict[str, Any]:
    """Extrema of BatchNorm running statistics, flat-keyed by module path.

    An eval-only probe: huge ``var`` (or drifting ``|mean|``) in any layer
    means eval-mode decoding no longer matches train-mode behavior."""
    stats = variables.get("batch_stats")
    report: Dict[str, Any] = {"layers": {}, "max_var": 0.0, "max_abs_mean": 0.0,
                              "n_layers": 0}
    if not stats:
        return report
    flat = jax.tree_util.tree_flatten_with_path(stats)[0]
    for path, leaf in flat:
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        leaf = np.asarray(leaf, np.float64)
        entry = report["layers"].setdefault(key.rsplit("/", 1)[0], {})
        if key.endswith("var"):
            entry["max_var"] = float(leaf.max())
            report["max_var"] = max(report["max_var"], entry["max_var"])
        elif key.endswith("mean"):
            entry["max_abs_mean"] = float(np.abs(leaf).max())
            report["max_abs_mean"] = max(report["max_abs_mean"],
                                         entry["max_abs_mean"])
    report["n_layers"] = len(report["layers"])
    return report


def diagnose(model, variables: dict, cond: np.ndarray, n_steps: int,
             horizon: Optional[int] = None, probe=None,
             synthetic_cond: bool = False) -> Dict[str, Any]:
    """Full stability report for one checkpoint.

    ``horizon``: if given, additionally extrapolate the compounded gain to
    that rollout length (the eval protocols run 40-95 steps).
    ``probe``: a prebuilt :func:`make_rollout_probe` — pass it when
    diagnosing many checkpoints so each call is a jit cache hit instead of
    a fresh (minutes-long, on the tunneled platform) compile.
    ``synthetic_cond``: set when ``cond`` is noise rather than real data;
    the |S|-scale term is then excluded from the verdict (code scales on
    out-of-distribution input are indicative only)."""
    if probe is None:
        probe = make_rollout_probe(model, n_steps)
    rep = finalize_probe(probe(variables, jnp.asarray(cond)))
    rep["bn"] = bn_health(variables)
    g = rep["gain_geomean"]
    rep["horizon"] = horizon
    if horizon:
        rep["projected_growth_at_horizon"] = projected_growth(g, horizon)
    unstable = is_unstable(g, rep["bn"]["max_var"],
                           None if synthetic_cond
                           else float(rep["s_mean_abs"]),
                           horizon=horizon)
    rep["verdict"] = "UNSTABLE" if unstable else "ok"
    return rep


# Longest published eval-protocol rollout per dataset (reference test
# scripts / paper protocols): the horizon over which a per-step gain
# actually compounds.  mnist: t+95 (``var_sep/test/mnist/test.py``,
# README.md:112-116); wave: t+40 (``test/wave/test.py:74-82``); sst: t+10
# (``test/sst/test.py``); taxibj: t+4 (``test/taxibj/test.py:71-79``).
# chairs' horizon is a free flag in the reference — fall back to the
# training nt_pred.
PROTOCOL_HORIZONS = {"mnist": 95, "wave": 40, "wave_partial": 40,
                     "sst": 10, "taxibj": 4}

#: projected ||T|| growth over the protocol horizon above which the
#: rollout is compounding toward collapse.  Calibrated on the BASELINE.md
#: runaway study: healthy converged MNIST probes sit at gain 1.01-1.03
#: (growth 2.6-17 over 95 steps), the first visibly-bad bf16 checkpoint
#: at 1.43 (growth ~5e14); 1e3 splits the two regimes with an order of
#: magnitude to spare on each side.
GROWTH_LIMIT = 1e3


def protocol_horizon(data: str, nt_pred: Optional[int] = None) -> int:
    """Eval-protocol rollout length for a dataset (fallback: training
    ``nt_pred``, floored at 10)."""
    return PROTOCOL_HORIZONS.get(data, max(nt_pred or 0, 10))


def projected_growth(gain: float, horizon: int) -> float:
    """``gain ** horizon`` saturating to inf instead of raising.

    Python float exponentiation raises OverflowError (not inf) precisely
    on wildly divergent probes — the case the report exists to flag."""
    if gain <= 0:
        return 0.0
    log_g = horizon * math.log(gain)
    return math.inf if log_g > 700.0 else math.exp(log_g)


def is_unstable(gain_geomean: float, bn_max_var: float,
                s_mean_abs: Optional[float] = None,
                horizon: Optional[int] = None) -> bool:
    """Triage predicate with the measured thresholds from BASELINE.md's
    runaway investigation (gain 1.43 at the first bad checkpoint, BN var
    2.9e29 at collapse, |S| ~500 at the bf16-quantization knee).  Single
    source of truth for both the diagnose CLI and the in-training
    ``--monitor_stability`` hook.

    With ``horizon`` the gain criterion is horizon-aware: what matters is
    the *compounded* growth over the protocol's rollout length, not the
    raw per-step gain — a healthy TaxiBJ model probes at gain ~1.28, which
    over its 4-step protocol is a benign 2.7x but would trip a fixed
    per-step threshold tuned for MNIST's 95-step horizon.  Without
    ``horizon`` the legacy fixed threshold (1.15/step) applies.

    Pass ``s_mean_abs=None`` when S was measured on synthetic (noise)
    conditioning — that threshold was calibrated on real-data probes and
    does not transfer."""
    if horizon is not None:
        # log space: gain**horizon overflows Python floats (OverflowError,
        # not inf) exactly when the model is wildly divergent.
        gain_bad = (gain_geomean > 0
                    and horizon * math.log(gain_geomean) > math.log(GROWTH_LIMIT))
    else:
        gain_bad = gain_geomean > 1.15
    return (gain_bad or bn_max_var > 1e6
            or (s_mean_abs is not None and s_mean_abs > 500))


def format_report(rep: Dict[str, Any]) -> str:
    lines = [
        f"integrator gain/step (geomean over {len(rep['gains'])} steps): "
        f"{rep['gain_geomean']:.4f}  (final step: {rep['gain_final']:.4f})",
        f"T-code norm: t0 {float(rep['t0_norm']):.4g} -> "
        f"t{len(rep['gains'])} {float(rep['t_norms'][-1]):.4g}",
        f"S code: mean|S| {float(rep['s_mean_abs']):.4g}, "
        f"mean ||S|| {float(rep['s_norm']):.4g}",
        f"BatchNorm ({rep['bn']['n_layers']} layers): max running var "
        f"{rep['bn']['max_var']:.4g}, max |running mean| "
        f"{rep['bn']['max_abs_mean']:.4g}",
    ]
    if rep.get("horizon"):
        lines.append(f"projected T growth over {rep['horizon']}-step horizon: "
                     f"{rep['projected_growth_at_horizon']:.4g}x")
    lines.append(f"verdict: {rep['verdict']}")
    return "\n".join(lines)
