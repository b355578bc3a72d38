"""Run summary: compact learning-curve digest of a training directory.

The reference has no training observability at all (a tqdm bar only,
``var_sep/train.py:106``); this framework logs per-step scalars to
``<xp_dir>/metrics.csv`` (``utils/profiling.py:MetricsLogger``). This CLI
turns that log + the checkpoint directory into a one-screen digest:

    python -m spatiotemporal_variable_separation_tpu.cli.summarize \
        --xp_dir /root/xp/wave_full [--points 8]
"""

from __future__ import annotations

import argparse
import csv
import json
import os


def load_rows(path: str):
    with open(path, newline="") as f:
        rows = []
        for row in csv.DictReader(f):
            try:
                rows.append({k: float(v) for k, v in row.items() if v != ""})
            except ValueError:
                continue  # partial line from a killed writer
    return rows


def summarize(xp_dir: str, points: int = 8, log_fn=print) -> dict:
    """Digest one experiment dir; returns the machine-readable summary."""
    params_path = os.path.join(xp_dir, "params.json")
    metrics_path = os.path.join(xp_dir, "metrics.csv")
    out: dict = {"xp_dir": xp_dir}
    if os.path.isfile(params_path):
        with open(params_path) as f:
            p = json.load(f)
        out["config"] = {k: p.get(k) for k in
                         ("data", "architecture", "decoder_architecture",
                          "epochs", "batch_size", "precision",
                          "steps_per_epoch")}
        log_fn(f"{p.get('data')}/{p.get('architecture')}"
               f" epochs={p.get('epochs')} batch={p.get('batch_size')}"
               f" precision={p.get('precision')}")
    ckpt_dir = os.path.join(xp_dir, "checkpoints")
    if os.path.isdir(ckpt_dir):
        names = sorted(os.listdir(ckpt_dir),
                       key=lambda n: (n != "final", int(n) if n.isdigit() else 0))
        out["checkpoints"] = names
        log_fn(f"checkpoints: {len(names)} ({', '.join(names[:12])}"
               + (", ..." if len(names) > 12 else "") + ")")
    if not os.path.isfile(metrics_path):
        log_fn("no metrics.csv")
        return out
    rows = load_rows(metrics_path)
    if not rows:
        log_fn("metrics.csv empty")
        return out
    last = rows[-1]
    out["steps_logged"] = int(last.get("step", 0))
    sps = [r["samples_per_sec"] for r in rows if "samples_per_sec" in r]
    if sps:
        out["samples_per_sec_median"] = sorted(sps)[len(sps) // 2]
        log_fn(f"throughput (median of {len(sps)} epochs): "
               f"{out['samples_per_sec_median']:.0f} samples/s")
    # evenly spaced curve points, always including first and last
    idx = sorted({0, len(rows) - 1,
                  *(i * (len(rows) - 1) // max(points - 1, 1)
                    for i in range(points))})
    keys = [k for k in ("loss", "ae", "s_inv", "forecast", "t_reg")
            if k in rows[0]]
    log_fn("step        " + "  ".join(f"{k:>10}" for k in keys))
    curve = []
    for i in idx:
        r = rows[i]
        curve.append({k: r.get(k) for k in ("step", *keys)})
        log_fn(f"{int(r['step']):<10}  "
               + "  ".join(f"{r.get(k, float('nan')):>10.3e}" for k in keys))
    out["curve"] = curve
    # stability probe trail (--monitor_stability runs write stability.csv)
    stab_path = os.path.join(xp_dir, "stability.csv")
    if os.path.isfile(stab_path):
        srows = load_rows(stab_path)
        if srows:
            s = srows[-1]
            out["stability"] = {k: s.get(k) for k in
                                ("step", "stability_gain",
                                 "stability_s_mean_abs",
                                 "stability_bn_max_var")}
            trail = " -> ".join(f"{r.get('stability_gain', float('nan')):.3f}"
                                for r in srows[-min(len(srows), 6):])
            log_fn(f"stability gain/step (last {min(len(srows), 6)} probes): "
                   f"{trail}; BN max var {s.get('stability_bn_max_var', 0):.3g}")
    return out


def main(argv=None):
    p = argparse.ArgumentParser(prog="varsep-tpu run summary")
    p.add_argument("--xp_dir", type=str, metavar="DIR", required=True)
    p.add_argument("--points", type=int, metavar="N", default=8)
    args = p.parse_args(argv)
    summarize(args.xp_dir, args.points)


if __name__ == "__main__":
    main()
