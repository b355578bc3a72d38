"""Roofline evidence for the flagship train step (VERDICT r4 item 4).

Closes "the HBM-roofline closure rests on the XLA cost model" with two
independent, per-operation sources:

1. **Static buffer-traffic table from the optimized HLO**: for every
   top-level instruction of the compiled step's ENTRY computation, HBM
   bytes = sum of its operand buffer sizes + its output buffer size.
   Unlike XLA's aggregate ``bytes accessed`` cost model (which recounts a
   fusion parameter once per in-fusion use and overcounts elementwise
   re-reads), each buffer is counted once per kernel launch — the way HBM
   actually sees it (modulo cache hits between adjacent kernels).
2. **jax.profiler trace** of the same executable (TensorBoard/xprof
   format), captured around measured steps, saved for inspection.

Prints the top byte producers, the static total, and the implied
bandwidth utilization at the measured step time.  Run on the real TPU,
never concurrently with another TPU process (CLAUDE.md).
"""

from __future__ import annotations

import json
import re
import sys
import time
from collections import defaultdict

import numpy as np

DT_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}
_SHAPE_RE = re.compile(r"\b([a-z]+\d*)\[([\d,]*)\]")


def shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO type string (handles tuples by summing)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in DT_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT_BYTES[dt]
    return total


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^=]*?\)|[a-z]+\d*\[[^\]]*\][^\s]*))\s+([\w\-]+)\((.*)\)",
)
_OPERAND_RE = re.compile(r"%([\w.\-]+)")

SKIP_OPS = {"parameter", "constant", "tuple", "get-tuple-element", "bitcast",
            "after-all", "partition-id", "replica-id"}


def entry_traffic(hlo_text: str):
    """Per-instruction (name, opcode, in_bytes, out_bytes, metadata_op) for
    the ENTRY computation of an optimized HLO module."""
    lines = hlo_text.splitlines()
    in_entry = False
    sizes = {}
    rows = []
    for ln in lines:
        if ln.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and ln.startswith("}"):
            break
        if not in_entry:
            continue
        m = _INSTR_RE.match(ln)
        if not m:
            continue
        name, type_str, opcode, args = m.groups()
        out_b = shape_bytes(type_str)
        sizes[name] = out_b
        if opcode in SKIP_OPS:
            continue
        # operands: %refs before any attribute section in the args
        arg_head = args.split("),")[0] if opcode == "fusion" else args
        ops = _OPERAND_RE.findall(args)
        in_b = sum(sizes.get(o, 0) for o in dict.fromkeys(ops))
        meta = ""
        mm = re.search(r'metadata=\{[^}]*op_name="([^"]*)"', ln)
        if mm:
            meta = mm.group(1)
        rows.append((name, opcode, in_b, out_b, meta))
    return rows


def parse_chrome_trace(trace_dir: str, n_steps: int):
    """Trace-derived per-op device time and bytes_accessed from the
    ``*.trace.json.gz`` the profiler writes (Chrome trace format — no
    xprof needed).  Events on the '/device:TPU:0' process: tid 2 = XLA
    module executions, tid 3 = XLA ops with ``device_duration`` and the
    device's ``bytes_accessed`` per execution."""
    import glob
    import gzip
    import os

    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None
    ev = json.load(gzip.open(paths[0]))["traceEvents"]
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e.get("args", {}).get("name", "")}
    mods = [e for e in ev if e.get("pid") in dev_pids and e.get("tid") == 2
            and e.get("ph") == "X"]
    ops = [e for e in ev if e.get("pid") in dev_pids and e.get("tid") == 3
           and e.get("ph") == "X"]
    by_op = defaultdict(lambda: [0.0, 0, 0])   # us, bytes, count
    by_cat = defaultdict(lambda: [0.0, 0])
    for e in ops:
        a = e.get("args", {})
        b = int(a.get("bytes_accessed", 0))
        r = by_op[e["name"]]
        r[0] += e["dur"]
        r[1] += b
        r[2] += 1
        c = by_cat[a.get("hlo_category", "?")]
        c[0] += e["dur"]
        c[1] += b
    return {
        "module_ms": sum(e["dur"] for e in mods) / max(len(mods), 1) / 1e3,
        "busy_ms": sum(r[0] for r in by_op.values()) / n_steps / 1e3,
        "bytes_gb": sum(r[1] for r in by_op.values()) / n_steps / 1e9,
        "by_cat": sorted(((c, t / n_steps / 1e3, b / n_steps / 1e9)
                          for c, (t, b) in by_cat.items()),
                         key=lambda r: -r[1]),
        "by_op": sorted(((n, t / n_steps / 1e3, b / n_steps / 1e9, c // n_steps)
                         for n, (t, b, c) in by_op.items()),
                        key=lambda r: -r[2]),
    }


def main():
    import jax
    import jax.numpy as jnp

    from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
    from spatiotemporal_variable_separation_tpu.models.factory import (
        build_separable_network,
    )
    from spatiotemporal_variable_separation_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )
    from spatiotemporal_variable_separation_tpu.train.state import create_train_state
    from spatiotemporal_variable_separation_tpu.train.step import (
        make_optimizer,
        make_train_step,
    )
    from spatiotemporal_variable_separation_tpu.utils import profiling
    from spatiotemporal_variable_separation_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    cfg = ExperimentConfig(
        data="mnist", architecture="dcgan", code_size_s=128, code_size_t=20,
        enc_hidden_size=64, dec_hidden_size=64, res_hidden_size=512,
        n_blocks=1, nt_cond=5, nt_pred=10, offset=5, batch_size=128,
        precision="bf16", seed=0, fused_loss=True)
    mesh = make_mesh()
    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=100)
    state = jax.device_put(create_train_state(model, cfg, tx),
                           replicated_sharding(mesh))
    step = make_train_step(model, cfg, tx, mesh)
    rng = np.random.default_rng(0)
    seq = rng.random((128, 15) + cfg.frame_shape).astype(np.float32)
    shard = batch_sharding(mesh)
    cond = jax.device_put(jnp.asarray(seq[:, :5]), shard)
    target = jax.device_put(jnp.asarray(seq[:, 5:]), shard)

    compiled = step.lower(state, cond, target).compile()

    # static per-kernel traffic table
    rows = entry_traffic(compiled.as_text())
    rows.sort(key=lambda r: -(r[2] + r[3]))
    total = sum(r[2] + r[3] for r in rows)

    # measured step time (AOT executable, hard fence via float fetch)
    for _ in range(5):
        state, metrics = compiled(state, cond, target)
    float(metrics["loss"])
    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        state, metrics = compiled(state, cond, target)
    float(metrics["loss"])
    step_ms = (time.perf_counter() - t0) / n * 1e3

    # profiler trace around a few steps (saved as evidence; parsing the
    # xplane protobuf needs xprof/tensorboard, absent here)
    trace_dir = "/root/data/trace_flagship_r5"
    trace_err = None
    try:
        with profiling.trace(trace_dir):
            for _ in range(3):
                state, metrics = compiled(state, cond, target)
            float(metrics["loss"])
    except Exception as e:  # noqa: BLE001
        trace_err = f"{type(e).__name__}: {e}"

    import os

    trace_files = []
    for root, _, files in os.walk(trace_dir):
        trace_files += [os.path.join(root, f) for f in files]

    ca = compiled.cost_analysis()
    tr = None if trace_err else parse_chrome_trace(trace_dir, 3)
    print(json.dumps({
        "step_ms": round(step_ms, 2),
        "static_hbm_gb_per_step": round(total / 1e9, 3),
        "static_bw_utilization_at_819GBs": round(
            total / (step_ms / 1e3) / 819e9, 3),
        "costmodel_bytes_gb": round(float(ca.get("bytes accessed", 0)) / 1e9, 2),
        "n_kernels": len(rows),
        "trace_dir": trace_dir if not trace_err else None,
        "trace_error": trace_err,
        "trace_files": len(trace_files),
        "trace_module_ms": round(tr["module_ms"], 2) if tr else None,
        "trace_busy_ms": round(tr["busy_ms"], 2) if tr else None,
        "trace_bytes_gb": round(tr["bytes_gb"], 2) if tr else None,
    }))
    print("\ntop-12 HBM byte producers (in+out GB per step, static table):")
    for name, opcode, in_b, out_b, meta in rows[:12]:
        gb = (in_b + out_b) / 1e9
        print(f"  {gb:7.3f} GB  {opcode:12s} {name:28s} {meta[:60]}")
    if tr:
        print("\ntrace-derived, per step — by hlo_category (ms, GB):")
        for cat, t_ms, b_gb in tr["by_cat"][:12]:
            print(f"  {t_ms:7.3f} ms  {b_gb:7.3f} GB  {cat}")
        print("\ntrace-derived top-10 byte producers (GB, ms, launches):")
        for name, t_ms, b_gb, cnt in tr["by_op"][:10]:
            print(f"  {b_gb:7.4f} GB  {t_ms:7.4f} ms  x{cnt:4d}  {name[:60]}")


if __name__ == "__main__":
    main()
