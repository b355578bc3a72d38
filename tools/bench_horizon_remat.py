"""Long-horizon-under-grad at flagship size (VERDICT r4 item 5).

Measures the flagship MNIST/DCGAN train step at ``nt_pred`` 95 (the
long-term protocol horizon) with ``--remat`` off/on on the real device:
step time, compiled temp/peak memory (``memory_analysis``), and the
short-horizon flagship step as the reference row.  SURVEY §7 hard part 1
(rollout-under-grad memory) is otherwise only exercised at CPU-tiny
shapes (tests/test_remat.py).

Run on the real TPU, never concurrently with another TPU process.
"""

from __future__ import annotations

import json
import time

import numpy as np


def measure(cfg, n_steps=20, warmup=3):
    import jax
    import jax.numpy as jnp

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

    mesh = make_mesh()
    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=100)
    state = jax.device_put(create_train_state(model, cfg, tx),
                           replicated_sharding(mesh))
    step = make_train_step(model, cfg, tx, mesh)
    rng = np.random.default_rng(0)
    t_total = cfg.nt_cond + cfg.nt_pred
    seq = rng.random((cfg.batch_size, t_total) + cfg.frame_shape,
                     ).astype(np.float32)
    shard = batch_sharding(mesh)
    cond = jax.device_put(jnp.asarray(seq[:, :cfg.nt_cond]), shard)
    target = jax.device_put(jnp.asarray(seq[:, cfg.nt_cond:]), shard)

    t_compile = time.perf_counter()
    compiled = step.lower(state, cond, target).compile()
    compile_s = time.perf_counter() - t_compile
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {"temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
               "argument_gb": round(ma.argument_size_in_bytes / 1e9, 3),
               "output_gb": round(ma.output_size_in_bytes / 1e9, 3)}
    except Exception as e:  # noqa: BLE001
        mem = {"memory_analysis_error": str(e)[:120]}

    for _ in range(warmup):
        state, metrics = compiled(state, cond, target)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = compiled(state, cond, target)
    float(metrics["loss"])
    step_ms = (time.perf_counter() - t0) / n_steps * 1e3
    return {"step_ms": round(step_ms, 2),
            "samples_per_sec": round(cfg.batch_size / (step_ms / 1e3), 0),
            "compile_s": round(compile_s, 1), **mem,
            "loss": round(float(metrics["loss"]), 3)}


def main():
    import dataclasses

    from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
    from spatiotemporal_variable_separation_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    flagship = ExperimentConfig(
        data="mnist", architecture="dcgan", code_size_s=128, code_size_t=20,
        enc_hidden_size=64, dec_hidden_size=64, res_hidden_size=512,
        n_blocks=1, nt_cond=5, nt_pred=10, offset=5, batch_size=128,
        precision="bf16", seed=0, fused_loss=True, lamb_s_norm=0.1)

    def guarded(name, cfg, tries=2):
        """Record compile-time HBM OOMs and tunnel transport failures as
        result rows instead of dying ('does the program fit/compile' is
        half of what this bench measures), and print each row as it
        lands so a later failure cannot lose earlier measurements."""
        import re

        row = None
        for attempt in range(tries):
            try:
                row = measure(cfg)
                break
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                if "Ran out of memory" in msg:
                    m = re.search(r"Used ([\d.]+)G of ([\d.]+)G hbm", msg)
                    row = {"oom": True,
                           "needed_gb": float(m.group(1)) if m else None,
                           "hbm_gb": float(m.group(2)) if m else None}
                    break
                row = {"compile_error": msg.splitlines()[-1][:200],
                       "attempts": attempt + 1}
        print(f"ROW {name}: {json.dumps(row)}", flush=True)
        return row

    rows = {}
    rows["t10_flagship"] = guarded("t10_flagship", flagship)
    long_cfg = dataclasses.replace(flagship, nt_pred=95)
    rows["t95"] = guarded("t95", long_cfg)
    # batch-32 pair: if batch-128 no-remat does not fit, this is the
    # apples-to-apples remat time-cost comparison at the long horizon.
    b32 = dataclasses.replace(long_cfg, batch_size=32)
    rows["t95_b32"] = guarded("t95_b32", b32)
    rows["t95_b32_remat"] = guarded(
        "t95_b32_remat", dataclasses.replace(b32, remat=True))
    # the heaviest compile goes last: a compile-helper/tunnel failure here
    # (observed once) then cannot cost the rows above.
    rows["t95_remat"] = guarded(
        "t95_remat", dataclasses.replace(long_cfg, remat=True))
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
