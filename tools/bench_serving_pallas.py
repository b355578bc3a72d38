"""ROADMAP item 4 decision bench: Pallas fused rollout+decode at serving
batch 64 / 100 frames vs the bf16 AOT serving path.

Measures, at the flagship serving signature (MNIST/DCGAN geometry,
batch 64, horizon 100):

1. the bf16 AOT `serve.Forecaster` end-to-end p50 (the shipping path);
2. the XLA `lax.scan` temporal rollout ALONE at that signature (what a
   fused kernel's rollout half must beat);
3. the validated Pallas rollout building block
   (`ops/pallas/rollout.mlp_resnet_rollout`) at the same signature.

The fused rollout+decode kernel's best case is bounded by (2)/(1) — the
rollout's share of the serving latency — and its realized rollout cost is
(3).  One run prints the decision row for ROADMAP/BASELINE.

Weights are freshly initialized (latency does not depend on values); run
on the real TPU with no platform override, never concurrently with
another TPU process (CLAUDE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BATCH = 64
HORIZON = 100


def median_ms(fn, sync, warmup=5, iters=30):
    """One sync per call: end-to-end latency INCLUDING the host round
    trip.  On the axon tunnel the round trip is ~25-30 ms, which buries
    sub-ms device work — use amortized_ms for device-time claims."""
    for _ in range(warmup):
        out = fn()
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def amortized_ms(fn, sync, k=100, reps=5, warmup=5):
    """Device time per call: k async dispatches back to back (the device
    queue serializes them), one fetch at the end — the tunnel round trip
    amortizes to ~RTT/k.  Median over reps."""
    for _ in range(warmup):
        out = fn()
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3 / k)
    return float(np.median(ts))


def main():
    from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
    from spatiotemporal_variable_separation_tpu.models.factory import (
        build_separable_network,
    )
    from spatiotemporal_variable_separation_tpu.ops.pallas.rollout import (
        extract_mlp_resnet_params,
        mlp_resnet_rollout,
        mlp_resnet_rollout_reference,
    )
    from spatiotemporal_variable_separation_tpu.serve import Forecaster
    from spatiotemporal_variable_separation_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    cfg = ExperimentConfig(
        data="mnist", architecture="dcgan", code_size_s=128, code_size_t=20,
        enc_hidden_size=64, dec_hidden_size=64, res_hidden_size=512,
        n_blocks=1, nt_cond=5, nt_pred=10, offset=5, batch_size=BATCH,
        precision="bf16", seed=0)
    model = build_separable_network(cfg)
    cond = jnp.zeros((BATCH, cfg.nt_cond) + cfg.frame_shape, jnp.float32)
    variables = dict(model.init(jax.random.PRNGKey(0), cond, 2, train=False))

    # hard fence helper: float() fetch (block_until_ready unreliable on axon)
    def sync_arr(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        float(jnp.ravel(leaf)[0].astype(jnp.float32))

    # 1. bf16 AOT serving path, end to end
    fc = Forecaster(model, variables, cfg, BATCH, HORIZON)
    rng = np.random.default_rng(0)
    req = jnp.asarray(rng.random((BATCH, cfg.nt_cond) + cfg.frame_shape),
                      jnp.float32)
    serve_e2e_ms = median_ms(lambda: fc._compiled(fc.variables, req), sync_arr)
    serve_ms = amortized_ms(lambda: fc._compiled(fc.variables, req), sync_arr,
                            k=50)

    # tunnel round trip for the record: fetch of an already-computed scalar
    tiny = jnp.float32(1.0) + jnp.float32(1.0)
    sync_arr(tiny)
    rtt_ms = median_ms(lambda: tiny, sync_arr, warmup=1, iters=15)

    # 2. scan rollout alone (f32 carry like the serving program's integrator)
    t0_code = jnp.asarray(rng.standard_normal((BATCH, cfg.code_size_t)),
                          jnp.float32)
    params = [jnp.asarray(p) for p in extract_mlp_resnet_params(
        variables["params"]["t_resnet"], cfg.n_blocks)]
    scan_fn = jax.jit(lambda t, ps: mlp_resnet_rollout_reference(t, ps, HORIZON))
    scan_ms = amortized_ms(lambda: scan_fn(t0_code, params), sync_arr)

    # 3. Pallas rollout building block, same signature
    pallas_ms = amortized_ms(
        lambda: mlp_resnet_rollout(t0_code, params, HORIZON, batch_tile=BATCH),
        sync_arr)
    # sanity: bitwise agreement (kernel is validated by tests; cheap recheck)
    ref = np.asarray(mlp_resnet_rollout_reference(t0_code, params, HORIZON))
    ker = np.asarray(mlp_resnet_rollout(t0_code, params, HORIZON,
                                        batch_tile=BATCH))
    max_err = float(np.max(np.abs(ref - ker)))

    rollout_share = scan_ms / serve_ms
    print(json.dumps({
        "signature": f"batch {BATCH}, horizon {HORIZON}, bf16 serving",
        "serve_p50_ms": round(serve_ms, 2),
        "serve_e2e_p50_ms": round(serve_e2e_ms, 2),
        "tunnel_rtt_ms": round(rtt_ms, 2),
        "scan_rollout_ms": round(scan_ms, 3),
        "pallas_rollout_ms": round(pallas_ms, 3),
        "rollout_share_of_serving": round(rollout_share, 4),
        "pallas_vs_scan": round(pallas_ms / scan_ms, 2),
        "kernel_max_abs_err": max_err,
        "decision_bound": "a fused rollout+decode kernel can recover at "
                          "most the rollout share; its rollout half is "
                          "measured at pallas_vs_scan x the scan cost",
    }))


if __name__ == "__main__":
    main()
