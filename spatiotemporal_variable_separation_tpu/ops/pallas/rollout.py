"""Pallas TPU kernel: fused MLP-ResNet temporal rollout.

The separable forecaster evolves its dynamic code T by n_forecast
sequential Euler steps of a small residual MLP (reference
``var_sep/networks/model.py:78-83`` + ``resnet.py:22-50``).  Under XLA's
``lax.scan`` each step is a chain of three small matmuls with HBM traffic
between steps; at long horizons (95+ frames for the Moving MNIST long-term
protocol) the rollout is launch/HBM-latency bound, not FLOPs bound.

This kernel runs the *entire* rollout in one ``pallas_call``: all block
weights (a few hundred KB) and the running T code stay resident in VMEM,
each step is an MXU matmul chain over the batch tile, and every
intermediate T code is streamed to the output buffer.  The grid tiles the
batch so arbitrarily large eval batches work.

Forward-only by design: training horizons are short (nt_pred + offset) and
differentiate fine through the scan; this kernel serves evaluation and
serving paths.  ``mlp_resnet_rollout_reference`` is the jittable pure-JAX
equivalent used for golden tests and as the non-TPU fallback.

Measured on a v5e chip (code 20, hidden 512, 1 block, horizon 100,
batch 64 — ``tools/bench_serving_pallas.py``, round 5): bitwise-exact vs
the scan and 0.89x its time (0.385 vs 0.431 ms; the round-2 "~10x
slower" reading at a 128-wide batch tile does not reproduce — the
per-step fixed cost has since been fused away by the toolchain).  The
rollout is only ~3.5% of the serving forward at that signature, so the
contemplated fused rollout+decode serving kernel is retired with numbers
(BASELINE.md "Round-5 serving"); XLA's conv pipeline keeps the decode.
The default integration path remains ``lax.scan``; this kernel stays as
a validated building block.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One block's parameters: (w1, b1, w2, b2, w3, b3) of the 3-layer
# pre-activation MLP (Dense, relu-Dense, relu-Dense).
BlockParams = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
                    jnp.ndarray, jnp.ndarray]


def _block_step(t, params: Sequence[jnp.ndarray]):
    """One Euler step: t + MLP(t) per block, sequentially (f32 accumulate)."""
    n_blocks = len(params) // 6
    for i in range(n_blocks):
        w1, b1, w2, b2, w3, b3 = params[6 * i: 6 * i + 6]
        h = jnp.dot(t, w1, preferred_element_type=jnp.float32) + b1
        h = jnp.dot(jax.nn.relu(h), w2, preferred_element_type=jnp.float32) + b2
        res = jnp.dot(jax.nn.relu(h), w3, preferred_element_type=jnp.float32) + b3
        t = t + res
    return t


def mlp_resnet_rollout_reference(t0: jnp.ndarray, params: Sequence[jnp.ndarray],
                                 n_steps: int) -> jnp.ndarray:
    """Pure-JAX scan equivalent; returns (n_steps, B, code) with t0 first."""
    def step(t, _):
        t_new = _block_step(t.astype(jnp.float32), params)
        return t_new, t_new

    _, rest = jax.lax.scan(step, t0.astype(jnp.float32), None, length=n_steps - 1)
    return jnp.concatenate([t0[None].astype(jnp.float32), rest], axis=0)


def _rollout_kernel(n_steps: int, n_params: int):
    def kernel(*refs):
        t0_ref = refs[0]
        param_refs = refs[1: 1 + n_params]
        out_ref = refs[1 + n_params]
        params = [r[:] for r in param_refs]
        t0 = t0_ref[0].astype(jnp.float32)
        out_ref[0] = t0

        def body(k, t):
            t_new = _block_step(t, params)
            out_ref[k] = t_new
            return t_new

        jax.lax.fori_loop(1, n_steps, body, t0)

    return kernel


@partial(jax.jit, static_argnames=("n_steps", "batch_tile", "interpret"))
def mlp_resnet_rollout(t0: jnp.ndarray, params: Sequence[jnp.ndarray],
                       n_steps: int, batch_tile: int = 128,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused rollout: (B, code) -> (n_steps, B, code), t0 included.

    ``params``: flat list [w1, b1, w2, b2, w3, b3] * n_blocks, f32.
    """
    b, code = t0.shape
    # biases as (1, dim) rows — keep every VMEM operand >= 2-D.
    params = [p.astype(jnp.float32) if p.ndim == 2 else
              p.astype(jnp.float32).reshape(1, -1) for p in params]
    tile = min(batch_tile, b)
    # pad batch to a multiple of the tile
    pad = (-b) % tile
    t0p = jnp.pad(t0.astype(jnp.float32), ((0, pad), (0, 0)))
    bp = b + pad
    n_params = len(params)

    grid = (bp // tile,)
    in_specs = [pl.BlockSpec((1, tile, code), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)]
    # weights are broadcast to every batch tile
    for p in params:
        in_specs.append(pl.BlockSpec(
            p.shape, lambda i, _nd=p.ndim: (0,) * _nd,
            memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        _rollout_kernel(n_steps, n_params),
        out_shape=jax.ShapeDtypeStruct((n_steps, bp, code), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n_steps, tile, code), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(t0p[None], *params)
    return out[:, :b]


def extract_mlp_resnet_params(t_resnet_params: dict, n_blocks: int) -> List[jnp.ndarray]:
    """Flatten an MLPResnet param tree (block_{i}/block_{j}/linear/{kernel,
    bias}) into the kernel's [w1, b1, ...] layout."""
    flat: List[jnp.ndarray] = []
    for i in range(n_blocks):
        blk = t_resnet_params[f"block_{i}"]
        for j in range(3):
            lin = blk[f"block_{j}"]["linear"]
            flat.append(lin["kernel"])
            flat.append(lin["bias"])
    return flat
