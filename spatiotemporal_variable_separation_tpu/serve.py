"""Serving: ahead-of-time-compiled, fixed-shape forecasting.

The reference has no inference story beyond re-running its eval scripts
(``var_sep/test/*/test.py`` rebuild the model per invocation and roll out
under torch autograd).  This module is the production path the TPU build
adds on top of the same checkpoints:

* the forecast (encode -> scan rollout -> decode) is lowered and compiled
  ONCE for a fixed (batch, horizon) signature (`jax.jit(...).lower().
  compile()`), so serving never retraces and first-request latency is paid
  at startup;
* parameters are device-resident and, with a mesh, replicated while request
  batches shard over the data axis — the same sharding contract as
  training, so a pod serves batches with zero code changes;
* requests smaller than the compiled batch are padded and sliced (static
  shapes keep XLA happy; see ``Forecaster.predict``).

Typical use::

    fc = Forecaster.from_xp_dir(xp_dir, batch_size=64, n_forecast=100)
    frames = fc.predict(cond)          # (B, n_forecast, H, W, C) ndarray
    stats = fc.benchmark()             # latency percentiles
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp


class Forecaster:
    """AOT-compiled forecast server for one (batch, horizon) signature."""

    def __init__(self, model, variables: dict, cfg, batch_size: int,
                 n_forecast: int, mesh=None):
        from spatiotemporal_variable_separation_tpu.utils.compile_cache import (
            enable_compilation_cache,
        )

        enable_compilation_cache()  # server restarts reuse the AOT binary
        self.cfg = cfg
        self.batch_size = batch_size
        self.n_forecast = n_forecast
        self.mesh = mesh
        self.frame_shape = tuple(cfg.frame_shape)

        def fn(variables, cond):
            out, _, _, _ = model.apply(variables, cond, n_forecast,
                                       train=False,
                                       method=model.get_forecast)
            return out

        cond_spec = jax.ShapeDtypeStruct(
            (batch_size, cfg.nt_cond) + self.frame_shape, jnp.float32)
        if mesh is None:
            self.variables = jax.device_put(variables)
            jitted = jax.jit(fn)
        else:
            from spatiotemporal_variable_separation_tpu.parallel.mesh import (
                batch_sharding,
                replicated_sharding,
            )

            repl = replicated_sharding(mesh)
            data = batch_sharding(mesh)
            self.variables = jax.device_put(variables, repl)
            jitted = jax.jit(fn, in_shardings=(repl, data))
            cond_spec = jax.ShapeDtypeStruct(cond_spec.shape, cond_spec.dtype,
                                             sharding=data)
        var_spec = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
            self.variables)
        self._compiled = jitted.lower(var_spec, cond_spec).compile()

    @classmethod
    def from_xp_dir(cls, xp_dir: str, batch_size: int, n_forecast: int,
                    epoch: Optional[int] = None, mesh=None,
                    precision: Optional[str] = None) -> "Forecaster":
        """Load a checkpoint for serving.

        ``precision`` overrides the training precision for inference only
        (e.g. ``"bf16"`` to serve an f32-trained checkpoint with bf16
        compute).  This is safe where bf16 *training* is not: the
        instability documented in BASELINE.md is a training-loop feedback
        (bf16 conv gradients -> BN-masked |S| runaway), while eval-mode
        BatchNorm uses frozen running statistics and parameters stay f32 —
        only activation compute is cast.  Measure quality on your protocol
        before adopting; see BASELINE.md "bf16 serving" for the flagship
        numbers.
        """
        from spatiotemporal_variable_separation_tpu.checkpoint import load_for_eval

        overrides = {"precision": precision} if precision else None
        model, variables, cfg = load_for_eval(
            xp_dir, name=str(epoch) if epoch is not None else None,
            overrides=overrides)
        return cls(model, variables, cfg, batch_size, n_forecast, mesh=mesh)

    def predict(self, cond: np.ndarray) -> np.ndarray:
        """Forecast ``n_forecast`` frames for up to ``batch_size`` windows.

        ``cond``: (b, nt_cond, *frame) with b <= batch_size; smaller
        requests are padded to the compiled batch and sliced back.
        """
        b = cond.shape[0]
        if b > self.batch_size:
            raise ValueError(f"request batch {b} exceeds compiled "
                             f"batch {self.batch_size}")
        if b < self.batch_size:
            pad = np.repeat(cond[-1:], self.batch_size - b, axis=0)
            cond = np.concatenate([cond, pad], axis=0)
        out = self._compiled(self.variables, jnp.asarray(cond, jnp.float32))
        return np.asarray(out[:b])

    def benchmark(self, n_iters: int = 50, warmup: int = 5) -> Dict[str, Any]:
        """Steady-state serving latency for the compiled signature."""
        rng = np.random.default_rng(0)
        cond = jnp.asarray(rng.random(
            (self.batch_size, self.cfg.nt_cond) + self.frame_shape,
            dtype=np.float32))
        # at least one un-timed call: the fence below needs a result, and
        # the timed loop must not include a cold dispatch.
        for _ in range(max(warmup, 1)):
            out = self._compiled(self.variables, cond)
        _ = float(jnp.mean(out))  # hard fence (CLAUDE.md: block_until_ready
        # is unreliable on the tunneled platform)
        lat = []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            out = self._compiled(self.variables, cond)
            _ = float(jnp.mean(out))
            lat.append(time.perf_counter() - t0)
        lat = np.asarray(lat)
        return {
            "batch": self.batch_size,
            "n_forecast": self.n_forecast,
            "p50_ms": float(np.percentile(lat, 50) * 1e3),
            "p99_ms": float(np.percentile(lat, 99) * 1e3),
            "mean_ms": float(lat.mean() * 1e3),
            "frames_per_sec": float(self.batch_size * self.n_forecast
                                    / lat.mean()),
        }
