"""SeparableNetwork: S/T disentangled forecaster with an on-chip rollout.

TPU-native re-design of the reference core model
(``var_sep/networks/model.py:20-89``).  Differences that matter:

* the reference's Python rollout loop (``model.py:78-83``) is a single
  ``lax.scan`` over the residual integrator, so an arbitrarily long horizon
  compiles to one fused on-chip loop;
* train-time decoding defaults to ``decode_mode="stepwise"`` — per-step
  decoder passes exactly like the reference (same BatchNorm batch-stats
  semantics), which also measures ~11% FASTER on a v5e than folding the
  horizon into one (horizon x batch) decode (15.0 vs 16.9 ms on the
  flagship step): the per-frame batch already saturates the MXU and the
  giant fold pays extra reshape/transpose traffic.  The stepwise (and
  fused-loss) horizon loop is an ``nn.scan`` with ``batch_stats`` carry
  and a bounded unroll (``_scan_unroll``): production horizons compile to
  straight-line XLA (cross-step fusion — the rolled loop measured 25%
  slower), longer ones to an 8-way-unrolled loop, so program size and
  compile time stay flat out to t+95 and beyond.  ``"batched"`` keeps
  the folded variant selectable; eval always decodes batched (identical
  results, BN frozen);
* S (and its skip feature maps) is computed once and broadcast across the
  rollout, exactly as in the reference (``model.py:57-64``).

Content-swap hooks (``init_s_code`` / ``init_t_code``, ``model.py:52-60``)
are preserved; when ``skipco`` is set, the returned S code is the full
``(code, skips)`` pytree so a swap round-trips (the reference returns the
bare code, which breaks its own swap path for skipco models).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _tile_leading(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B, ...) -> (n*B, ...) by broadcasting a new leading axis."""
    return jnp.broadcast_to(x[None], (n,) + x.shape).reshape((n * x.shape[0],) + x.shape[1:])


def _scan_unroll(n: int) -> int:
    """Unroll factor for the horizon scans.

    Full unroll at production horizons: straight-line XLA lets the
    compiler fuse across decode steps, measured 18.6 -> 14.9 ms/step on
    the flagship v5e config (the rolled while-loop body blocks cross-step
    fusion and pays a dynamic-update-slice per trip).  Beyond 24 steps,
    a bounded 8-way partial unroll keeps program size O(1) in the horizon
    (the round-3 concern that motivated scanning in the first place).
    """
    return n if n <= 24 else 8


class SeparableNetwork(nn.Module):
    Es: nn.Module
    Et: nn.Module
    t_resnet: nn.Module
    decoder: nn.Module
    nt_cond: int
    skipco: bool = False
    decode_mode: str = "stepwise"
    remat: bool = False
    # training-objective fusion: accumulate the forecast MSE per decoded
    # step instead of stacking frames (see compute_losses).
    fused_loss: bool = False
    # Eval-decode auto-chunking: bound the S/skip tiles materialized per
    # folded decode call (elements, not bytes).  The (horizon x batch)
    # fold tiles every skip feature map horizon-fold times; at 256px
    # skipco this broadcast alone exceeded HBM at default eval batch
    # (measured 25 GB, BASELINE.md round-4) — chunking the horizon axis
    # keeps the peak bounded with bitwise-identical results (BN is frozen
    # in eval; each chunk sees the same per-item statistics).
    eval_decode_tile_elems: int = 1 << 25

    # -- encoding ------------------------------------------------------
    def encode_s(self, cond: jnp.ndarray, train: bool = False):
        """Spatial code of a conditioning window; ``(code, skips)`` if skipco."""
        return self.Es(cond, return_skip=self.skipco, train=train)

    def encode_t(self, cond: jnp.ndarray, train: bool = False):
        return self.Et(cond, train=train)

    # -- rollout -------------------------------------------------------
    def _integrate(self, t_code: jnp.ndarray, n_forecast: int, train: bool):
        """Scan the Euler integrator ``n_forecast - 1`` times.

        Returns ``t_codes`` stacked (n, B, ...) and residuals
        (n-1, n_blocks, B, ...)."""
        if n_forecast <= 1:
            return t_code[None], None

        # the scan carry must keep one dtype: under the ``mixed`` policy the
        # integrator computes f32 while the encoder emitted bf16 codes.
        int_dtype = getattr(self.t_resnet, "dtype", t_code.dtype)
        t_code = t_code.astype(int_dtype)

        def step(mdl, carry, _):
            t_new, res = mdl.t_resnet(carry, train=train)
            return t_new, (t_new, res)

        if self.remat:
            step = nn.remat(step, prevent_cse=False)
        if train:
            collections = dict(variable_broadcast="params", variable_carry="batch_stats")
        else:
            collections = dict(variable_broadcast=["params", "batch_stats"])
        scan = nn.scan(step, length=n_forecast - 1, split_rngs={"params": False},
                       unroll=_scan_unroll(n_forecast - 1), **collections)
        _, (t_rest, residuals) = scan(self, t_code, None)
        t_codes = jnp.concatenate([t_code[None], t_rest], axis=0)
        return t_codes, residuals

    def _decode_all(self, s_code, skips, t_codes: jnp.ndarray, train: bool):
        """Decode every (S, T_t) pair.  t_codes: (n, B, ...) -> (B, n, *frame).

        With ``remat`` the batched decode is checkpointed: the (horizon x
        batch) decoder activations — the dominant HBM term of the train
        step — are recomputed during backward instead of stored.
        """
        n, b = t_codes.shape[0], t_codes.shape[1]
        if self.decode_mode == "batched" or not train:
            def dec(mdl, s, t, sk):
                return mdl.decoder(s, t, skip=sk, train=train)

            if self.remat and train:
                dec = nn.remat(dec, prevent_cse=False,
                               static_argnums=())

            # Auto-chunk (eval only): bound the input-side tiles (S code +
            # skip maps, whose horizon-fold broadcast drives the decoder's
            # peak footprint) per decode call.  All shapes are static at
            # trace time, so the chunk split compiles to a fixed unrolled
            # sequence of identical decoder calls.  chunk == n reproduces
            # the single-call fold exactly (the common case: flat codes are
            # tiny and never chunk).
            per_item = s_code.size // b
            if skips is not None:
                per_item += sum(sk.size // b for sk in skips)
            budget = max(self.eval_decode_tile_elems, 1)
            chunk = n if train else min(n, max(1, budget // max(1, b * per_item)))

            def fold(tc):
                cn = tc.shape[0]
                t_flat = tc.reshape((cn * b,) + tc.shape[2:])
                s_flat = _tile_leading(s_code, cn)
                skips_flat = None
                if skips is not None:
                    skips_flat = [_tile_leading(s, cn) for s in skips]
                fr = dec(self, s_flat, t_flat, skips_flat)
                return fr.reshape((cn, b) + fr.shape[1:])

            if chunk >= n:
                frames = fold(t_codes)
            else:
                frames = jnp.concatenate(
                    [fold(t_codes[lo:lo + chunk]) for lo in range(0, n, chunk)],
                    axis=0)
            return jnp.moveaxis(frames, 0, 1)
        # stepwise: reference-parity BatchNorm batch statistics (per step),
        # scanned over the horizon — one decoder trace regardless of n, so
        # program size and compile time stay constant at long horizons (the
        # pre-round-4 Python loop unrolled n decoder copies into the XLA
        # program).  batch_stats is the scan carry: each step's BN update
        # feeds the next, exactly like the sequential loop.
        def dec_step(mdl, carry, t_i):
            return carry, mdl.decoder(s_code, t_i, skip=skips, train=train)

        if self.remat and train:
            dec_step = nn.remat(dec_step, prevent_cse=False)
        scan = nn.scan(dec_step, length=n, split_rngs={"params": False},
                       variable_broadcast="params",
                       variable_carry="batch_stats", unroll=_scan_unroll(n))
        _, frames = scan(self, (), t_codes)
        return jnp.moveaxis(frames, 0, 1)

    # -- public API ----------------------------------------------------
    def get_forecast(
        self,
        cond: jnp.ndarray,
        n_forecast: int,
        init_t_code: Optional[jnp.ndarray] = None,
        init_s_code: Any = None,
        train: bool = False,
    ):
        """Forecast ``n_forecast`` frames (the first is the decode of T_0).

        Returns ``(forecasts, t_codes, s_full, t_residuals)`` with
        ``forecasts``: (B, n, *frame), ``t_codes``: (B, n, *code),
        ``s_full``: S as produced by the encoder (``(code, skips)`` when
        skipco), ``t_residuals``: (n-1, n_blocks, B, *code) or None.
        """
        s_full = self.encode_s(cond, train=train) if init_s_code is None else init_s_code
        if self.skipco:
            s_code, skips = s_full
        else:
            s_code, skips = s_full, None
        t_code = self.encode_t(cond, train=train) if init_t_code is None else init_t_code

        t_codes, residuals = self._integrate(t_code, n_forecast, train)
        forecasts = self._decode_all(s_code, skips, t_codes, train)
        return forecasts, jnp.moveaxis(t_codes, 0, 1), s_full, residuals

    def __call__(self, cond: jnp.ndarray, n_forecast: int, train: bool = False):
        return self.get_forecast(cond, n_forecast, train=train)

    # -- training objective -------------------------------------------
    def compute_losses(
        self,
        cond: jnp.ndarray,
        target: jnp.ndarray,
        t_random: jnp.ndarray,
        offset: int,
        lamb_ae: float,
        lamb_s: float,
        lamb_t: float,
        lamb_pred: float,
        average_tloss: bool = False,
        train: bool = True,
        lamb_s_norm: float = 0.0,
    ):
        """Four-term objective of the reference trainer (``train.py:38-149``).

        ``t_random`` is a traced int32 scalar in ``[nt_cond, T)`` (offset=0)
        or ``[nt_cond, T]`` (offset=nt_cond), sampled by the caller — the
        JAX-PRNG replacement for the reference's per-step host
        ``np.random.randint`` (``train.py:72-76``).
        """
        f32 = jnp.float32
        nt_cond = self.nt_cond
        full = jnp.concatenate([cond, target], axis=1)  # (B, T, *frame)

        # -- autoencoding (train.py:45-88) --
        data_old = full[:, :nt_cond]
        data_new = full[:, -nt_cond:]
        s_old_full = self.encode_s(data_old, train=train)
        s_new_full = self.encode_s(data_new, train=train)
        window = jax.lax.dynamic_slice_in_dim(full, t_random - nt_cond, nt_cond, axis=1)
        t_code_random = self.encode_t(window, train=train)
        if self.skipco:
            s_old, skips = s_old_full
        else:
            s_old, skips = s_old_full, None
        recon = self.decoder(s_old, t_code_random, skip=skips, train=train)
        supervision = jax.lax.dynamic_index_in_dim(full, t_random - offset, axis=1,
                                                   keepdims=False)
        ae = jnp.mean((supervision.astype(f32) - recon.astype(f32)) ** 2)

        # -- S invariance (train.py:38-42): mean squared difference over the
        # concatenation of code and skip tensors --
        old_leaves = jax.tree_util.tree_leaves(s_old_full)
        new_leaves = jax.tree_util.tree_leaves(s_new_full)
        sq = sum(jnp.sum((a.astype(f32) - b.astype(f32)) ** 2)
                 for a, b in zip(old_leaves, new_leaves))
        count = sum(a.size for a in old_leaves)
        s_inv = sq / count

        # -- forecast (train.py:132-140) --
        nt_pred = target.shape[1]
        fc_target = full if offset != 0 else full[:, nt_cond:]
        if self.fused_loss and train:
            # Fused decode+loss: the squared error of each decoded frame is
            # reduced to a scalar inside the same XLA subgraph as the
            # decoder pass that produced it, so the (B, horizon, *frame)
            # f32 forecast stack is never materialized in HBM — same
            # objective, same gradients (summation order aside; the
            # equivalence is tested in tests/test_fused_loss.py).
            t_code = self.encode_t(cond, train=train)
            t_codes_nb, _ = self._integrate(t_code, nt_pred + offset, train)
            n = t_codes_nb.shape[0]
            tgt_nb = jnp.moveaxis(fc_target, 1, 0)  # (n, B, *frame)

            # Scanned like the stepwise decode above: sequential f32 sum in
            # the same per-step order as the unrolled loop it replaces, with
            # batch_stats as carry (identical BN-update stream).
            def fused_step(mdl, sse, xs):
                t_i, tgt_i = xs
                frame = mdl.decoder(s_old, t_i, skip=skips, train=train)
                diff = frame.astype(f32) - tgt_i.astype(f32)
                return sse + jnp.sum(diff * diff), None

            if self.remat:
                fused_step = nn.remat(fused_step, prevent_cse=False)
            scan = nn.scan(fused_step, length=n, split_rngs={"params": False},
                           variable_broadcast="params",
                           variable_carry="batch_stats",
                           unroll=_scan_unroll(n))
            sse, _ = scan(self, jnp.zeros((), f32), (t_codes_nb, tgt_nb))
            forecast = sse / (n * fc_target[:, 0].astype(f32).size)
            t0 = t_codes_nb[0].astype(f32)
        else:
            forecasts, t_codes, _, _ = self.get_forecast(
                cond, nt_pred + offset, init_s_code=s_old_full, train=train)
            forecast = jnp.mean(
                (forecasts.astype(f32) - fc_target.astype(f32)) ** 2)
            t0 = t_codes[:, 0].astype(f32)

        # -- T regularization (train.py:145-149) --
        if average_tloss:
            t_reg = 0.5 * jnp.mean(t0 ** 2)
        else:
            t_reg = 0.5 * jnp.mean(jnp.sum(t0.reshape(t0.shape[0], -1) ** 2, axis=1))

        total = (lamb_ae * ae + lamb_s * s_inv + lamb_pred * forecast
                 + lamb_t * t_reg)
        metrics = {"loss": total, "ae": ae, "s_inv": s_inv,
                   "forecast": forecast, "t_reg": t_reg}
        if lamb_s_norm:
            # Opt-in extension (NOT in the reference, train.py:38-149):
            # penalize the S scale the 4-term objective leaves free — the
            # bf16 runaway grows |S| unchecked behind train-mode BN
            # (BASELINE.md).  The S *code* only (not skip feature maps,
            # whose element count would otherwise dominate the mean —
            # matching diagnose's s_mean_abs probe).  Static python float:
            # 0.0 traces away.
            s_norm = jnp.mean(s_old.astype(f32) ** 2)
            total = total + lamb_s_norm * s_norm
            metrics = {**metrics, "loss": total, "s_norm": s_norm}
        return total, metrics
