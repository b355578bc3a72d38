"""Shared evaluation machinery: jitted batched rollouts + metric assembly.

The reference evaluates with per-batch (or per-sample!) Python rollouts
(``test/mnist/test.py:110-147``, ``test/taxibj/test.py:44-56``); here a
single jitted forecast function (scan rollout + one batched decode) is
reused across batches, and all three pixel metrics come out of one fused
computation."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from spatiotemporal_variable_separation_tpu.ops.metrics import mse_per_frame, psnr_from_mse
from spatiotemporal_variable_separation_tpu.ops.ssim import ssim_per_frame


class Evaluator:
    """Wraps (model, variables) with jit-cached forecast/metric functions.

    With ``mesh`` the rollout is data-parallel: the conditioning batch is
    sharded over the mesh's data axis and the variables are replicated, so
    the heavy protocols (95-frame MNIST over 5,000 sequences) scale across
    chips instead of serializing on one device.  Results are bitwise
    equal to the single-device path (pure forward, no cross-batch ops).
    """

    def __init__(self, model, variables: dict, mesh=None):
        from spatiotemporal_variable_separation_tpu.utils.compile_cache import (
            enable_compilation_cache,
        )

        enable_compilation_cache()  # repeated eval CLIs skip remote recompile
        self.model = model
        self.mesh = mesh

        def fc_fn(variables, cond, n_forecast):
            fc, t_codes, s, _ = model.apply(variables, cond, n_forecast,
                                            train=False,
                                            method=model.get_forecast)
            return fc, t_codes, s

        def fc_s_fn(variables, cond, s_code, n_forecast):
            fc, _, _, _ = model.apply(variables, cond, n_forecast, None, s_code,
                                      False, method=model.get_forecast)
            return fc

        # Fused rollout+metric programs: the pixel-metric reduction runs in
        # the same XLA computation as the rollout, so a batch's score comes
        # back as O(batch) scalars instead of a (B, T, H, W, C) frame stack.
        # This is the freeze-resistance fix for the flaky device->host
        # tunnel (CLAUDE.md): the heavy protocols fetch ~3 orders of
        # magnitude fewer bytes per batch; frames stay device-resident and
        # are only fetched on the opt-in archive path.
        def score_fn(variables, cond, gt, n_forecast, nt_skip, max_val):
            fc, _, s, _ = model.apply(variables, cond, n_forecast,
                                      train=False, method=model.get_forecast)
            pred = fc[:, nt_skip:]
            return per_sequence_metrics(pred, gt, max_val), pred, s

        def swap_fn(variables, content_cond, test_cond, gt_swap, n_forecast,
                    nt_skip, max_val):
            # S from the content sequence, dynamics from the test sequence
            # (the disentanglement protocols, reference
            # ``test/mnist/test_disentanglement.py:173-184``).  ``encode_s``
            # replaces the full content rollout the two-call path ran just
            # to extract S — identical S (get_forecast computes it the same
            # way), one integrator/decode pass saved.
            s = model.apply(variables, content_cond, method=model.encode_s)
            fc, _, _, _ = model.apply(variables, test_cond, n_forecast, None,
                                      s, False, method=model.get_forecast)
            pred = fc[:, nt_skip:]
            if gt_swap.ndim == pred.ndim + 1:
                # (B, n_perms, P, H, W, C): score every digit-to-trajectory
                # assignment, keep the best per metric (min MSE / max PSNR /
                # max SSIM independently, matching the reference).
                per = jax.vmap(lambda g: per_sequence_metrics(pred, g, max_val),
                               in_axes=1, out_axes=1)(gt_swap)
                mets = {"mse": per["mse"].min(axis=1),
                        "psnr": per["psnr"].max(axis=1),
                        "ssim": per["ssim"].max(axis=1)}
            else:
                mets = per_sequence_metrics(pred, gt_swap, max_val)
            return mets, pred

        # statics passed positionally: pjit rejects kwargs with in_shardings
        if mesh is None:
            self._batch_shard = None
            self._forecast = jax.jit(fc_fn, static_argnames=("n_forecast",))
            self._forecast_with_s = jax.jit(fc_s_fn,
                                            static_argnames=("n_forecast",))
            self._score_jit = jax.jit(score_fn, static_argnums=(3, 4, 5))
            self._swap_jit = jax.jit(swap_fn, static_argnums=(4, 5, 6))
            self.variables = variables
        else:
            from spatiotemporal_variable_separation_tpu.parallel.mesh import (
                batch_sharding,
                replicated_sharding,
            )

            repl = replicated_sharding(mesh)
            data = batch_sharding(mesh)
            self._batch_shard = data
            # S codes live on the batch axis too (one per sequence).
            self._forecast = jax.jit(fc_fn, static_argnames=("n_forecast",),
                                     in_shardings=(repl, data))
            self._forecast_with_s = jax.jit(fc_s_fn,
                                            static_argnames=("n_forecast",),
                                            in_shardings=(repl, data, data))
            self._score_jit = jax.jit(score_fn, static_argnums=(3, 4, 5),
                                      in_shardings=(repl, data, data))
            self._swap_jit = jax.jit(swap_fn, static_argnums=(4, 5, 6),
                                     in_shardings=(repl, data, data, data))
            self.variables = jax.device_put(variables, repl)

    def reestimate_batch_stats(self, cond_batches, n_forecast: int) -> int:
        """Refresh BatchNorm running statistics from forward rollouts.

        Opt-in BN recalibration (the SWA ``update_bn`` idea): run the full
        ``get_forecast`` rollout in train mode (batch statistics) over the
        given conditioning batches, folding each pass's stats into the
        running averages, then evaluate with the refreshed values. Uses
        conditioning windows only (model inputs, never eval targets). The
        reference protocol has no equivalent — eval CLIs default to OFF
        (``--bn_reestimate 0``) for parity.

        Measured caveat (round-2 Moving-MNIST run, epoch 140): the
        train-mode/eval-mode forecast MSE gap there was 4.4x but
        re-estimation did NOT close it (0.0680 vs 0.0683) — mid-training
        that gap comes from per-rollout-step activation heterogeneity
        (train-mode BN renormalizes every step by its own batch stats,
        which no single running average can mimic), not from stats lagging
        the parameters. Re-estimation helps when stats are genuinely stale
        (resumed/averaged/transplanted parameters), not against
        within-rollout distribution drift.

        Returns the number of batches consumed.
        """
        if "batch_stats" not in self.variables:
            return 0

        def update_fn(variables, cond):
            _, mutated = self.model.apply(
                variables, cond, n_forecast, train=True,
                method=self.model.get_forecast, mutable=["batch_stats"])
            return mutated["batch_stats"]

        jit_update = jax.jit(update_fn)
        variables = self.variables
        n = 0
        for cond in cond_batches:
            cond = jnp.asarray(cond)
            if self._batch_shard is not None:
                # TRIM (not pad) to a mesh multiple: _pad's duplicated rows
                # would fold into the batch mean/var and bias the refreshed
                # running stats, making --devices N runs differ from
                # single-device ones.  Dropping remainder rows keeps the
                # estimate unbiased (batches here are random draws).
                n_dev = self.mesh.devices.size
                keep = cond.shape[0] - (cond.shape[0] % n_dev)
                if keep == 0:
                    continue
                cond = jax.device_put(cond[:keep], self._batch_shard)
            new_stats = jit_update(variables, cond)
            variables = dict(variables, batch_stats=new_stats)
            n += 1
        self.variables = variables
        return n

    def _pad(self, x):
        """Pad the batch to a mesh multiple by repeating the last row (the
        jitted fn needs equal shards); forecast() slices results back."""
        n_dev = self.mesh.devices.size
        short = -x.shape[0] % n_dev
        if short:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], short, axis=0)])
        return jax.device_put(x, self._batch_shard)

    def forecast(self, cond: np.ndarray, n_forecast: int,
                 init_s_code=None) -> Tuple[jnp.ndarray, Any]:
        cond = jnp.asarray(cond)
        if self._batch_shard is None:
            if init_s_code is None:
                fc, _, s = self._forecast(self.variables, cond, n_forecast)
                return fc, s
            fc = self._forecast_with_s(self.variables, cond, init_s_code,
                                       n_forecast)
            return fc, init_s_code
        b = cond.shape[0]
        if init_s_code is None:
            fc, _, s = self._forecast(self.variables, self._pad(cond),
                                      n_forecast)
            return fc[:b], jax.tree_util.tree_map(lambda a: a[:b], s)
        fc = self._forecast_with_s(
            self.variables, self._pad(cond),
            jax.tree_util.tree_map(self._pad, init_s_code), n_forecast)
        return fc[:b], init_s_code

    # -- fused device-side scoring (freeze-resistant eval path) --------
    def score(self, cond, gt, nt_skip: int, max_val: float = 1.0):
        """Roll out ``nt_skip + gt.shape[1]`` frames, score the prediction
        window against ``gt`` on device, fetch ONLY the per-sequence metric
        scalars.

        Returns ``(metrics, pred, s)`` where ``metrics`` maps
        mse/psnr/ssim to host ``(B,)`` arrays while ``pred`` (the sliced
        prediction window) and ``s`` (the S code pytree) stay
        device-resident — the opt-in archive path fetches them explicitly,
        everything else never moves frames over the tunnel."""
        cond, gt = jnp.asarray(cond), jnp.asarray(gt)
        b = cond.shape[0]
        n_forecast = nt_skip + gt.shape[1]
        if self._batch_shard is not None:
            cond, gt = self._pad(cond), self._pad(gt)
        mets, pred, s = self._score_jit(self.variables, cond, gt,
                                        n_forecast, nt_skip, max_val)
        mets = {k: np.asarray(v[:b]) for k, v in mets.items()}
        return mets, pred[:b], jax.tree_util.tree_map(lambda a: a[:b], s)

    def score_swap(self, content_cond, test_cond, gt_swap, nt_skip: int,
                   max_val: float = 1.0):
        """Disentanglement scoring in one fused program: S from
        ``content_cond``, dynamics from ``test_cond``, metrics against
        ``gt_swap`` — best-over-permutations when ``gt_swap`` carries a
        per-permutation axis ``(B, n_perms, P, H, W, C)``.

        Returns ``(metrics, pred)``: host ``(B,)`` metric arrays and the
        device-resident swap prediction window."""
        content_cond = jnp.asarray(content_cond)
        test_cond = jnp.asarray(test_cond)
        gt_swap = jnp.asarray(gt_swap)
        b = test_cond.shape[0]
        gt_len = gt_swap.shape[2] if gt_swap.ndim == test_cond.ndim + 1 \
            else gt_swap.shape[1]
        n_forecast = nt_skip + gt_len
        if self._batch_shard is not None:
            content_cond, test_cond, gt_swap = (
                self._pad(content_cond), self._pad(test_cond),
                self._pad(gt_swap))
        mets, pred = self._swap_jit(self.variables, content_cond, test_cond,
                                    gt_swap, n_forecast, nt_skip, max_val)
        return {k: np.asarray(v[:b]) for k, v in mets.items()}, pred[:b]


def bn_reestimate_pass(ev: Evaluator, dataset, batch_size: int,
                       n_forecast: int, n_batches: int, seed: int = 0) -> int:
    """Refresh the evaluator's BN running stats from ``n_batches`` random
    conditioning batches of a map-style ``(cond, target, ...)`` dataset.
    No-op when ``n_batches`` <= 0 (the default, reference-parity path)."""
    if n_batches <= 0:
        return 0
    rng = np.random.RandomState(seed)
    n = len(dataset)

    def batches():
        for _ in range(n_batches):
            idx = rng.randint(0, n, size=batch_size)
            yield np.stack([np.asarray(dataset[i][0]) for i in idx])

    return ev.reestimate_batch_stats(batches(), n_forecast)


def batch_indices(n: int, batch_size: int, max_batches: Optional[int] = None,
                  progress_every: float = 30.0):
    """Yield (indices, n_real) with the last batch padded to ``batch_size``
    by repeating the final index, so every batch has a static shape and the
    jitted forecast never retraces; callers slice results to ``n_real``.

    Emits a progress line after the first completed batch (which marks the
    end of the silent remote compile) and then at most every
    ``progress_every`` seconds — heavy protocols (95-frame MNIST, PNG-backed
    chairs) otherwise run for an hour with no output, which is
    indistinguishable from a hung tunnel (CLAUDE.md).  Set
    ``progress_every=0`` to disable."""
    import sys
    import time

    if n <= 0:
        raise ValueError("evaluation dataset is empty (0 items) — check the "
                         "data directory / split / horizon configuration")
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    n_batches = (n + batch_size - 1) // batch_size
    if max_batches:
        n_batches = min(n_batches, max_batches)
    t0 = time.monotonic()
    last_emit = None
    for b in range(n_batches):
        lo = b * batch_size
        hi = min(lo + batch_size, n)
        idx = list(range(lo, hi))
        n_real = len(idx)
        idx = idx + [idx[-1]] * (batch_size - n_real)
        yield idx, n_real
        # control is back: the caller finished scoring batch b.
        now = time.monotonic()
        if progress_every and (last_emit is None
                               or now - last_emit > progress_every
                               or b == n_batches - 1):
            print(f"[eval] batch {b + 1}/{n_batches} done "
                  f"({now - t0:.0f}s elapsed)", file=sys.stderr, flush=True)
            last_emit = now


def per_sequence_metrics(pred: jnp.ndarray, gt: jnp.ndarray,
                         max_val: float = 1.0) -> Dict[str, jnp.ndarray]:
    """Per-sequence MSE / PSNR / SSIM as ``(B,)`` *device* arrays
    (reference ``test/mnist/test.py:136-142``: spatial mean, then channel
    mean, then time mean).  Pure jnp — safe inside ``jit``, so the whole
    metric reduction can fuse with the rollout that produced ``pred`` and
    only O(batch) scalars ever cross the device->host tunnel."""
    mse = mse_per_frame(pred, gt)  # (B, T, C)
    psnr = psnr_from_mse(mse, max_val)
    ssim = ssim_per_frame(pred, gt, max_val)
    return {
        "mse": mse.mean(axis=(1, 2)),
        "psnr": psnr.mean(axis=(1, 2)),
        "ssim": ssim.mean(axis=(1, 2)),
    }


def pixel_metrics(pred: jnp.ndarray, gt: jnp.ndarray,
                  max_val: float = 1.0) -> Dict[str, np.ndarray]:
    """Host-side variant of :func:`per_sequence_metrics` (fetches)."""
    return {k: np.asarray(v)
            for k, v in per_sequence_metrics(jnp.asarray(pred),
                                             jnp.asarray(gt), max_val).items()}


def to_uint8_nchw_last(x: np.ndarray) -> np.ndarray:
    """Internal (B, T, H, W, C) floats -> the reference's archived
    (B, T, H, W, C) uint8 layout (they permute NCHW->NHWC before saving)."""
    return np.clip(np.asarray(x) * 255.0, 0, 255).astype(np.uint8)


class FrameArchive:
    """Bounded accumulator of (cond, gt, pred) batches -> npz archives.

    The MNIST eval archives everything like the reference does
    (``test/mnist/test.py:162-168``); the other protocols archive nothing
    there.  This gives them an opt-in equivalent (capability superset):
    the first ``cap`` sequences are kept as float16 and written in the
    layout ``cli.visualize`` renders (predictions.npz / gt.npz /
    cond.npz, arrays (B, T, H, W, C))."""

    def __init__(self, cap: int = 64):
        self.cap = cap
        self._rows = {"cond": [], "gt": [], "predictions": []}
        self._mse = []
        self._n = 0

    def add(self, cond: np.ndarray, gt: np.ndarray, pred: np.ndarray,
            mse: Optional[np.ndarray] = None) -> None:
        """``mse``: per-sequence scalars for the same batch — written to
        results.npz so ``cli.visualize --rank`` can pick across the MSE
        range (restricted to the archived sequences, by construction)."""
        take = min(self.cap - self._n, len(pred))
        if take <= 0:
            return
        self._rows["cond"].append(np.asarray(cond[:take], np.float16))
        self._rows["gt"].append(np.asarray(gt[:take], np.float16))
        self._rows["predictions"].append(np.asarray(pred[:take], np.float16))
        if mse is not None:
            self._mse.append(np.asarray(mse[:take], np.float64))
        self._n += take

    def save(self, xp_dir: str, log_fn=print) -> None:
        if not self._n:
            return
        for key, fname in [("predictions", "predictions.npz"),
                           ("gt", "gt.npz"), ("cond", "cond.npz")]:
            np.savez_compressed(os.path.join(xp_dir, fname),
                                **{key: np.concatenate(self._rows[key])})
        if self._mse:
            np.savez_compressed(os.path.join(xp_dir, "results.npz"),
                                mse=np.concatenate(self._mse))
        log_fn(f"archived {self._n} sequence(s) (cap {self.cap}) to {xp_dir} "
               "— render with cli.visualize")


class EvalProgress:
    """Chunk-level checkpoint/resume for eval CLIs.

    The heavy protocols (5,000-sequence 95-frame Moving MNIST) run for a
    long time through a tunnel that can freeze mid-fetch (CLAUDE.md); the
    reference has no eval resume story at all (``test/mnist/test.py`` is
    one monolithic loop).  Here every completed batch's per-sequence metric
    rows are persisted to ``<xp_dir>/<name>.progress.npz`` (tiny: a few
    floats per sequence), so a supervised rerun with ``--resume`` skips the
    already-scored batches instead of starting over.  The file carries a
    protocol fingerprint (``meta``) and is deleted by :meth:`finalize` when
    the protocol completes.

    Usage::

        prog = EvalProgress(xp_dir, "mnist_t95", meta, resume=args.resume)
        for b, (idx, n_real) in enumerate(batch_indices(...)):
            if prog.skip(b):
                continue
            ...score batch...
            prog.add(b, {"mse": rows, ...})
        results = prog.arrays()
        prog.finalize()
    """

    def __init__(self, xp_dir: Optional[str], name: str, meta: Dict[str, Any],
                 resume: bool = False, log_fn=print):
        import json

        self.path = (os.path.join(xp_dir, f"{name}.progress.npz")
                     if xp_dir else None)
        self.meta = {k: meta[k] for k in sorted(meta)}
        self.done = 0
        self._rows: Dict[str, list] = {}
        if resume and self.path and os.path.exists(self.path):
            with np.load(self.path, allow_pickle=False) as z:
                stored = json.loads(str(z["meta"]))
                if stored == {k: _json_safe(v) for k, v in self.meta.items()}:
                    self.done = int(z["done"])
                    self._rows = {k: [np.asarray(z[k])] for k in z.files
                                  if k not in ("meta", "done")}
                    log_fn(f"[eval] resume: {self.done} batch(es) already "
                           f"scored in {self.path}")
                else:
                    log_fn("[eval] progress file does not match this "
                           "protocol configuration — starting over")

    def skip(self, b: int) -> bool:
        return b < self.done

    def add(self, b: int, rows: Dict[str, np.ndarray]) -> None:
        """Record batch ``b``'s per-sequence metric rows and persist.

        Batches must arrive in order (the skip/compute loop guarantees it);
        the write is atomic (tmp + rename) so a kill mid-write leaves the
        previous consistent state."""
        import json

        if b != self.done:
            raise ValueError(f"batch {b} out of order (expected {self.done})")
        for k, v in rows.items():
            self._rows.setdefault(k, []).append(np.asarray(v, np.float64))
        self.done += 1
        if not self.path:
            return
        payload = {k: np.concatenate(v) for k, v in self._rows.items()}
        payload["done"] = np.int64(self.done)
        payload["meta"] = np.str_(json.dumps(
            {k: _json_safe(v) for k, v in self.meta.items()}))
        tmp = self.path + ".tmp"
        np.savez(tmp, **payload)
        # np.savez appends .npz when missing; it keeps explicit names as-is
        # only if they end in .npz, so account for both.
        src = tmp if os.path.exists(tmp) else tmp + ".npz"
        os.replace(src, self.path)

    def arrays(self) -> Dict[str, np.ndarray]:
        """All persisted per-sequence rows, concatenated in batch order."""
        return {k: np.concatenate(v) for k, v in self._rows.items()}

    def finalize(self) -> None:
        if self.path and os.path.exists(self.path):
            os.unlink(self.path)


def _json_safe(v):
    """Round-trip-stable scalar for the progress fingerprint."""
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    return v


def write_eval_json(xp_dir: str, protocol: str, means: Dict[str, float],
                    **extra) -> str:
    """Merge a protocol's metric means into ``<xp_dir>/evals.json``.

    The reference prints metric means to stdout and archives only raw
    per-sequence arrays (``test/mnist/test.py:152-157``); re-deriving the
    headline numbers later means re-opening npz archives.  Every eval CLI
    here additionally records ``{protocol: {metric: value, ...}}`` in one
    merged JSON per experiment dir, so results survive the terminal and
    can be aggregated across runs (last run of a protocol wins).

    Metric means are stored as floats; ``extra`` run metadata (epoch,
    bn_reestimate, ...) keeps its original types — display layers
    (``cli.summarize``) rely on this to tell metrics from metadata.
    A lock file serializes concurrent eval CLIs on the same xp_dir so the
    read-merge-write cannot drop the other protocol's record.

    Scoring a pinned intermediate checkpoint (``--epoch N``) records under
    ``"<protocol>@epN"`` so diagnostic scores of older checkpoints never
    clobber the final-model slot."""
    import json
    import time

    if extra.get("epoch") is not None:
        protocol = f"{protocol}@ep{extra['epoch']}"
    path = os.path.join(xp_dir, "evals.json")
    lock = path + ".lock"
    stale_age_s = 10.0  # live writers hold the lock for milliseconds
    fd = None
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            # A lock older than ``stale_age_s`` belongs to a killed
            # writer: unlink it and RETRY acquisition.  Never proceed
            # lockless — unlinking a live writer's fresh lock and writing
            # anyway would let two read-merge-write cycles interleave and
            # silently drop the other protocol's record.  A fresh lock is
            # simply waited on: it is either released or ages out.
            try:
                stale = time.time() - os.path.getmtime(lock) > stale_age_s
            except OSError:
                continue  # lock vanished — retry acquisition now
            if stale:
                try:
                    os.unlink(lock)
                except OSError:
                    pass
                continue
            time.sleep(0.1)
    try:
        try:
            with open(path) as f:
                record = json.load(f)
        except (FileNotFoundError, ValueError):
            record = {}
        record[protocol] = {**{k: float(v) for k, v in means.items()},
                            **extra, "unix_time": time.time()}
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(record, f, indent=2, sort_keys=True)
        os.replace(tmp, path)
    finally:
        if fd is not None:
            os.close(fd)
            try:
                os.unlink(lock)
            except OSError:
                pass
    return path
