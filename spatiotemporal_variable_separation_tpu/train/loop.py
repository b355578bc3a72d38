"""Training driver (reference ``var_sep/train.py:91-175`` equivalent).

Differences, all TPU-idiomatic or capability supersets:
* the per-batch work is one jitted, donated, data-parallel XLA computation
  (see ``train/step.py``) instead of a Python loss/backward/step sequence;
* loss values are actually logged (the reference shows only a progress
  bar);
* checkpoints carry optimizer state and are resume-capable;
* Ctrl-C still saves a final checkpoint (parity with ``train.py:172-175``).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax

from spatiotemporal_variable_separation_tpu.checkpoint import save_checkpoint
from spatiotemporal_variable_separation_tpu.core.config import ExperimentConfig
from spatiotemporal_variable_separation_tpu.data.registry import (
    epoch_iterator,
    make_device_generator,
    make_train_dataset,
    steps_per_epoch,
)
from spatiotemporal_variable_separation_tpu.models.factory import build_separable_network
from spatiotemporal_variable_separation_tpu.parallel.mesh import (
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated_sharding,
)
from spatiotemporal_variable_separation_tpu.train.state import TrainState, create_train_state
from spatiotemporal_variable_separation_tpu.train.step import make_optimizer, make_train_step


def run_training(cfg: ExperimentConfig, dataset=None, mesh=None,
                 log_every: int = 50, log_fn: Callable[[str], None] = print,
                 resume: bool = False, profile: bool = False,
                 resume_state: Optional[TrainState] = None,
                 monitor_stability: bool = False) -> TrainState:
    cfg = cfg.validate()
    if mesh is None:
        mesh = make_mesh(cfg.num_devices, model_parallel=cfg.model_parallel)
    # Freeze steps_per_epoch across resumes: the MultiStepLR schedule is
    # step//steps_per_epoch-based (train/step.py:multistep_lr), so a resumed
    # run with a different dataset size or --steps_per_epoch would silently
    # re-base every epoch milestone.  The first run persists the derived
    # value into params.json; resumed runs adopt it.
    import dataclasses

    params_path = os.path.join(cfg.xp_dir, "params.json")
    if resume and os.path.isfile(params_path):
        saved = ExperimentConfig.from_json_file(params_path)
        if cfg.steps_per_epoch is None and saved.steps_per_epoch is not None:
            cfg = dataclasses.replace(cfg, steps_per_epoch=saved.steps_per_epoch)
            log_fn(f"resume: adopting frozen steps_per_epoch={cfg.steps_per_epoch}")
        # Surface any other drift loudly and make params.json record the
        # config the resumed run ACTUALLY uses (a changed default — or a
        # changed flag like --epochs — must not leave a stale record).
        diffs = {f.name: (getattr(saved, f.name), getattr(cfg, f.name))
                 for f in dataclasses.fields(cfg)
                 if getattr(saved, f.name) != getattr(cfg, f.name)}
        if diffs:
            for k, (old, new) in sorted(diffs.items()):
                log_fn(f"resume: config field {k!r} changed: {old!r} -> {new!r}")
            cfg.save(params_path)
    # an explicitly passed dataset always wins over device synthesis.
    device_gen = make_device_generator(cfg, mesh) if dataset is None else None
    if dataset is None and device_gen is None:
        dataset = make_train_dataset(cfg)
    n_steps = steps_per_epoch(cfg, dataset if dataset is not None else device_gen)
    if cfg.steps_per_epoch is None:
        cfg = dataclasses.replace(cfg, steps_per_epoch=n_steps)
        if os.path.isfile(params_path):
            cfg.save(params_path)

    model = build_separable_network(cfg)
    tx = make_optimizer(cfg, n_steps)
    state = resume_state if resume_state is not None else create_train_state(model, cfg, tx)
    if resume and resume_state is None:
        from spatiotemporal_variable_separation_tpu.checkpoint import (
            list_checkpoints,
            restore_checkpoint,
        )

        if list_checkpoints(cfg.xp_dir):
            template = jax.eval_shape(lambda: create_train_state(model, cfg, tx))
            state = restore_checkpoint(cfg.xp_dir, template)
            log_fn(f"resumed from step {int(state.step)}")
    if MODEL_AXIS in mesh.shape and mesh.shape[MODEL_AXIS] > 1:
        from spatiotemporal_variable_separation_tpu.parallel.tensor import (
            state_shardings as _tp_shardings,
        )

        state_sh = _tp_shardings(state, mesh)
    else:
        state_sh = replicated_sharding(mesh)
    state = jax.device_put(state, state_sh)
    data_shard = batch_sharding(mesh)
    if device_gen is not None:
        # single XLA program per step: on-device synthesis + full update.
        from spatiotemporal_variable_separation_tpu.train.step import (
            make_fused_datagen_step,
        )

        corpus = jax.device_put(device_gen.data, replicated_sharding(mesh))
        fused_step = make_fused_datagen_step(model, cfg, tx, device_gen, mesh,
                                             state_shardings=state_sh)
    else:
        step = make_train_step(model, cfg, tx, mesh, state_shardings=state_sh)

    log_fn(f"training: {cfg.data}/{cfg.architecture} on {mesh.devices.size} device(s), "
           f"{cfg.epochs} epochs x {n_steps} steps, batch {cfg.batch_size}, "
           f"precision {cfg.precision}")
    from spatiotemporal_variable_separation_tpu.utils.profiling import MetricsLogger

    mlog = MetricsLogger(cfg.xp_dir) if os.path.isdir(cfg.xp_dir) else None

    # Optional early-warning probe at every periodic checkpoint: integrator
    # gain + BN running-stat extrema (eval/diagnostics.py).  Catches the
    # "train losses improve, eval collapses" runaway (BASELINE.md) while
    # the run is still live instead of at eval time.  One jitted probe,
    # compiled once; noise conditioning is sufficient for gain/BN health.
    stability_check = None
    slog = None
    if monitor_stability:
        import numpy as _np

        from spatiotemporal_variable_separation_tpu.eval.diagnostics import (
            bn_health,
            finalize_probe,
            is_unstable,
            make_rollout_probe,
            projected_growth,
            protocol_horizon,
        )

        _probe = make_rollout_probe(model, max(cfg.nt_pred, 10))
        # verdicts judge compounded growth over the dataset's eval-protocol
        # rollout length, not raw per-step gain (diagnostics.is_unstable).
        _horizon = protocol_horizon(cfg.data, cfg.nt_pred)
        _probe_cond = _np.random.default_rng(0).standard_normal(
            (8, cfg.nt_cond) + cfg.frame_shape).astype(_np.float32)
        # own file: metrics.csv's column set is frozen at its first row
        # (and parsed by cli.summarize), so stability scalars go next to it.
        slog = (MetricsLogger(cfg.xp_dir, "stability.csv")
                if os.path.isdir(cfg.xp_dir) else None)

        def stability_check(state, epoch):
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            rep = finalize_probe(_probe(variables, _probe_cond))
            bn = bn_health(variables)
            # noise conditioning -> |S| scale is indicative only, so the
            # verdict rests on gain and BN health (is_unstable docstring).
            bad = is_unstable(rep["gain_geomean"], bn["max_var"], None,
                              horizon=_horizon)
            growth = projected_growth(rep["gain_geomean"], _horizon)
            log_fn(f"stability @ epoch {epoch}: gain/step "
                   f"{rep['gain_geomean']:.3f} ({growth:.3g}x over the "
                   f"t+{_horizon} protocol), |S| {float(rep['s_mean_abs']):.3g}, "
                   f"BN max var {bn['max_var']:.3g}"
                   + ("  ** UNSTABLE **" if bad else ""))
            if slog is not None:
                slog.log(int(state.step), {
                    "stability_gain": rep["gain_geomean"],
                    "stability_s_mean_abs": float(rep["s_mean_abs"]),
                    "stability_bn_max_var": bn["max_var"]})
    t_start = time.time()

    # Preemption safety: TPU pools send SIGTERM before reclaiming a VM.
    # The stop is COOPERATIVE (a flag checked between steps), not an
    # exception: an exception could land inside the donated train step,
    # after the old state's buffers were consumed but before the new
    # state's handle was returned — leaving no live state to checkpoint.
    # Only installable from the main thread; restored on exit.
    import signal
    import threading

    stop_requested = threading.Event()
    prev_handler = None
    handler_installed = False
    if threading.current_thread() is threading.main_thread():
        def _on_sigterm(signum, frame):
            stop_requested.set()
        # signal.signal returns None for handlers installed outside Python,
        # so restoration is gated on our own flag, not on the return value.
        prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        handler_installed = True
    try:
        def updates(epoch, skip=0):
            # ``skip``: batches of this epoch already consumed before a
            # mid-epoch interrupt.  Without it a resumed run re-runs the
            # full epoch — overshooting the total step budget by up to
            # n_steps - 1 and shifting every MultiStepLR milestone
            # (caught by tests/test_resume_outcome.py).
            if device_gen is not None:
                # batches are keyed on state.step, so skipping is implicit.
                for _ in range(n_steps - skip):
                    yield lambda s: fused_step(s, corpus)
            else:
                it = epoch_iterator(cfg, dataset, epoch)
                for _ in range(skip):
                    next(it, None)  # deterministic per-epoch order: these
                    # exact batches were trained on before the interrupt
                    # (map-style via the (seed+epoch)-seeded Batcher;
                    # generate_batch streams are re-seeded per (seed,
                    # epoch) in epoch_iterator for the same guarantee).
                for cond, target in it:
                    c = jax.device_put(cond, data_shard)
                    t = jax.device_put(target, data_shard)
                    yield lambda s, c=c, t=t: step(s, c, t)

        # The step counter is tracked host-side: fetching int(state.step)
        # every iteration is a host<->device round-trip per step, which
        # serializes dispatch (and costs a full network RTT per step on the
        # tunneled axon platform — measured 0.26 s/step vs 3 ms compute).
        host_step = int(state.step)
        start_epoch = host_step // n_steps
        metrics = None
        # In-epoch loss logging is LAGGED by one log boundary: fetching the
        # just-dispatched step's metrics drains the dispatch queue and
        # idles the device for ~6 scalar round-trips per boundary —
        # measured 27.5 -> 22.4 s/epoch on the flagship MNIST recipe over
        # the tunneled platform (~20% of the step budget).  Holding the
        # previous boundary's device metrics and fetching them 50 steps
        # later overlaps the transfer with compute the queue already holds.
        pending_log = None  # (step, epoch, device-resident metrics)

        def flush_pending():
            nonlocal pending_log
            if pending_log is None:
                return
            pstep, pepoch, pmetrics = pending_log
            pending_log = None
            m = {k: float(v) for k, v in jax.device_get(pmetrics).items()}
            log_fn(f"epoch {pepoch} step {pstep}: loss {m['loss']:.5f} "
                   f"(ae {m['ae']:.5f} s_inv {m['s_inv']:.5f} "
                   f"pred {m['forecast']:.5f} t_reg {m['t_reg']:.5f})")
            if mlog is not None:
                mlog.log(pstep, m)
        first_step_t0 = time.time()  # first update = silent remote compile
        # --profile traces steps 3..13 of the first epoch; the steps are
        # part of normal training (the same iterator continues afterwards),
        # so step counts and the LR schedule stay exact.
        profile_after = host_step + 3 if profile else -1
        profile_ctx = None
        for epoch in range(start_epoch, cfg.epochs):
            t_epoch = time.time()
            in_epoch_skip = max(0, host_step - epoch * n_steps)
            epoch_steps = n_steps - in_epoch_skip
            for do_update in updates(epoch, in_epoch_skip):
                if stop_requested.is_set():
                    raise KeyboardInterrupt  # between steps: state is live
                state, metrics = do_update(state)
                host_step += 1
                if first_step_t0 is not None:
                    # hard fence: the dispatch above returns futures; fetch
                    # one scalar so "first step done" means compile+run done.
                    float(metrics["loss"])
                    log_fn(f"first step done in {time.time() - first_step_t0:.1f}s "
                           "(incl. compile)")
                    first_step_t0 = None
                if profile and profile_ctx is None and host_step >= profile_after:
                    from spatiotemporal_variable_separation_tpu.utils.profiling import trace

                    jax.block_until_ready(state.params)
                    profile_ctx = trace(os.path.join(cfg.xp_dir, "profile"))
                    profile_ctx.__enter__()
                    profile_until = host_step + 10
                elif profile_ctx is not None and host_step >= profile_until:
                    jax.block_until_ready(state.params)
                    profile_ctx.__exit__(None, None, None)
                    profile_ctx = None
                    profile = False
                    log_fn(f"profiler trace written to {cfg.xp_dir}/profile")
                if log_every and host_step % log_every == 0:
                    flush_pending()  # values ready ~log_every steps ago
                    pending_log = (host_step, epoch, metrics)
            if metrics is not None:
                # one hard fence per epoch: honest timing, bounded dispatch
                # queue (float() because block_until_ready is unreliable on
                # the tunneled platform, CLAUDE.md).
                float(metrics["loss"])
            dt = time.time() - t_epoch
            sps = epoch_steps * cfg.batch_size / dt if dt > 0 else 0.0
            flush_pending()  # post-fence: the lagged boundary line is ready
            log_fn(f"epoch {epoch} done in {dt:.1f}s ({sps:.1f} samples/s)")
            if mlog is not None and metrics is not None:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                m["samples_per_sec"] = sps
                mlog.log(host_step, m)
            if cfg.chkpt_interval is not None and (epoch + 1) % cfg.chkpt_interval == 0:
                # epoch-numbered like the reference's ov_Es_{N}.pt suffixes,
                # so the eval CLIs' --epoch flag addresses them directly.
                save_checkpoint(cfg.xp_dir, state, name=str(epoch + 1))
                if stability_check is not None:
                    stability_check(state, epoch + 1)
            elif stability_check is not None and cfg.chkpt_interval is None:
                # no periodic checkpoints -> probe every epoch (the flag
                # must never be a silent no-op on exactly the long runs
                # it was built for).
                stability_check(state, epoch + 1)
    except KeyboardInterrupt:
        log_fn("interrupted (Ctrl-C/SIGTERM) — saving final checkpoint")
    finally:
        if handler_installed:
            signal.signal(signal.SIGTERM,
                          prev_handler if prev_handler is not None
                          else signal.SIG_DFL)
        # written on EVERY exit path (incl. crashes), so 'final' is always
        # the newest state and restore_checkpoint's preference for it holds.
        # Guarded: a Ctrl-C landing INSIDE the donated step can leave the
        # state's buffers consumed — keep the last periodic checkpoint
        # rather than dying in the handler.
        try:
            save_checkpoint(cfg.xp_dir, state, name="final")
        except RuntimeError as e:  # pragma: no cover — mid-step interrupt
            log_fn(f"final checkpoint skipped (state buffers donated "
                   f"mid-step): {e}")
        try:
            flush_pending()  # lagged boundary line, if one is still held
        except Exception:  # pragma: no cover — interrupt before definition
            pass
        if mlog is not None:
            mlog.close()
        if slog is not None:
            slog.close()
    log_fn(f"total time {time.time() - t_start:.1f}s")
    return state
