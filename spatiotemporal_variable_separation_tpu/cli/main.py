"""Training entry point: ``python -m spatiotemporal_variable_separation_tpu.cli.main``
(reference ``python -m var_sep.main`` equivalent, ``var_sep/main.py:49-162``)."""

from __future__ import annotations

import os


def main(argv=None):
    from spatiotemporal_variable_separation_tpu.cli.options import (
        add_platform_arg,
        apply_platform,
        build_parser,
        config_from_args,
    )
    from spatiotemporal_variable_separation_tpu.train.loop import run_training
    from spatiotemporal_variable_separation_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    parser = build_parser()
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the latest checkpoint in xp_dir "
                             "(capability the reference lacks).")
    parser.add_argument("--log_every", type=int, default=50,
                        help="Log loss terms every N steps (0 disables).")
    parser.add_argument("--profile", action="store_true",
                        help="Capture a jax.profiler trace of the first "
                             "training steps to <xp_dir>/profile/.")
    parser.add_argument("--monitor_stability", action="store_true",
                        help="Probe integrator gain / BN running-stat health "
                             "at every periodic checkpoint (early warning "
                             "for the eval-mode runaway, BASELINE.md).")
    add_platform_arg(parser)
    args = parser.parse_args(argv)
    # platform first: the cache's backend probe initializes a backend.
    apply_platform(args)
    # after parsing: --help / flag typos must not pay (or hang on) the
    # tunneled TPU backend init that the cache's backend probe triggers.
    enable_compilation_cache()
    resume = args.resume
    log_every = args.log_every
    profile = args.profile
    monitor_stability = args.monitor_stability
    del args.resume, args.log_every, args.profile, args.monitor_stability, \
        args.platform
    cfg = config_from_args(args).validate()
    if cfg.nt_pred + cfg.offset > 24 and not cfg.remat:
        # Measured round 5 (BASELINE.md "long-horizon-under-grad"): at
        # t+95 the un-rematerialized rollout-under-grad needs 1.9x the
        # v5e's HBM at the flagship batch and is 2.9x slower than remat
        # even where it fits (spill traffic beats recompute).
        print("[warn] long training horizon "
              f"(nt_pred+offset={cfg.nt_pred + cfg.offset} > 24) without "
              "--remat: the rollout-under-grad stores every decoder "
              "activation per step — expect HBM exhaustion at production "
              "batch sizes, and slower steps even where it fits. "
              "--remat is strictly better at every measured point "
              "(BASELINE.md 'Round-5: long-horizon-under-grad').",
              flush=True)
    os.makedirs(cfg.xp_dir, exist_ok=True)
    # params.json dump (main.py:104-106) — eval CLIs reload this.  On
    # --resume an existing dump is kept: it may carry the steps_per_epoch
    # frozen by the first run, which keeps the epoch-granular LR schedule
    # invariant under resume (run_training adopts it).
    params_path = os.path.join(cfg.xp_dir, "params.json")
    if not (resume and os.path.isfile(params_path)):
        cfg.save(params_path)
    run_training(cfg, resume=resume, log_every=log_every, profile=profile,
                 monitor_stability=monitor_stability)


if __name__ == "__main__":
    main()
