"""Serving latency benchmark CLI: AOT-compile a trained checkpoint's
forecast at a fixed (batch, horizon) signature and report steady-state
latency percentiles + frame throughput.

New capability over the reference (which has no inference entry point —
its eval scripts rebuild the torch model per run); see ``serve.py``."""

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(prog="varsep-tpu serving benchmark")
    p.add_argument("--xp_dir", type=str, metavar="DIR", required=True)
    p.add_argument("--epoch", type=int, metavar="EPOCH", default=None)
    p.add_argument("--batch_size", type=int, metavar="BATCH", default=64)
    p.add_argument("--n_forecast", type=int, metavar="N", default=100)
    p.add_argument("--iters", type=int, metavar="N", default=50)
    p.add_argument("--precision", type=str, metavar="P", default=None,
                   choices=("f32", "bf16", "mixed"),
                   help="inference-only precision override (serve an "
                        "f32-trained checkpoint with bf16 compute; see "
                        "serve.Forecaster.from_xp_dir)")
    from spatiotemporal_variable_separation_tpu.cli.options import (
        add_devices_arg,
        add_platform_arg,
        mesh_from_args,
    )

    add_devices_arg(p)
    add_platform_arg(p)
    args = p.parse_args(argv)
    mesh = mesh_from_args(args)

    from spatiotemporal_variable_separation_tpu.serve import Forecaster

    fc = Forecaster.from_xp_dir(args.xp_dir, args.batch_size, args.n_forecast,
                                epoch=args.epoch, mesh=mesh,
                                precision=args.precision)
    print(json.dumps(fc.benchmark(n_iters=args.iters)))


if __name__ == "__main__":
    main()
