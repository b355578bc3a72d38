"""WaveEq eval CLI (reference ``python -m var_sep.test.wave.test``)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(prog="varsep-tpu WaveEq testing")
    p.add_argument("--data_dir", type=str, metavar="DIR", required=True)
    p.add_argument("--xp_dir", type=str, metavar="DIR", required=True)
    p.add_argument("--epoch", type=int, metavar="EPOCH", default=None)
    p.add_argument("--batch_size", type=int, metavar="BATCH", default=256)
    from spatiotemporal_variable_separation_tpu.cli.options import (
        add_devices_arg,
        add_max_batches_arg,
        add_platform_arg,
        mesh_from_args,
    )

    p.add_argument("--save_arrays", action="store_true",
                   help="Archive cond/gt/pred npz for cli.visualize "
                        "(first 64 sequences; protocol unchanged).")
    add_devices_arg(p)
    add_platform_arg(p)
    add_max_batches_arg(p)
    args = p.parse_args(argv)
    mesh = mesh_from_args(args)

    from spatiotemporal_variable_separation_tpu.eval.wave import evaluate

    means = evaluate(args.xp_dir, args.data_dir, args.batch_size, args.epoch,
                     mesh=mesh, max_batches=args.max_batches,
                     save_arrays=args.save_arrays)
    print(f"MSE at t+40: {means['mse_t40']}")
    from spatiotemporal_variable_separation_tpu.eval.common import write_eval_json

    extra = ({"max_batches": args.max_batches}
             if args.max_batches is not None else {})
    write_eval_json(args.xp_dir, "wave", means, epoch=args.epoch, **extra)


if __name__ == "__main__":
    main()
