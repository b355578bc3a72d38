"""SST eval CLI (reference ``python -m var_sep.test.sst.test``)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(prog="varsep-tpu SST testing")
    p.add_argument("--data_dir", type=str, metavar="DIR", required=True)
    p.add_argument("--xp_dir", type=str, metavar="DIR", required=True)
    p.add_argument("--epoch", type=int, metavar="EPOCH", default=None)
    p.add_argument("--batch_size", type=int, metavar="BATCH", default=64)
    p.add_argument("--zones", type=int, nargs="+", default=list(range(17, 21)))
    p.add_argument("--reference_broadcast", action="store_true",
                   help="Reproduce the reference eval's stat-broadcast quirk "
                        "exactly (for comparing against paper numbers).")
    from spatiotemporal_variable_separation_tpu.cli.options import (
        add_bn_reestimate_arg,
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
    add_bn_reestimate_arg(p)
    add_max_batches_arg(p)
    args = p.parse_args(argv)
    mesh = mesh_from_args(args)

    from spatiotemporal_variable_separation_tpu.eval.sst import evaluate

    means = evaluate(args.xp_dir, args.data_dir, args.batch_size, args.epoch,
                     zones=args.zones,
                     reference_broadcast=args.reference_broadcast, mesh=mesh,
                     bn_reestimate=args.bn_reestimate,
                     max_batches=args.max_batches,
                     save_arrays=args.save_arrays)
    print(f"MSE at t+10: {means['mse_t10']}")
    print(f"MSE at t+6: {means['mse_t6']}")
    print(f"SSIM at t+10: {means['ssim_t10']}")
    print(f"SSIM at t+6: {means['ssim_t6']}")
    from spatiotemporal_variable_separation_tpu.eval.common import write_eval_json

    # Non-standard zone sets get their own protocol key so they never
    # overwrite the reference protocol's (zones 17-20) record.
    protocol = ("sst" if args.zones == list(range(17, 21)) else
                "sst_zones_" + "-".join(str(z) for z in args.zones))
    extra = ({"max_batches": args.max_batches}
             if args.max_batches is not None else {})
    write_eval_json(args.xp_dir, protocol, means, epoch=args.epoch,
                    zones=args.zones, bn_reestimate=args.bn_reestimate,
                    reference_broadcast=args.reference_broadcast, **extra)


if __name__ == "__main__":
    main()
