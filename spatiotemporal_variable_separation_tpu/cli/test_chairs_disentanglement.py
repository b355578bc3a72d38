"""Chairs disentanglement CLI
(reference ``python -m var_sep.test.chairs.test_disentanglement``)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(prog="varsep-tpu Chairs content-swap testing")
    p.add_argument("--data_dir", type=str, metavar="DIR", required=True)
    p.add_argument("--xp_dir", type=str, metavar="DIR", required=True)
    p.add_argument("--epoch", type=int, metavar="EPOCH", default=None)
    p.add_argument("--batch_size", type=int, metavar="BATCH", default=16)
    p.add_argument("--nt_pred", type=int, metavar="PRED", required=True)
    p.add_argument("--test_seed", type=int, metavar="SEED", default=1)
    from spatiotemporal_variable_separation_tpu.cli.options import (
        add_bn_reestimate_arg,
        add_devices_arg,
        add_eval_resume_arg,
        add_max_batches_arg,
        add_platform_arg,
        mesh_from_args,
    )

    add_devices_arg(p)
    add_platform_arg(p)
    add_bn_reestimate_arg(p)
    add_max_batches_arg(p)
    add_eval_resume_arg(p)
    args = p.parse_args(argv)
    mesh = mesh_from_args(args)

    from spatiotemporal_variable_separation_tpu.eval.chairs_swap import evaluate

    means = evaluate(args.xp_dir, args.data_dir, args.nt_pred, args.batch_size,
                     args.test_seed, args.epoch, mesh=mesh,
                     bn_reestimate=args.bn_reestimate,
                     max_batches=args.max_batches, resume=args.resume)
    print("Results:")
    for k, v in means.items():
        print(k, v)
    from spatiotemporal_variable_separation_tpu.eval.common import write_eval_json

    extra = ({"max_batches": args.max_batches}
             if args.max_batches is not None else {})
    write_eval_json(args.xp_dir, f"chairs_swap_t{args.nt_pred}", means,
                    epoch=args.epoch, bn_reestimate=args.bn_reestimate,
                    **extra)


if __name__ == "__main__":
    main()
