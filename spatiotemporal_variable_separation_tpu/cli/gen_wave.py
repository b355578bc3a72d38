"""WaveEq dataset generation CLI
(reference ``python -m var_sep.preprocessing.wave.gen_wave`` — but the
integration runs on device; 300 sequences take seconds, not hours)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="WaveEq preprocessing (TPU)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_dir", type=str, metavar="DIR", required=True)
    p.add_argument("--seq_len", type=int, metavar="LEN", default=300)
    p.add_argument("--seed", type=int, metavar="SEED", default=42)
    p.add_argument("--frame_size", type=int, metavar="SIZE", default=64)
    p.add_argument("--size", type=int, metavar="SIZE", default=300)
    p.add_argument("--dt", type=float, metavar="DT", default=0.001)
    p.add_argument("--format", type=str, metavar="FMT", default="npz",
                   choices=("npz", "pt"), dest="fmt",
                   help="on-disk format: 'npz' (native) or 'pt' (the "
                        "reference generator's torch-pickle layout, "
                        "consumable by its WaveEq loaders directly)")
    from spatiotemporal_variable_separation_tpu.cli.options import (
        add_platform_arg,
        apply_platform,
    )

    # The RK4 integration runs on the default accelerator; --platform cpu
    # keeps a dataset build off the TPU while a training run holds it (on
    # the tunneled single-chip platform two concurrent device processes
    # risk wedging the tunnel, CLAUDE.md).
    add_platform_arg(p)
    args = p.parse_args(argv)
    apply_platform(args)

    from spatiotemporal_variable_separation_tpu.data.wave_eq import generate_dataset

    generate_dataset(args.data_dir, args.size, args.seq_len, args.frame_size,
                     args.dt, args.seed, fmt=args.fmt)


if __name__ == "__main__":
    main()
