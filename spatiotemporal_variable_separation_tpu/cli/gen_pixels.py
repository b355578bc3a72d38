"""WaveEq-100 pixel-choice CLI
(reference ``python -m var_sep.preprocessing.wave.gen_pixels``; identical
seeds yield identical coordinates)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="WaveEq partial-observation pixel choice",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_dir", type=str, metavar="DIR", required=True)
    p.add_argument("--number", type=int, metavar="NUM", default=100)
    p.add_argument("--frame_size", type=int, metavar="SIZE", default=64)
    p.add_argument("--seed", type=int, metavar="SEED", default=42)
    args = p.parse_args(argv)

    from spatiotemporal_variable_separation_tpu.data.wave_eq import generate_pixels

    generate_pixels(args.data_dir, args.number, args.frame_size, args.seed)


if __name__ == "__main__":
    main()
