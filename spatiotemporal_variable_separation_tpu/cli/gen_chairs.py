"""Chairs preprocessing CLI
(reference ``python -m var_sep.preprocessing.chairs.gen_chairs``)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="3D Warehouse chairs preprocessing",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_dir", type=str, metavar="DIR", required=True)
    p.add_argument("--image_size", type=int, metavar="SIZE", default=64)
    args = p.parse_args(argv)

    from spatiotemporal_variable_separation_tpu.data.chairs import preprocess_chairs

    preprocess_chairs(args.data_dir, args.image_size)


if __name__ == "__main__":
    main()
