"""Moving MNIST test-set generation CLI
(reference ``python -m var_sep.preprocessing.mnist.make_test_set``; the
README's module path ``var_sep.preprocessing.mmnist.make_test_set`` is a
documented typo).  Same seed -> identical latents/labels (vectorized)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="Moving MNIST testing set generation",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_dir", type=str, metavar="DIR", required=True)
    p.add_argument("--seq_len", type=int, metavar="LEN", default=100)
    p.add_argument("--seed", type=int, metavar="SEED", default=42)
    p.add_argument("--digits", type=int, metavar="NUM", default=2)
    p.add_argument("--frame_size", type=int, metavar="SIZE", default=64)
    p.add_argument("--max_speed", type=int, metavar="SPEED", default=4)
    p.add_argument("--n_seq", type=int, metavar="N", default=None,
                   help="Force the sequence count (default: corpus//digits, "
                        "the reference's 5,000 on real MNIST). Above the "
                        "default, digits wrap modulo the corpus — runs the "
                        "paper-scale protocol on the small stand-in corpus.")
    p.add_argument("--out_dir", type=str, metavar="DIR", default=None,
                   help="Write the npz here instead of data_dir (the file "
                        "name is fixed, so a paper-scale --n_seq set needs "
                        "its own directory to coexist with the canonical "
                        "one).")
    args = p.parse_args(argv)

    from spatiotemporal_variable_separation_tpu.data.moving_mnist import make_test_set

    path = make_test_set(args.data_dir, args.seq_len, args.seed, args.digits,
                         args.frame_size, args.max_speed, n_seq=args.n_seq,
                         out_dir=args.out_dir)
    print(f"Saved testset at {path}")


if __name__ == "__main__":
    main()
