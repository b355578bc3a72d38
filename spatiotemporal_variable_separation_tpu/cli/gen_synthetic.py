"""Generate realistic-scale synthetic stand-in corpora (TaxiBJ / SST /
Chairs) in the reference's exact on-disk formats, for end-to-end recipe
validation where the real corpora cannot be downloaded.  See
``data/synthetic_corpora.py`` for what is and is not claimed about them."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(prog="varsep-tpu synthetic corpora")
    p.add_argument("corpus", choices=["taxibj", "sst", "chairs", "mnist"])
    p.add_argument("--data_dir", type=str, metavar="DIR", required=True)
    p.add_argument("--seed", type=int, metavar="SEED", default=0)
    p.add_argument("--days_per_year", type=int, default=120,
                   help="taxibj: days per h5 year file")
    p.add_argument("--n_days", type=int, default=1600, help="sst: days/zone")
    p.add_argument("--size", type=int, default=64,
                   help="sst: grid edge (64 = reference zones; 256 = "
                        "full-basin stretch)")
    p.add_argument("--zones", type=int, nargs="+", default=list(range(1, 30)))
    p.add_argument("--n_objects", type=int, default=200, help="chairs")
    args = p.parse_args(argv)

    from spatiotemporal_variable_separation_tpu.data import synthetic_corpora as sc

    if args.corpus == "taxibj":
        sc.make_taxibj(args.data_dir, args.days_per_year, args.seed)
    elif args.corpus == "sst":
        sc.make_sst(args.data_dir, args.zones, args.n_days, args.seed,
                    size=args.size)
    elif args.corpus == "mnist":
        sc.make_mnist_standin(args.data_dir, args.seed)
    else:
        sc.make_chairs(args.data_dir, args.n_objects, args.seed)
    print(f"synthetic {args.corpus} corpus written to {args.data_dir}")


if __name__ == "__main__":
    main()
