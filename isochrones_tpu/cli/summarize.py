"""``starfit-summarize`` CLI (reference scripts/starfit-summarize).

The reference uses schwimmbad for MPI/multiprocessing pools; summaries are
host-side file crunching, so a multiprocessing.Pool covers the role.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description="Summarize quantiles over many starfit results.")
    parser.add_argument("--platform", default=None, help="force a JAX platform (e.g. cpu); env vars are overridden in some TPU environments")
    parser.add_argument("names", nargs="*", help="star folder names (or use --listfile)")
    parser.add_argument("--listfile", default=None, help="file with one folder name per line")
    parser.add_argument("--rootdir", default=".")
    parser.add_argument("--modelname", default="mist_starmodel_single")
    parser.add_argument("--output", "-O", default="summary.csv")
    parser.add_argument("--ncores", type=int, default=1)
    parser.add_argument("--columns", nargs="*", default=["eep", "mass", "radius", "age", "feh", "distance", "AV"])
    args = parser.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    names = list(args.names)
    if args.listfile:
        with open(args.listfile) as f:
            names += [line.strip() for line in f if line.strip()]

    from ..summary import get_summary_df

    pool = None
    if args.ncores > 1:
        from multiprocessing import Pool

        pool = Pool(args.ncores)

    df = get_summary_df(
        names=names, pool=pool, rootdir=args.rootdir, modelname=args.modelname,
        columns=tuple(args.columns), filename=args.output,
    )
    if pool is not None:
        pool.close()
    print(df.head())
    return 0


if __name__ == "__main__":
    sys.exit(main())
