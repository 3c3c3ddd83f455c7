"""``fit-catalog`` CLI: fit every star of a catalog table in one batched
XLA program (the single-chip alternative to ``batch-starfit``)."""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Fit all stars of a catalog simultaneously (batched ensembles)."
    )
    parser.add_argument("--platform", default=None, help="force a JAX platform (e.g. cpu)")
    parser.add_argument("catalog", help="CSV/HDF table with <band>_mag/_unc (+ prop/_unc) columns")
    parser.add_argument("--models", default="mist")
    parser.add_argument("--bands", nargs="*", default=None)
    parser.add_argument("--props", nargs="*", default=None,
                        help="non-photometric columns (Teff, logg, feh, parallax)")
    parser.add_argument("--method", choices=["mcmc", "nested"], default="mcmc",
                        help="'nested' also writes per-star log-evidences")
    parser.add_argument("--n-live-points", type=int, default=500, dest="n_live_points")
    parser.add_argument("--dynamic", action="store_true",
                        help="(nested) dynamic NS: posterior threads lift every star's ESS to target")
    parser.add_argument("--nwalkers", type=int, default=128)
    parser.add_argument("--nburn", type=int, default=500)
    parser.add_argument("--niter", type=int, default=100)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--output", "-O", default="catalog_fit.csv")
    # multi-host (DCN) fleet: each process fits a contiguous row shard and
    # writes <output>.partN (gather afterwards from the shared filesystem)
    parser.add_argument("--multihost", action="store_true")
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--num-processes", type=int, default=None, dest="num_processes")
    parser.add_argument("--process-id", type=int, default=None, dest="process_id")
    args = parser.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import pandas as pd

    from ..batch import fit_catalog
    from ..catalog import StarCatalog
    from ..isochrone import get_ichrone

    df = (
        pd.read_hdf(args.catalog)
        if str(args.catalog).endswith((".h5", ".hdf", ".hdf5"))
        else pd.read_csv(args.catalog)
    )

    output = args.output
    if args.multihost or args.coordinator is not None:
        from ..parallel.multihost import initialize_distributed, process_shard

        pid, nproc = initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        rows = process_shard(list(range(len(df))), pid, nproc)
        df = df.iloc[rows]
        output = f"{args.output}.part{pid}"
        print(f"[multihost] process {pid}/{nproc}: {len(df)} star(s) -> {output}")

    cat = StarCatalog(df, bands=args.bands, props=args.props)
    ic = get_ichrone(args.models, bands=list(cat.bands))
    _, summary = fit_catalog(
        ic, cat, method=args.method, nwalkers=args.nwalkers, nburn=args.nburn,
        niter=args.niter, n_live_points=args.n_live_points, seed=args.seed,
        dynamic=args.dynamic,
    )
    summary.to_csv(output)
    print(f"{len(cat)} stars fitted; per-star quantiles written to {output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
