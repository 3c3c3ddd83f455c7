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
    parser.add_argument("--nwalkers", type=int, default=128)
    parser.add_argument("--nburn", type=int, default=500)
    parser.add_argument("--niter", type=int, default=100)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--output", "-O", default="catalog_fit.csv")
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
    cat = StarCatalog(df, bands=args.bands, props=args.props)
    ic = get_ichrone(args.models, bands=list(cat.bands))
    _, summary = fit_catalog(
        ic, cat, nwalkers=args.nwalkers, nburn=args.nburn, niter=args.niter, seed=args.seed
    )
    summary.to_csv(args.output)
    print(f"{len(cat)} stars fitted; per-star quantiles written to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
