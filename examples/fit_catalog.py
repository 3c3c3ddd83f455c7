"""Batched catalog fitting: every star of a catalog in ONE XLA program.

Run from the repo root:  python examples/fit_catalog.py [--platform cpu] [-n 64]
"""

import argparse
import os
import sys

# allow running without installation (sys.path bootstrap to repo root)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None)
parser.add_argument("-n", "--n_stars", type=int, default=64)
args = parser.parse_args()
if args.platform:
    import jax

    jax.config.update("jax_platforms", args.platform)

import time

import numpy as np
import pandas as pd

from isochrones_tpu import get_ichrone
from isochrones_tpu.batch import fit_catalog
from isochrones_tpu.catalog import StarCatalog

iso = get_ichrone("synthetic", n_feh=9, n_mass=48, n_eep=200, n_age=40)
S = args.n_stars
rng = np.random.default_rng(0)
truth = dict(
    eep=rng.uniform(40, 160, S), age=rng.uniform(8.2, 9.6, S),
    feh=rng.uniform(-0.5, 0.3, S), distance=rng.uniform(100, 800, S),
    AV=rng.uniform(0, 0.3, S),
)
bands = ["J", "H", "K"]
Teff, logg, _, mags = iso.interp_mag(
    [truth["eep"], truth["age"], truth["feh"], truth["distance"], truth["AV"]], bands
)
mags = np.asarray(mags)
rows = {f"{b}_mag": mags[:, i] + rng.normal(0, 0.02, S) for i, b in enumerate(bands)}
rows.update({f"{b}_mag_unc": np.full(S, 0.02) for b in bands})
rows["Teff"] = np.asarray(Teff) + rng.normal(0, 50, S)
rows["Teff_unc"] = np.full(S, 80.0)
rows["logg"] = np.asarray(logg) + rng.normal(0, 0.03, S)
rows["logg_unc"] = np.full(S, 0.05)
rows["parallax"] = 1000.0 / truth["distance"]
rows["parallax_unc"] = np.full(S, 0.05)
cat = StarCatalog(pd.DataFrame(rows), bands=bands, props=("Teff", "logg", "parallax"))

t0 = time.time()
fitter, summary = fit_catalog(iso, cat, nwalkers=128, nburn=500, niter=100, seed=1)
dt = time.time() - t0
print(f"{S} stars fitted in {dt:.1f}s ({dt / S * 1000:.0f} ms/star)")
err_d = np.abs(summary["distance_50"].values - truth["distance"])
print(f"distance recovery: median |err| = {np.median(err_d):.1f} pc")
print(summary.head())
