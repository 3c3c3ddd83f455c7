"""Quickstart: forward model + single-star inference + derived posteriors.

Run from the repo root:  python examples/quickstart.py [--platform cpu]
"""

import argparse
import os
import sys

# allow running without installation (sys.path bootstrap to repo root)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default=None)
parser.add_argument("--models", default="synthetic", help="'mist' needs downloaded grids")
args = parser.parse_args()
if args.platform:
    import jax

    jax.config.update("jax_platforms", args.platform)

import numpy as np

import isochrones_tpu as itpu

# ---- build an interpolator ------------------------------------------------
kw = {} if args.models == "mist" else dict(n_feh=9, n_mass=48, n_eep=200, n_age=40)
iso = itpu.get_ichrone(args.models, **kw)

# ---- forward model: an isochrone table ------------------------------------
table = iso.isochrone(9.0, feh=0.0)
print(f"isochrone(9.0, 0.0): {len(table)} rows, columns like {list(table.columns[:6])}...")

# ---- synthesize a "star" and infer its parameters back ---------------------
truth = [120.0, 9.0, 0.0, 200.0, 0.1]  # (eep, age, feh, distance, AV)
Teff, logg, feh, mags = iso.interp_mag(truth, ["J", "H", "K"])
print(f"truth observables: Teff={Teff:.0f} logg={logg:.2f} J={mags[0]:.3f}")

model = itpu.SingleStarModel(
    iso,
    Teff=(Teff, 100.0),
    logg=(logg, 0.1),
    J=(float(mags[0]), 0.02),
    H=(float(mags[1]), 0.02),
    K=(float(mags[2]), 0.02),
    parallax=(5.0, 0.05),
    name="quickstart",
)

res = model.fit(n_live_points=300)  # on-device nested sampling
print(f"ln-evidence: {res.logz:.2f} +/- {res.logzerr:.2f} (ESS {res.ess:.0f})")
med = model.samples.median()
print("posterior medians:",
      {k: round(float(med[k]), 3) for k in ("eep", "age", "feh", "distance", "AV")})
print("derived quantities:", list(model.derived_samples.columns[:8]), "...")
print(f"posterior-predictive chi2/N: {float(model.posterior_predictive):.2f}")

# ---- dynamic nested sampling: cheap posterior-ESS targeting -----------------
# Static NS past the evidence criterion saturates posterior ESS; dynamic=True
# spends extra evaluations inside the posterior bulk instead (docs/samplers.md)
res_dyn = model.fit(n_live_points=300, dynamic=True, min_ess=3000, overwrite=True)
print(f"dynamic fit: ESS {res_dyn.ess:.0f} in {res_dyn.n_iter} iterations "
      f"({res_dyn.dynamic_rounds} posterior thread round(s)); "
      f"ln-evidence {res_dyn.logz:.2f} +/- {res_dyn.logzerr:.2f}")
