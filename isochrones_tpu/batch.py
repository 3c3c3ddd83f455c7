"""Batched many-star fitting — whole catalogs in one XLA program.

The reference scales fleets of independent single-star fits with SLURM job
arrays (``scripts/batch_starfit``) because each MultiNest fit is a serial
process. On TPU the natural axis of scale is the batch: this module stacks a
catalog's observations along a star axis and runs ONE jitted ensemble-MCMC
program over ``(n_stars, n_walkers)`` walkers — every star's posterior
advances in lockstep, the fused lnpost evaluates ``n_stars x n_walkers``
points per step, and the chip stays saturated. One compile serves the whole
catalog (per-star ``BasicStarModel`` closures would recompile per star).

Per-star observation values (and the parallax-derived distance bound,
reference starmodel.py:1465-1477) are data with a leading star axis; the
model structure (bands, prior families, parameterization) is shared.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .catalog import StarCatalog
from .logger import getLogger
from .ops.interp import interp_nd
from .ops.likelihood import LOG_ONE_OVER_ROOT_2PI
from .priors import AgePrior, AVPrior, EEP_prior, FehPrior

__all__ = ["BatchStarFitter", "fit_catalog"]

SPEC_PROPS = ("Teff", "logg", "feh")


class BatchStarFitter:
    """Fit every star of a catalog simultaneously (single-star models,
    isochrone parameterization: (eep, age, feh, distance, AV))."""

    param_names = ("eep", "age", "feh", "distance", "AV")

    def __init__(
        self,
        ic,
        catalog,
        bands: Optional[Sequence[str]] = None,
        halo_fraction: float = None,
        maxAV: float = 1.0,
        max_distance: float = 10000.0,
        eep_bounds=None,
    ):
        if ic.eep_replaces != "mass":
            raise ValueError("BatchStarFitter requires an isochrone-parameterized interpolator")
        if not isinstance(catalog, StarCatalog):
            catalog = StarCatalog(catalog)
        self.ic = ic
        self.catalog = catalog
        self.bands = list(bands) if bands is not None else list(catalog.bands)
        S = len(catalog)
        self.n_stars = S

        df = catalog.df
        self.mag_vals = np.stack([df[f"{b}_mag"].values for b in self.bands], axis=-1)
        self.mag_uncs = np.stack([df[f"{b}_mag_unc"].values for b in self.bands], axis=-1)
        self.spec_vals = np.full((S, 3), np.nan)
        self.spec_uncs = np.full((S, 3), np.nan)
        for j, p in enumerate(SPEC_PROPS):
            if p in catalog.props:
                self.spec_vals[:, j], self.spec_uncs[:, j] = catalog.get_measurement(p)
        if "parallax" in catalog.props:
            self.plax_vals, self.plax_uncs = (
                np.asarray(x, dtype=float) for x in catalog.get_measurement("parallax")
            )
        else:
            self.plax_vals = None
            self.plax_uncs = None

        # per-star distance upper bound (reference starmodel.py:1465-1477)
        if self.plax_vals is not None:
            self.max_distance = np.where(
                self.plax_vals > 0, 2000.0 / np.maximum(self.plax_vals, 1e-3), max_distance
            )
        else:
            self.max_distance = np.full(S, float(max_distance))

        # shared priors (the defaults of BasicStarModel, starmodel.py:1437-1445);
        # for isochrone grids the EEP prior converts from the MASS prior
        from .priors import ChabrierPrior

        self.priors = {
            "mass": ChabrierPrior(),
            "age": AgePrior(),
            "feh": FehPrior(**({"halo_fraction": halo_fraction} if halo_fraction is not None else {})),
            "AV": AVPrior(bounds=(0, maxAV)),
        }
        self.priors["mass"].bounds = ic.get_limits("mass")
        self.priors["age"].bounds = ic.get_limits("age")
        self.priors["feh"].bounds = ic.get_limits("feh")
        self.eep_bounds = tuple(eep_bounds) if eep_bounds is not None else tuple(ic.eep_bounds)
        self.priors["eep"] = EEP_prior(ic, self.priors["mass"], bounds=self.eep_bounds)

        self._samples = None
        self._lnpost = None

    # ------------------------------------------------------------- posterior
    def _build_lnpost(self):
        ic = self.ic
        io = tuple(ic._param_index_order)
        pack6 = ic.model_packed6
        bc = ic.bc
        band_icols = tuple(bc.column_index[b] for b in self.bands)
        spec_vals = jnp.asarray(self.spec_vals)[:, None, :]  # (S, 1, 3)
        spec_uncs = jnp.asarray(self.spec_uncs)[:, None, :]
        mag_vals = jnp.asarray(self.mag_vals)[:, None, :]  # (S, 1, nb)
        mag_uncs = jnp.asarray(self.mag_uncs)[:, None, :]
        has_plax = self.plax_vals is not None
        if has_plax:
            plax = jnp.asarray(self.plax_vals)[:, None]
            plax_unc = jnp.asarray(self.plax_uncs)[:, None]
        d_hi = jnp.asarray(self.max_distance)[:, None]  # (S, 1)
        priors = self.priors
        eep_lo, eep_hi = self.eep_bounds
        age_prior = priors["age"]
        mass_prior = priors["mass"]

        def lnpost(pars):
            # pars: (S, B, 5) = (eep, age, feh, distance, AV)
            user = [pars[..., i] for i in range(5)]
            grid_pts = jnp.stack([user[io[0]], user[io[1]], user[io[2]]], axis=-1)
            vals6 = interp_nd(
                pack6.values, pack6.knots, grid_pts, icols=(0, 1, 2, 3, 4, 5),
                axis_maps=pack6.axis_maps,
            )  # (S, B, 6)
            Teff, logg, feh_m, mbol, orig_val, deriv = (vals6[..., i] for i in range(6))

            bc_pts = jnp.stack([Teff, logg, feh_m, pars[..., 4]], axis=-1)
            bc_vals = interp_nd(bc.values, bc.knots, bc_pts, icols=band_icols, axis_maps=bc.axis_maps)
            dist_mod = 5.0 * jnp.log10(pars[..., 3] / 10.0)
            mags = mbol[..., None] + dist_mod[..., None] - bc_vals  # (S, B, nb)

            ll = jnp.zeros(pars.shape[:-1], dtype=pars.dtype)
            for k, model_val in enumerate((Teff, logg, feh_m)):
                resid = spec_vals[..., k] - model_val
                term = (
                    LOG_ONE_OVER_ROOT_2PI + jnp.log(spec_uncs[..., k])
                    - 0.5 * resid ** 2 / spec_uncs[..., k] ** 2
                )
                ll = ll + jnp.where(jnp.isnan(spec_vals[..., k]), 0.0, term)
            resid = mag_vals - mags
            ll = ll + jnp.sum(
                LOG_ONE_OVER_ROOT_2PI + jnp.log(mag_uncs) - 0.5 * resid ** 2 / mag_uncs ** 2,
                axis=-1,
            )
            if has_plax:
                r = plax - 1000.0 / pars[..., 3]
                ll = ll + LOG_ONE_OVER_ROOT_2PI + jnp.log(plax_unc) - 0.5 * r ** 2 / plax_unc ** 2

            # priors: shared families; per-star distance bound (alpha=2
            # power law from 0: ln p = ln 3 - 3 ln hi + 2 ln d)
            lnp = age_prior.lnpdf_jax(pars[..., 1])
            lnp = lnp + priors["feh"].lnpdf_jax(pars[..., 2])
            lnp = lnp + priors["AV"].lnpdf_jax(pars[..., 4])
            d = pars[..., 3]
            lnp_d = jnp.log(3.0) - 3.0 * jnp.log(d_hi) + 2.0 * jnp.log(jnp.maximum(d, 1e-300))
            lnp = lnp + jnp.where((d > 0) & (d < d_hi), lnp_d, -jnp.inf)
            # change of variables: p(eep) = p_mass(m(eep)) |dm/dEEP|
            eep_term = mass_prior.lnpdf_jax(orig_val) + jnp.log(jnp.maximum(deriv, 1e-300))
            eep_term = jnp.where(jnp.isfinite(orig_val) & (deriv > 0), eep_term, -jnp.inf)
            eep_term = jnp.where((pars[..., 0] < eep_lo) | (pars[..., 0] > eep_hi), -jnp.inf, eep_term)
            lnp = lnp + eep_term

            ll = jnp.where(jnp.isnan(ll), -jnp.inf, ll)
            return jnp.where(jnp.isfinite(lnp), lnp + ll, -jnp.inf)

        return lnpost

    @property
    def lnpost_batch(self):
        """Jitted (S, B, 5) -> (S, B) fused posterior over all stars."""
        if self._lnpost is None:
            self._lnpost = jax.jit(self._build_lnpost())
        return self._lnpost

    # --------------------------------------------------------------- sampling
    def sample_p0(self, n_walkers, rng=None, max_rounds=50):
        """(S, W, 5) prior draws, rejection-refined to finite lnpost."""
        rng = np.random.default_rng(rng)
        S, W = self.n_stars, n_walkers

        def draw():
            age = self.priors["age"].sample(S * W, rng=rng)
            feh = self.priors["feh"].sample(S * W, rng=rng)
            AV = self.priors["AV"].sample(S * W, rng=rng)
            u = rng.random(S * W)
            d = (u ** (1.0 / 3.0)) * np.repeat(self.max_distance, W)  # CDF^-1 of d^2
            eep = self.priors["eep"].sample(S * W, rng=rng, age=age, feh=feh)  # iso: conditioned on (age, feh)
            return np.stack([eep, age, feh, d, AV], axis=-1).reshape(S, W, 5)

        p0 = draw()
        lnp = np.asarray(self.lnpost_batch(jnp.asarray(p0)))
        bad = ~np.isfinite(lnp)
        rounds = 0
        while bad.any() and rounds < max_rounds:
            fresh = draw()
            p0 = np.where(bad[..., None], fresh, p0)
            lnp = np.asarray(self.lnpost_batch(jnp.asarray(p0)))
            bad = ~np.isfinite(lnp)
            rounds += 1
        if bad.any():
            getLogger().warning("%d walkers still invalid after %d rounds", bad.sum(), rounds)
        return p0

    def fit_mcmc(self, nwalkers=128, nburn=500, niter=100, thin=1, seed=None):
        """One jitted program advancing every star's ensemble in lockstep.

        Returns samples of shape (n_stars, kept_steps * n_walkers, 5)."""
        from .samplers.ensemble import run_ensemble_batch

        p0 = jnp.asarray(self.sample_p0(nwalkers, rng=seed))
        key = jax.random.PRNGKey(seed if seed is not None else 0)
        key, k_burn = jax.random.split(key)
        _, _, state = run_ensemble_batch(self.lnpost_batch, p0, k_burn, n_steps=nburn)
        chain, ln_chain, state = run_ensemble_batch(
            self.lnpost_batch, state[1], state[0], n_steps=niter, thin=thin
        )
        # (T, S, W, P) -> (S, T*W, P)
        chain = np.asarray(chain)
        ln_chain = np.asarray(ln_chain)
        T = chain.shape[0]
        samples = np.moveaxis(chain, 0, 1).reshape(self.n_stars, T * chain.shape[2], 5)
        lnp = np.moveaxis(ln_chain, 0, 1).reshape(self.n_stars, -1)
        self._samples = samples
        self._lnprob = lnp
        return samples

    @property
    def samples(self):
        if self._samples is None:
            raise AttributeError("No samples yet; run .fit_mcmc()")
        return self._samples

    def summary(self, qs=(0.16, 0.5, 0.84)):
        """Per-star quantile table (the starfit-summarize product)."""
        import pandas as pd

        rows = {}
        for i, p in enumerate(self.param_names):
            quants = np.quantile(self.samples[:, :, i], qs, axis=1)
            for q, arr in zip(qs, quants):
                rows[f"{p}_{q * 100:02.0f}"] = arr
        df = pd.DataFrame(rows)
        df.index = self.catalog.df.index
        return df


def fit_catalog(ic, catalog, nwalkers=128, nburn=500, niter=100, seed=None, **kwargs):
    """Convenience: fit every star of ``catalog`` at once; returns
    (BatchStarFitter, per-star quantile summary)."""
    fitter = BatchStarFitter(ic, catalog, **kwargs)
    fitter.fit_mcmc(nwalkers=nwalkers, nburn=nburn, niter=niter, seed=seed)
    return fitter, fitter.summary()
