"""Fused star log-likelihood kernel.

Rebuild of ``isochrones/likelihood.py:10-147`` (``gauss_lnprob``,
``star_lnlike``): unpack the N-component parameter vector (5/6/7 parameters
for single/binary/triple, likelihood.py:43-54), evaluate all component
magnitudes with ONE batched fused interp_mag (the reference chains 1-3 scalar
calls), flux-sum the component mags, and accumulate Gaussian log-likelihoods
over spectroscopy (Teff, logg, feh; NaN observation = skip,
likelihood.py:127-140) and photometry bands.

The Gaussian constant is ``log(1/sqrt(2 pi)) + log(unc)`` — reproducing the
reference's sign quirk at likelihood.py:13 exactly (it is constant w.r.t.
parameters, hence posterior-shape neutral, but must match for parity tests).

Designed to be vmapped/sharded across walkers and live points: `pars` takes an
arbitrary leading batch shape.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

from .interp import GridData
from .mags import interp_mag

__all__ = ["LOG_ONE_OVER_ROOT_2PI", "gauss_lnprob", "star_lnlike", "stack_components"]

LOG_ONE_OVER_ROOT_2PI = math.log(1.0 / math.sqrt(2.0 * math.pi))


def gauss_lnprob(val, unc, model_val):
    """reference: likelihood.py:10-13 (constant-sign quirk preserved)."""
    resid = val - model_val
    return LOG_ONE_OVER_ROOT_2PI + jnp.log(unc) - 0.5 * resid * resid / (unc * unc)


def stack_components(pars: jnp.ndarray, n_stars: int) -> jnp.ndarray:
    """(..., N+4) parameter vector -> (..., N, 5) per-component parameter rows.

    Components share the trailing 4 parameters (age/feh-like, distance, AV);
    the leading N are per-component (EEPs, or masses for track grids) —
    reference unpacking at likelihood.py:43-54.
    """
    shared = pars[..., n_stars:]
    comps = [
        jnp.concatenate([pars[..., i : i + 1], shared], axis=-1) for i in range(n_stars)
    ]
    return jnp.stack(comps, axis=-2)


def star_lnlike(
    pars: jnp.ndarray,
    index_order: Tuple[int, ...],
    spec_vals: jnp.ndarray,
    spec_uncs: jnp.ndarray,
    mag_vals: jnp.ndarray,
    mag_uncs: jnp.ndarray,
    model: GridData,
    model_icols: Tuple[int, int, int, int],
    bc: GridData,
    band_icols: Tuple[int, ...],
    n_stars: int = None,
):
    """Fused single/binary/triple star log-likelihood (likelihood.py:16-147).

    pars : (..., N+4) with N in {1, 2, 3} (5/6/7 parameters).
    spec_vals, spec_uncs : (3,) observed (Teff, logg, feh); NaN = missing.
    mag_vals, mag_uncs : (n_bands,) observed magnitudes.
    band_icols : static band column indices into the BC grid (may be empty).

    Returns lnlike with the leading batch shape of ``pars``.
    """
    n_pars = pars.shape[-1]
    if n_stars is None:
        n_stars = n_pars - 4
    comp_pars = stack_components(pars, n_stars)  # (..., N, 5)

    Teffs, loggs, fehs, comp_mags = interp_mag(
        comp_pars, index_order, model, model_icols, bc, band_icols
    )
    Teff = Teffs[..., 0]
    logg = loggs[..., 0]
    feh = fehs[..., 0]

    if n_stars == 1:
        mags = comp_mags[..., 0, :]
    else:
        flux = 10.0 ** (-0.4 * comp_mags)
        mags = -2.5 * jnp.log10(jnp.sum(flux, axis=-2))

    lnlike = jnp.zeros(pars.shape[:-1], dtype=pars.dtype)
    for k, model_val in enumerate((Teff, logg, feh)):
        val = spec_vals[k]
        unc = spec_uncs[k]
        # double-where (NaN-safe gradient): a missing observable is encoded
        # as val = NaN, and `where(isnan(val), 0, gauss_lnprob(NaN, ...))`
        # masks only the FORWARD value — reverse-mode still multiplies the
        # (zero) cotangent into d(term)/d(model_val) = NaN, poisoning the
        # gradient of every parameter the interpolated model_val depends
        # on. (Round-4 diagnosis: this single NaN made the whole lnpost
        # gradient NaN whenever any spectroscopic channel was absent, so
        # _safe_value_and_grad zeroed the force and NUTS ran ballistic.)
        # Substitute a finite dummy INSIDE the term before masking.
        missing = jnp.isnan(val) | jnp.isnan(unc)
        safe_val = jnp.where(missing, model_val, val)
        safe_unc = jnp.where(missing, jnp.ones_like(unc), unc)
        term = gauss_lnprob(safe_val, safe_unc, model_val)
        lnlike = lnlike + jnp.where(missing, jnp.zeros_like(term), term)

    if len(band_icols):
        mag_terms = gauss_lnprob(mag_vals, mag_uncs, mags)
        lnlike = lnlike + jnp.sum(mag_terms, axis=-1)

    return lnlike
