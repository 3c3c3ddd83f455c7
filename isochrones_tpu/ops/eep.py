"""Batched EEP (equivalent evolutionary phase) machinery.

Rebuild of the reference's ragged-track EEP inversion:

* ``interp_eep`` / ``interp_eeps`` (``isochrones/interp.py:488-568``): given
  (age, feh, mass), bisect into the 4 neighboring tracks' age arrays and
  bilinearly blend the 4 integer-resolution EEPs, with end-of-track
  neighbor-substitution. Here the binary search runs *in place* on the padded
  (n_feh*n_mass, n_eep) age matrix via a branchless fixed-step lower-bound
  loop that gathers one scalar per step — no row materialization, so the
  batch dimension can be millions of points without blowing HBM.
* ``get_eep_accurate`` (``isochrones/models.py:544-578``): the reference runs
  scipy Nelder-Mead per scalar point; here it is a vmapped Newton iteration on
  the age residual using JAX autodiff for the derivative — fully on-device.

Age matrices are padded with +inf beyond each track's end (the reference
passes explicit lengths to its numba searchsorted, interp.py:521-524); the
+inf padding makes the unrestricted lower-bound search equivalent.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .interp import GridData, find_cells_1d, interp_nd

__all__ = ["searchsorted_rows", "interp_eep", "get_eep_newton"]


def searchsorted_rows(flat_arrays: jnp.ndarray, row_idx: jnp.ndarray, x: jnp.ndarray, n_cols: int):
    """Batched lower-bound search: for each b, insertion index of ``x[b]`` in
    ``flat_arrays[row_idx[b]*n_cols : (row_idx[b]+1)*n_cols]``.

    Equivalent to the reference's ``searchsorted`` (interp.py:10-35) on
    strictly-increasing rows. Branchless fixed-step bisection: one scalar
    gather per step, ceil(log2(n_cols))+1 steps.
    """
    n_steps = max(1, int(math.ceil(math.log2(max(n_cols, 2)))) + 1)
    lo = jnp.zeros_like(row_idx, dtype=jnp.int32)
    hi = jnp.full_like(lo, n_cols)
    base = row_idx.astype(jnp.int32) * jnp.int32(n_cols)
    for _ in range(n_steps):
        mid = (lo + hi) // 2
        v = jnp.take(flat_arrays, base + mid, axis=0)
        pred = v < x
        lo = jnp.where(pred, mid + 1, lo)
        hi = jnp.where(pred, hi, mid)
    return lo


def interp_eep(
    ages: jnp.ndarray,
    fehs: jnp.ndarray,
    masses: jnp.ndarray,
    feh_knots: jnp.ndarray,
    mass_knots: jnp.ndarray,
    age_arrays: jnp.ndarray,  # (n_feh * n_mass, n_eep), +inf past track end
    lengths: jnp.ndarray,  # (n_feh * n_mass,)
    eep0: float = 1.0,
) -> jnp.ndarray:
    """Fast (integer-resolution) (age, feh, mass) -> EEP inversion.

    Vectorized rebuild of interp.py:502-558 with identical semantics:
    insertion index + ``eep0`` per corner track, end-of-track neighbor
    substitution applied sequentially (interp.py:540-551), bilinear blend in
    (feh, mass), NaN for NaN/out-of-bounds inputs and for queries past a
    full-length track (interp.py:527-528).
    """
    n_tracks, n_eep = age_arrays.shape
    n_mass = mass_knots.shape[0]
    n_feh = feh_knots.shape[0]

    c0, d0, oob0 = find_cells_1d(feh_knots, fehs)
    c1, d1, oob1 = find_cells_1d(mass_knots, masses)
    bad = (
        jnp.isnan(ages)
        | jnp.isnan(fehs)
        | jnp.isnan(masses)
        | oob0
        | oob1
    )

    c0p = jnp.clip(c0 + 1, 0, n_feh - 1)
    c1p = jnp.clip(c1 + 1, 0, n_mass - 1)
    ind_00 = c0 * n_mass + c1
    ind_01 = c0 * n_mass + c1p
    ind_10 = c0p * n_mass + c1
    ind_11 = c0p * n_mass + c1p

    flat = age_arrays.reshape(-1)
    i00 = searchsorted_rows(flat, ind_00, ages, n_eep)
    i01 = searchsorted_rows(flat, ind_01, ages, n_eep)
    i10 = searchsorted_rows(flat, ind_10, ages, n_eep)
    i11 = searchsorted_rows(flat, ind_11, ages, n_eep)

    # past the end of a FULL-length track -> NaN (interp.py:527-528)
    overflow = (i00 >= n_eep) | (i01 >= n_eep) | (i10 >= n_eep) | (i11 >= n_eep)
    bad = bad | overflow

    dt = ages.dtype
    e00 = i00.astype(dt) + eep0
    e01 = i01.astype(dt) + eep0
    e10 = i10.astype(dt) + eep0
    e11 = i11.astype(dt) + eep0

    inv00 = i00 >= jnp.take(lengths, ind_00)
    inv01 = i01 >= jnp.take(lengths, ind_01)
    inv10 = i10 >= jnp.take(lengths, ind_10)
    inv11 = i11 >= jnp.take(lengths, ind_11)

    # sequential neighbor substitution, matching interp.py:540-551 order
    e00 = jnp.where(inv00, e01, e00)
    e01 = jnp.where(inv01, e00, e01)
    e10 = jnp.where(inv10, e11, e10)
    e11 = jnp.where(inv11, e10, e11)

    eep_lo = (1.0 - d1) * e00 + d1 * e01
    eep_hi = (1.0 - d1) * e10 + d1 * e11
    out = (1.0 - d0) * eep_lo + d0 * eep_hi
    return jnp.where(bad, jnp.nan, out)


@partial(jax.jit, static_argnames=("i_age_col", "n_iter"))
def get_eep_newton(
    grid: GridData,
    eep_init: jnp.ndarray,
    targets: jnp.ndarray,  # target age (track grids) or mass (iso grids)
    x0: jnp.ndarray,  # first grid-axis coordinate (feh for tracks, age for isos)
    x1: jnp.ndarray,  # second grid-axis coordinate (mass for tracks, feh for isos)
    i_age_col: int,
    n_iter: int = 12,
) -> tuple:  # (eep, residual)
    """Accurate EEP inversion: vmapped damped-Newton refinement of the residual
    ``interp(x0, x1, eep)[col] - target`` seeded by the fast estimate.

    Replaces the reference's per-scalar scipy Nelder-Mead minimization of
    ``mass_age_resid`` (models.py:544-578, 684-688, 711-715) with an
    autodiff-Newton loop that stays on-device and vectorizes.
    """
    eep_knots = grid.knots[-1]
    eep_min = eep_knots[0]
    eep_max = eep_knots[-1]

    def resid(eep, a, b, target):
        pt = jnp.stack([a, b, eep])[None]
        return interp_nd(grid.values, grid.knots, pt, icols=(i_age_col,), axis_maps=grid.axis_maps)[0, 0] - target

    grad_fn = jax.grad(resid, argnums=0)

    # Coarse-scan fallback seed: evaluate the residual on a static EEP ladder
    # and take the finite point closest to zero — replaces the reference's
    # "try eep0 in [600, 200, 100]" NaN-dodging loop (models.py:557-565).
    n_scan = 33
    scan_eeps = jnp.linspace(eep_min, eep_max, n_scan)
    scan_r = jax.vmap(
        lambda e: jax.vmap(resid)(jnp.broadcast_to(e, targets.shape), x0, x1, targets)
    )(scan_eeps)  # (n_scan, B)
    scan_score = jnp.where(jnp.isfinite(scan_r), jnp.abs(scan_r), jnp.inf)
    best = jnp.argmin(scan_score, axis=0)
    scan_seed = scan_eeps[best]

    def body(_, eep):
        r = jax.vmap(resid)(eep, x0, x1, targets)
        g = jax.vmap(grad_fn)(eep, x0, x1, targets)
        step = r / jnp.where(g == 0, jnp.ones_like(g), g)
        step = jnp.clip(step, -32.0, 32.0)  # damping against huge derivative noise
        new = jnp.clip(eep - step, eep_min, eep_max)
        return jnp.where(jnp.isfinite(new), new, eep)

    eep = jnp.clip(eep_init, eep_min, eep_max)
    r_init = jax.vmap(resid)(jnp.nan_to_num(eep, nan=eep_min), x0, x1, targets)
    eep = jnp.where(jnp.isfinite(eep) & jnp.isfinite(r_init), eep, scan_seed)
    eep = jax.lax.fori_loop(0, n_iter, body, eep)
    final_r = jax.vmap(resid)(eep, x0, x1, targets)
    return jnp.where(jnp.isfinite(final_r), eep, jnp.nan), final_r
