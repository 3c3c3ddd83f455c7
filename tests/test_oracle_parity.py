"""Executed-agreement parity tests: every L0 kernel (SURVEY §2.1) vs the
pure-numpy transliteration of the reference numba kernels
(``tests/reference_oracle.py``).

Randomized synthetic grids (NaN holes, mixed axis kinds exercising every
``axis_maps`` fast path) + adversarial query points (exact knots incl.
bottom/top, out-of-bounds, NaN coordinates, end-of-track ages). f64
tolerance 1e-10. Carve-outs for reference UB are documented in the oracle
module docstring.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
import pytest

from isochrones_tpu.ops.interp import (
    GridData,
    compute_axis_maps,
    find_cells_1d,
    interp_nd,
)
from isochrones_tpu.ops.eep import interp_eep
from isochrones_tpu.ops.mags import interp_mag
from isochrones_tpu.ops.likelihood import gauss_lnprob, star_lnlike
from isochrones_tpu.ops.rootfind import find_closest_grid
from isochrones_tpu.ops.cluster import calc_lnlike_grid, integrate_over_eeps
from isochrones_tpu import utils
from isochrones_tpu import eep_fit
from isochrones_tpu.priors import powerlaw_lnpdf, powerlaw_pdf

import reference_oracle as ref

RNG = np.random.default_rng(20260816)
ATOL = 1e-10
RTOL = 1e-10


def _assert_close(a, b, atol=ATOL, rtol=RTOL, msg=""):
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    assert a.shape == b.shape, f"{msg}: shape {a.shape} vs {b.shape}"
    nan_a = np.isnan(a)
    nan_b = np.isnan(b)
    mismatch_nan = nan_a ^ nan_b
    assert not mismatch_nan.any(), f"{msg}: NaN pattern mismatch at {np.argwhere(mismatch_nan)[:5]}"
    ok = np.isclose(a, b, atol=atol, rtol=rtol, equal_nan=True)
    assert ok.all(), f"{msg}: max abs diff {np.nanmax(np.abs(a - b))} at {np.argwhere(~ok)[:5]}"


# ---------------------------------------------------------------------------
# grid + point fixtures
# ---------------------------------------------------------------------------


def _make_knots(n, kind, rng):
    """One axis of each ``axis_maps`` kind."""
    if kind == "exact_affine":
        return 1.0 + np.arange(n, dtype=float) * 0.5  # integer-exact ladder (EEP-like)
    if kind == "affine":
        base = np.linspace(0.1, 3.7, n)
        return base + rng.normal(scale=1e-9, size=n).cumsum() * 0  # uniform, not bit-ladder
    if kind == "log":
        return np.exp(np.linspace(math.log(0.5), math.log(40.0), n))
    if kind == "compare":
        k = np.sort(rng.uniform(-2.0, 5.0, size=n))
        k += np.arange(n) * 1e-6  # strictly increasing
        return k
    raise ValueError(kind)


def _make_grid(ndim, rng, nan_frac=0.08, ncols=3):
    kinds = ["exact_affine", "compare", "log", "affine"][:ndim]
    sizes = [7, 9, 6, 5][:ndim]
    knots = [_make_knots(n, k, rng) for n, k in zip(sizes, kinds)]
    shape = tuple(sizes) + (ncols,)
    values = rng.normal(size=shape) * 10.0
    holes = rng.uniform(size=shape[:-1]) < nan_frac
    values[holes] = np.nan
    return values, knots


def _adversarial_points(knots, rng, n_random=160):
    """Interior randoms + exact knots (incl. bottom/top) + OOB + NaN coords."""
    ndim = len(knots)
    los = np.array([k[0] for k in knots])
    his = np.array([k[-1] for k in knots])

    pts = [rng.uniform(los, his, size=(n_random, ndim))]

    # exact knot combos (hits the exact-match branch in every dim at once)
    for _ in range(40):
        pts.append(np.array([[rng.choice(k) for k in knots]]))
    # bottom/top corners
    pts.append(los[None, :])
    pts.append(his[None, :])
    # exact knot in one dim, random elsewhere
    for d in range(ndim):
        p = rng.uniform(los, his, size=(20, ndim))
        p[:, d] = rng.choice(knots[d], size=20)
        pts.append(p)
    # out of bounds each side, one dim at a time
    for d in range(ndim):
        for delta in (-0.5, +0.5):
            p = rng.uniform(los, his, size=(3, ndim))
            p[:, d] = (los[d] if delta < 0 else his[d]) + delta
            pts.append(p)
    # NaN coordinates
    for d in range(ndim):
        p = rng.uniform(los, his, size=(2, ndim))
        p[:, d] = np.nan
        pts.append(p)
    # points epsilon-near knots (fp-rounding stress for the analytic maps)
    p = rng.uniform(los, his, size=(30, ndim))
    for d in range(ndim):
        idx = rng.integers(1, len(knots[d]) - 1, size=30)
        p[:, d] = knots[d][idx] * (1 + rng.choice([-1, 1], size=30) * 1e-14)
    pts.append(np.clip(p, los, his))

    return np.concatenate(pts, axis=0)


# ---------------------------------------------------------------------------
# §2.1 binary search / cell location: find_cells_1d vs ref_searchsorted
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kind", ["exact_affine", "compare", "log", "affine", None])
def test_find_cells_1d_vs_reference_searchsorted(kind):
    rng = np.random.default_rng(11)
    knots = _make_knots(17, kind or "compare", rng)
    amap = compute_axis_maps([knots])[0] if kind else None
    if kind:
        assert amap is not None and amap[0] == kind, f"axis map detection: {amap} != {kind}"

    xs = np.concatenate(
        [rng.uniform(knots[0], knots[-1], size=300), knots, knots[:1] - 1, knots[-1:] + 1]
    )
    cells, ts, oobs = find_cells_1d(jnp.asarray(knots), jnp.asarray(xs), axis_map=amap)
    cells, ts, oobs = np.asarray(cells), np.asarray(ts), np.asarray(oobs)

    for x, cell, t, oob in zip(xs, cells, ts, oobs):
        ref_oob = x < knots[0] or x > knots[-1]
        assert bool(oob) == ref_oob, f"oob mismatch at x={x}"
        if ref_oob:
            continue
        ix, eq = ref.ref_searchsorted(knots, x)
        if eq:
            # exact match: reference indexes cell=ix with weight 0 on the
            # upper corner; the analytic maps may park the point one cell
            # lower with t==1 — identical lerp value. Accept either.
            lo_val = knots[cell] * (1 - t) + knots[min(cell + 1, len(knots) - 1)] * t
            assert abs(lo_val - x) < 1e-9, f"exact-knot cell mismatch at x={x}: cell={cell}, t={t}"
        else:
            ref_cell = ix - 1
            ref_t = (x - knots[ref_cell]) / (knots[ref_cell + 1] - knots[ref_cell])
            assert cell == ref_cell, f"cell mismatch at x={x}: {cell} != {ref_cell}"
            assert abs(t - ref_t) < 1e-9


# ---------------------------------------------------------------------------
# §2.1 interp_value(s)_{2,3,4}d vs interp_nd
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ndim", [2, 3, 4])
@pytest.mark.parametrize("use_axis_maps", [False, True])
def test_interp_nd_vs_reference(ndim, use_axis_maps):
    rng = np.random.default_rng(100 + ndim)
    values, knots = _make_grid(ndim, rng)
    pts = _adversarial_points(knots, rng)

    icols_cases = [tuple(range(values.shape[-1])), (1,), (2, 0)]
    amaps = compute_axis_maps(knots) if use_axis_maps else None
    for icols in icols_cases:
        got = np.asarray(
            interp_nd(
                jnp.asarray(values),
                [jnp.asarray(k) for k in knots],
                jnp.asarray(pts),
                icols=icols,
                axis_maps=amaps,
            )
        )
        want = ref.ref_interp_values(pts, values, list(icols), knots)
        _assert_close(got, want, msg=f"interp ndim={ndim} icols={icols} maps={use_axis_maps}")


# ---------------------------------------------------------------------------
# §2.1 interp_eep(s) vs batched interp_eep
# ---------------------------------------------------------------------------


def test_interp_eep_vs_reference():
    rng = np.random.default_rng(77)
    n_feh, n_mass, n_eep = 5, 8, 30
    feh_knots = np.linspace(-2.0, 0.5, n_feh)
    mass_knots = np.exp(np.linspace(math.log(0.3), math.log(4.0), n_mass))
    n_rows = n_feh * n_mass

    lengths = rng.integers(8, n_eep + 1, size=n_rows)
    age_nan = np.full((n_rows, n_eep), np.nan)  # reference layout (NaN pad)
    for r in range(n_rows):
        L = lengths[r]
        ages = np.sort(rng.uniform(6.0, 10.3, size=L))
        ages += np.arange(L) * 1e-9  # strictly increasing
        age_nan[r, :L] = ages
    age_inf = np.where(np.isnan(age_nan), np.inf, age_nan)  # rebuild layout (+inf pad)
    weight_arrays = np.abs(rng.normal(size=(n_rows, n_eep))) + 0.1

    # adversarial queries: interior, exact interior knots, short-track
    # past-end ages (substitution), full-track past-end ages (NaN), OOB, NaN
    n = 400
    ages_q = rng.uniform(5.5, 10.8, size=n)
    fehs_q = rng.uniform(feh_knots[0], feh_knots[-1], size=n)
    mass_q = rng.uniform(mass_knots[0], mass_knots[-2], size=n)  # avoid top-mass carve-out
    fehs_q[:30] = rng.choice(feh_knots[:-1], size=30)  # exact interior feh knots
    mass_q[30:60] = rng.choice(mass_knots[:-1], size=30)
    ages_q[60:90] = rng.choice(age_nan[0, : lengths[0]], size=30)  # exact age matches
    fehs_q[90:95] = feh_knots[0] - 1.0  # OOB
    mass_q[95:100] = mass_knots[-1] + 1.0
    ages_q[100:103] = np.nan
    fehs_q[103:106] = np.nan
    mass_q[106:109] = np.nan

    got = np.asarray(
        interp_eep(
            jnp.asarray(ages_q),
            jnp.asarray(fehs_q),
            jnp.asarray(mass_q),
            jnp.asarray(feh_knots),
            jnp.asarray(mass_knots),
            jnp.asarray(age_inf),
            jnp.asarray(lengths),
        )
    )
    want = ref.ref_interp_eeps(
        ages_q, fehs_q, mass_q, feh_knots, mass_knots, n_mass, age_nan, weight_arrays, lengths
    )
    _assert_close(got, want, msg="interp_eep")


# ---------------------------------------------------------------------------
# §2.1 interp_mag(s) vs fused interp_mag
# ---------------------------------------------------------------------------


def _mag_fixture(rng, nan_frac=0.05):
    """3-d model grid (feh, mass, eep) with physical-ish Teff/logg/feh/Mbol
    columns + 4-d BC grid covering their ranges. index_order = (2, 0, 1, 3, 4)
    maps user pars (mass, eep, feh, d, AV) -> grid (feh, mass, eep)."""
    feh_k = np.linspace(-2.0, 0.5, 6)
    mass_k = np.exp(np.linspace(math.log(0.4), math.log(3.0), 7))
    eep_k = 1.0 + np.arange(20) * 25.0  # exact_affine
    F, M, E = np.meshgrid(feh_k, mass_k, eep_k, indexing="ij")
    Teff = 4000 + 900 * M + 2.0 * E + 150 * F
    logg = 4.8 - 0.001 * E - 0.2 * np.log(M)
    feh_s = F * 0.95
    Mbol = 6.0 - 4.5 * np.log(M) + 0.002 * E
    model_vals = np.stack([Teff, logg, feh_s, Mbol], axis=-1)
    holes = rng.uniform(size=model_vals.shape[:-1]) < nan_frac
    model_vals[holes] = np.nan
    model_knots = [feh_k, mass_k, eep_k]

    teff_k = np.linspace(2500.0, 9000.0, 12)
    logg_k = np.linspace(2.0, 6.0, 8)
    fehb_k = np.linspace(-2.5, 1.0, 6)
    av_k = np.linspace(0.0, 2.0, 5)
    T, G, Fb, A = np.meshgrid(teff_k, logg_k, fehb_k, av_k, indexing="ij")
    n_bands = 3
    bc_vals = np.stack(
        [0.1 * b - 1e-4 * (T - 5800) + 0.05 * G + 0.02 * Fb - 0.3 * A * (1 + 0.1 * b) for b in range(n_bands)],
        axis=-1,
    )
    bc_knots = [teff_k, logg_k, fehb_k, av_k]

    model = GridData(
        values=jnp.asarray(model_vals),
        knots=tuple(jnp.asarray(k) for k in model_knots),
        columns=("Teff", "logg", "feh", "Mbol"),
        axis_maps=compute_axis_maps(model_knots),
    )
    bc = GridData(
        values=jnp.asarray(bc_vals),
        knots=tuple(jnp.asarray(k) for k in bc_knots),
        columns=("a", "b", "c"),
        axis_maps=compute_axis_maps(bc_knots),
    )
    return model, model_vals, model_knots, bc, bc_vals, bc_knots


def _mag_pars(rng, n, include_bad=True):
    """(n, 5) user pars (mass, eep, feh, distance, AV)."""
    pars = np.column_stack(
        [
            rng.uniform(0.45, 2.9, size=n),
            rng.uniform(2.0, 470.0, size=n),
            rng.uniform(-1.9, 0.45, size=n),
            rng.uniform(10.0, 1000.0, size=n),
            rng.uniform(0.0, 1.9, size=n),
        ]
    )
    if include_bad:
        pars[0, 0] = np.nan  # NaN coordinate
        pars[1, 2] = -5.0  # OOB feh
        pars[2, 1] = 1e4  # OOB eep
    return pars


def test_interp_mag_vs_reference():
    rng = np.random.default_rng(55)
    model, model_vals, model_knots, bc, bc_vals, bc_knots = _mag_fixture(rng)
    index_order = (2, 0, 1, 3, 4)
    pars = _mag_pars(rng, 300)

    Teff, logg, feh, mags = interp_mag(
        jnp.asarray(pars), index_order, model, (0, 1, 2, 3), bc, (0, 1, 2)
    )
    rTeff, rlogg, rfeh, rmags = ref.ref_interp_mags(
        pars.T, index_order, model_vals, (0, 1, 2, 3), model_knots, bc_vals, [0, 1, 2], bc_knots
    )
    _assert_close(np.asarray(Teff), rTeff, msg="interp_mag Teff")
    _assert_close(np.asarray(logg), rlogg, msg="interp_mag logg")
    _assert_close(np.asarray(feh), rfeh, msg="interp_mag feh")
    _assert_close(np.asarray(mags), rmags, msg="interp_mag mags")


# ---------------------------------------------------------------------------
# §2.1 star_lnlike / gauss_lnprob vs fused star_lnlike
# ---------------------------------------------------------------------------


def test_gauss_lnprob_vs_reference():
    rng = np.random.default_rng(3)
    for _ in range(50):
        val, unc, mv = rng.normal(), abs(rng.normal()) + 0.01, rng.normal()
        got = float(gauss_lnprob(jnp.float64(val), jnp.float64(unc), jnp.float64(mv)))
        want = ref.ref_gauss_lnprob(val, unc, mv)
        assert abs(got - want) < 1e-12


@pytest.mark.parametrize("n_pars", [5, 6, 7])
@pytest.mark.parametrize("spec_mask", [(False, False, False), (True, False, True), (True, True, True)])
def test_star_lnlike_vs_reference(n_pars, spec_mask):
    rng = np.random.default_rng(900 + n_pars)
    model, model_vals, model_knots, bc, bc_vals, bc_knots = _mag_fixture(rng, nan_frac=0.03)
    index_order = (2, 0, 1, 3, 4)
    n_stars = n_pars - 4

    n = 120
    base = _mag_pars(rng, n)
    extra = [rng.uniform(0.45, 2.9, size=(n, 1)) for _ in range(n_stars - 1)]
    pars = np.concatenate([base[:, :1]] + extra + [base[:, 1:]], axis=1)  # (n, n_pars)

    spec_vals = np.array([5600.0, 4.3, -0.2])
    spec_vals[list(spec_mask)] = np.nan
    spec_uncs = np.array([80.0, 0.1, 0.08])
    mag_vals = np.array([10.1, 9.8, 9.5])
    mag_uncs = np.array([0.02, 0.03, 0.05])

    got = np.asarray(
        star_lnlike(
            jnp.asarray(pars),
            index_order,
            jnp.asarray(spec_vals),
            jnp.asarray(spec_uncs),
            jnp.asarray(mag_vals),
            jnp.asarray(mag_uncs),
            model,
            (0, 1, 2, 3),
            bc,
            (0, 1, 2),
        )
    )
    want = np.array(
        [
            ref.ref_star_lnlike(
                p, index_order, spec_vals, spec_uncs, mag_vals, mag_uncs, [0, 1, 2],
                model_vals, (0, 1, 2, 3), model_knots, bc_vals, bc_knots,
            )
            for p in pars
        ]
    )
    _assert_close(got, want, atol=1e-9, rtol=1e-9, msg=f"star_lnlike n_pars={n_pars}")


# ---------------------------------------------------------------------------
# §2.1 find_closest3 vs find_closest_grid (root find along grid axis)
# ---------------------------------------------------------------------------


def test_find_closest_vs_reference():
    rng = np.random.default_rng(42)
    # 3-d grid with a strictly monotone column along axis 2
    k0 = np.linspace(-1.0, 1.0, 5)
    k1 = np.linspace(0.5, 2.0, 6)
    k2 = np.linspace(0.0, 100.0, 40)
    A, B, C = np.meshgrid(k0, k1, k2, indexing="ij")
    col = 0.5 * A + 0.3 * B + 0.04 * C + 0.0005 * C ** 2  # monotone in C
    values = np.stack([col, col * 0 + 1.0], axis=-1)
    knots = [k0, k1, k2]
    grid = GridData(
        values=jnp.asarray(values),
        knots=tuple(jnp.asarray(k) for k in knots),
        columns=("m", "one"),
        axis_maps=compute_axis_maps(knots),
    )

    newton_tol = 0.01
    for _ in range(25):
        v1 = rng.uniform(-0.9, 0.9)
        v2 = rng.uniform(0.6, 1.9)
        x_true = rng.uniform(5.0, 95.0)
        val = float(ref.ref_interp_value((v1, v2, x_true), values, [0], knots)[0])
        got = float(find_closest_grid(grid, val, 0.0, 100.0, v1, v2, 0))
        want = ref.ref_find_closest3(val, 0.0, 100.0, v1, v2, values, 0, knots)
        # both must solve to newton_tol; iteration paths may differ slightly
        rg = float(ref.ref_interp_value((v1, v2, got), values, [0], knots)[0]) - val
        rw = float(ref.ref_interp_value((v1, v2, want), values, [0], knots)[0]) - val
        assert abs(rg) <= newton_tol + 1e-9, f"repo residual {rg}"
        assert abs(rw) <= newton_tol + 1e-9, f"oracle residual {rw}"
        assert abs(got - want) < 0.5

    # same-sign bracket -> NaN in both
    got = float(find_closest_grid(grid, -100.0, 0.0, 100.0, 0.0, 1.0, 0))
    want = ref.ref_find_closest3(-100.0, 0.0, 100.0, 0.0, 1.0, values, 0, knots)
    assert math.isnan(got) and (want != want)


# ---------------------------------------------------------------------------
# §2.1 math utils: fast_addmags / trapz / polyval
# ---------------------------------------------------------------------------


def test_math_utils_vs_reference():
    rng = np.random.default_rng(5)
    for _ in range(20):
        mags = rng.uniform(5, 15, size=rng.integers(2, 5))
        assert abs(utils.fast_addmags(mags) - ref.ref_fast_addmags(mags)) < 1e-12
        assert abs(float(utils.addmags_jnp(jnp.asarray(mags))) - ref.ref_fast_addmags(mags)) < 1e-12

        x = np.sort(rng.uniform(0, 10, size=12))
        y = rng.normal(size=12)
        assert abs(float(utils.trapz(y, x)) - ref.ref_trapz(y, x)) < 1e-10

        p = rng.normal(size=5)
        xv = rng.normal()
        assert abs(float(utils.polyval(p, xv)) - ref.ref_polyval(p, xv)) < 1e-10


def test_powerlaw_vs_reference():
    rng = np.random.default_rng(6)
    for _ in range(20):
        alpha = rng.uniform(-3.0, -0.5)
        lo, hi = 0.1, 10.0
        x = rng.uniform(lo, hi)
        assert abs(float(powerlaw_lnpdf(x, alpha, lo, hi)) - ref.ref_powerlaw_lnpdf(x, alpha, lo, hi)) < 1e-12
        assert abs(float(powerlaw_pdf(x, alpha, lo, hi)) - ref.ref_powerlaw_pdf(x, alpha, lo, hi)) < 1e-12


def test_eep_fn_vs_reference():
    rng = np.random.default_rng(7)
    x = np.sort(rng.uniform(7.0, 10.0, size=25))
    args = (0.1, -0.2, 0.3, 1.1, 5.0, 200.0, 2.0, 9.8, 0.07)
    for order in (5, 3, 1):
        _assert_close(
            eep_fit.eep_fn(x, *args, order=order), ref.ref_eep_fn(x, *args, order=order),
            msg=f"eep_fn order={order}",
        )
    _assert_close(eep_fit.eep_jac(x, *args), ref.ref_eep_jac(x, *args), msg="eep_jac")


# ---------------------------------------------------------------------------
# §2.1 cluster kernels vs transliteration (second oracle; the first is the
# loop oracle in tests/test_cluster.py)
# ---------------------------------------------------------------------------


def test_cluster_kernels_vs_reference():
    rng = np.random.default_rng(8)
    n_stars, n_eep, n_bands = 4, 12, 2
    eeps = np.linspace(10.0, 300.0, n_eep)
    masses = np.linspace(0.3, 2.2, n_eep)
    ln_dm = rng.normal(size=n_eep) * 0.1
    model_mags = rng.uniform(5, 12, size=(n_eep, n_bands))
    mag_values = rng.uniform(6, 11, size=(n_stars, n_bands))
    mag_uncs = rng.uniform(0.01, 0.1, size=(n_stars, n_bands))
    lnlike_prop = rng.normal(size=(n_stars, n_eep))
    alpha, gamma, fB = -2.35, 0.3, 0.4
    mass_lo, mass_hi, q_lo = 0.2, 3.0, 0.1

    got_grid = np.asarray(
        calc_lnlike_grid(
            jnp.asarray(lnlike_prop), jnp.asarray(model_mags), jnp.asarray(masses),
            jnp.asarray(ln_dm), jnp.asarray(mag_values), jnp.asarray(mag_uncs),
            alpha, gamma, fB, mass_lo, mass_hi, q_lo,
        )
    )
    want_grid = ref.ref_calc_lnlike_grid(
        lnlike_prop, model_mags, n_bands, masses, ln_dm, eeps, mag_values, mag_uncs,
        alpha, gamma, fB, mass_lo, mass_hi, q_lo,
    )
    # compare the lower triangle only: the reference leaves zeros above the
    # diagonal, the rebuild masks it to -inf (never read downstream)
    tri = np.tril_indices(n_eep)
    for i in range(n_stars):
        _assert_close(got_grid[i][tri], want_grid[i][tri], atol=1e-9, rtol=1e-9, msg=f"cluster grid star {i}")

    got_marg = np.asarray(integrate_over_eeps(jnp.asarray(got_grid), jnp.asarray(eeps)))
    want_marg = ref.ref_integrate_over_eeps(want_grid, eeps, n_stars)
    _assert_close(got_marg, want_marg, atol=1e-12, rtol=1e-9, msg="integrate_over_eeps")
