"""Batched many-star fitting tests: a catalog of synthetic stars with
different truths fitted in ONE program, each posterior recovering its truth."""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from isochrones_tpu import get_ichrone
from isochrones_tpu.batch import BatchStarFitter, fit_catalog
from isochrones_tpu.catalog import StarCatalog
from isochrones_tpu.starmodel import SingleStarModel

BANDS = ("J", "H", "K")


@pytest.fixture(scope="module")
def setup():
    iso = get_ichrone("synthetic", n_feh=7, n_mass=30, n_eep=100, n_age=30)
    rng = np.random.default_rng(0)
    truths = pd.DataFrame(
        {
            "eep": [40.0, 55.0, 70.0, 60.0, 50.0, 65.0],
            "age": [8.6, 9.0, 9.3, 8.8, 9.1, 8.7],
            "feh": [-0.3, 0.0, 0.2, -0.1, 0.1, -0.2],
            "distance": [150.0, 200.0, 300.0, 250.0, 180.0, 220.0],
            "AV": [0.05, 0.1, 0.2, 0.15, 0.08, 0.12],
        }
    )
    rows = {}
    Teff, logg, _, mags = iso.interp_mag(
        [truths.eep.values, truths.age.values, truths.feh.values,
         truths.distance.values, truths.AV.values], list(BANDS),
    )
    mags = np.asarray(mags)
    for i, b in enumerate(BANDS):
        rows[f"{b}_mag"] = mags[:, i] + rng.normal(0, 0.02, len(truths))
        rows[f"{b}_mag_unc"] = 0.02
    rows["Teff"] = np.asarray(Teff) + rng.normal(0, 50, len(truths))
    rows["Teff_unc"] = 80.0
    rows["logg"] = np.asarray(logg) + rng.normal(0, 0.03, len(truths))
    rows["logg_unc"] = 0.05
    rows["parallax"] = 1000.0 / truths.distance.values
    rows["parallax_unc"] = 0.05
    cat = StarCatalog(pd.DataFrame(rows), bands=BANDS, props=("Teff", "logg", "parallax"))
    return iso, cat, truths


def test_batch_lnpost_matches_single(setup):
    """Batched lnpost row i == SingleStarModel lnpost built from star i."""
    iso, cat, truths = setup
    fitter = BatchStarFitter(iso, cat)
    S = fitter.n_stars
    pars = np.stack(
        [truths.eep.values, truths.age.values, truths.feh.values,
         truths.distance.values, truths.AV.values], axis=-1
    )[:, None, :]
    batch_lnp = np.asarray(fitter.lnpost_batch(jnp.asarray(pars)))[:, 0]

    for i in range(S):
        row = cat.df.iloc[i]
        m = SingleStarModel(
            iso,
            Teff=(row["Teff"], row["Teff_unc"]),
            logg=(row["logg"], row["logg_unc"]),
            parallax=(row["parallax"], row["parallax_unc"]),
            maxAV=1.0,
            **{b: (row[f"{b}_mag"], row[f"{b}_mag_unc"]) for b in BANDS},
        )
        single = m.lnpost(pars[i, 0])
        assert np.isclose(batch_lnp[i], single, atol=1e-6), (i, batch_lnp[i], single)


@pytest.mark.slow
def test_batch_fit_recovers_truths(setup):
    iso, cat, truths = setup
    fitter, summary = fit_catalog(iso, cat, nwalkers=64, nburn=500, niter=100, seed=1)
    # each truth within ~4 posterior sigma (obs have injected noise, so the
    # posterior median legitimately scatters around the truth)
    for i, p in enumerate(("eep", "age", "feh", "distance", "AV")):
        med = summary[f"{p}_50"].values
        sigma = 0.5 * (summary[f"{p}_84"].values - summary[f"{p}_16"].values)
        dev = np.abs(med - truths[p].values)
        assert (dev < np.maximum(4 * sigma, 1e-3)).all(), (p, dev, sigma)
    # medians also absolutely close for the tightly constrained params
    assert (np.abs(summary["distance_50"].values - truths.distance.values) < 15).all()
    assert (np.abs(summary["age_50"].values - truths.age.values) < 0.3).all()
    # quantile ordering sane
    assert (summary["eep_16"] <= summary["eep_50"]).all()
    assert (summary["eep_50"] <= summary["eep_84"]).all()


def test_batch_requires_iso(setup):
    iso, cat, _ = setup
    with pytest.raises(ValueError):
        BatchStarFitter(iso.track, cat)


@pytest.mark.slow
def test_batch_nested_evidence_and_recovery(setup):
    """Whole-catalog per-star nested sampling in one vmapped program:
    evidences finite + converged, per-star truth recovery, and an S=1
    rerun reproduces the batched star's evidence within errors.

    Recovery bars are POSTERIOR-SIGMA-SCALED (like
    test_batch_fit_recovers_truths), not absolute-vs-truth: a long-MCMC
    gold standard of fixture star 0 (256 walkers x 4000 burn + 2000 keep)
    shows its posterior is genuinely broad and displaced by the injected
    noise draw — age med 8.31, sigma 0.33 (truth 8.6 sits at ~q84); AV med
    0.30 (truth 0.05 at ~q05); eep med 32, sigma 8.3 (truth 40 at ~q84).
    An absolute 0.35-dex truth bar therefore fails on perfectly correct
    posteriors (the round-3 regression: the justified f32 cholesky ridge
    of 8e8593e merely reshuffled the NS realization). Four independent
    single-star NS runs (seeds 3/7/13/21) match the gold standard: age
    medians 8.20-8.36, P(age<8.3) = 0.43-0.59, logz -50.2..-50.7."""
    iso, cat, truths = setup
    fitter = BatchStarFitter(iso, cat)
    res = fitter.fit_multinest(n_live_points=300, n_batch=8, seed=3)
    assert np.isfinite(res["logz"]).all()
    assert res["converged"].all()
    assert (res["ess"] > 100).all()
    truth_mat = truths[["eep", "age", "feh", "distance", "AV"]].values
    for i in range(fitter.n_stars):
        s = fitter.samples[i]
        med = np.median(s, axis=0)
        q16, q84 = np.quantile(s, [0.16, 0.84], axis=0)
        sigma = 0.5 * (q84 - q16)
        dev = np.abs(med - truth_mat[i])
        assert (dev < np.maximum(4 * sigma, 1e-3)).all(), (i, med, sigma, dev)
    # star 0 cross-checked against the long-MCMC gold standard, with
    # tolerance covering the measured NS realization scatter (medians
    # 7.97-8.36 across seeds and batch compositions at n_live=300); a
    # wrong/unmixed posterior misses by whole dex
    s0 = fitter.samples[0]
    assert abs(np.median(s0[:, 1]) - 8.31) < 0.5, np.median(s0, axis=0)
    frac_young = np.mean(s0[:, 1] < 8.3)
    assert 0.15 < frac_young < 0.85, frac_young

    cat0 = StarCatalog(cat.df.iloc[[0]].copy(), bands=BANDS, props=("Teff", "logg", "parallax"))
    f0 = BatchStarFitter(iso, cat0)
    r0 = f0.fit_multinest(n_live_points=300, n_batch=8, seed=7)
    # shrinkage-based logzerr (~0.2) underestimates the true run-to-run
    # scatter (~0.7 nat measured over seeds: MCMC replacement chains are
    # finitely correlated); tolerance reflects the measured 3-sigma spread
    assert abs(res["logz"][0] - r0["logz"][0]) < 2.2


# ------------------------------------------------------------ native summary
def test_summarize_batch_native(setup):
    """Catalog-native summary (summary.py rewrite): one quantile pass over
    the fitter's (S, N, 5) draws + one batched derived dispatch — no
    per-folder HDF reload. NaN-draw stars surface as NaN rows, evidence
    columns appear when present."""
    from isochrones_tpu.summary import quantile_frame, summarize_batch

    iso, cat, truths = setup
    fitter = BatchStarFitter(iso, cat)
    S = fitter.n_stars
    rng = np.random.default_rng(5)
    # synthetic posterior draws centered on truth (no fit needed for the
    # summary machinery itself)
    centers = np.stack(
        [truths.eep.values, truths.age.values, truths.feh.values,
         truths.distance.values, truths.AV.values], axis=-1
    )
    draws = centers[:, None, :] + rng.normal(
        0, [1.0, 0.02, 0.02, 2.0, 0.01], size=(S, 400, 5)
    )
    draws[:, :, 4] = np.abs(draws[:, :, 4])
    fitter._samples = draws
    fitter._evidence = (np.full(S, -30.0), np.full(S, 0.3))

    df = summarize_batch(fitter, qs=(0.16, 0.5, 0.84))
    assert len(df) == S
    # fit-param quantiles ordered and near truth
    assert (df["eep_16"] <= df["eep_50"]).all() and (df["eep_50"] <= df["eep_84"]).all()
    np.testing.assert_allclose(df["age_50"], truths.age, atol=0.02)
    # derived physical columns present from the single batched dispatch
    for c in ("mass_50", "radius_50"):
        assert c in df.columns, df.columns.tolist()
        assert np.isfinite(df[c]).all()
    assert (df["logz"] == -30.0).all()

    # NaN star (zero posterior support, batch.py fit_multinest convention)
    draws_nan = draws.copy()
    draws_nan[2] = np.nan
    fitter._samples = draws_nan
    df2 = summarize_batch(fitter, qs=(0.16, 0.5, 0.84))
    assert np.isnan(df2.loc[df2.index[2], "mass_50"])
    assert np.isfinite(df2["mass_50"].drop(df2.index[2])).all()

    # core helper: 2-d input + explicit index
    qf = quantile_frame(draws[:, :, 0], "eep", qs=(0.5,), index=cat.df.index)
    np.testing.assert_allclose(qf["eep_50"], df["eep_50"], rtol=1e-12)
