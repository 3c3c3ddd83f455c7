"""Convergence-driven MCMC harness tests (fit.py — the emcee3-harness role:
chunked runs until target effective samples, HDF checkpoint/resume)."""

import os

import numpy as np
import pytest

from isochrones_tpu import get_ichrone
from isochrones_tpu.fit import McmcBackend, fit_mcmc_convergent
from isochrones_tpu.starmodel import SingleStarModel


@pytest.fixture(scope="module")
def model():
    iso = get_ichrone("synthetic", n_feh=7, n_mass=30, n_eep=100, n_age=30)
    Teff, logg, _, mags = iso.interp_mag([60.0, 9.0, 0.0, 200.0, 0.1], ["J", "H", "K"])
    return SingleStarModel(
        iso, Teff=(Teff, 100.0), logg=(logg, 0.1),
        J=(float(mags[0]), 0.02), parallax=(5.0, 0.05), name="harness-star",
    )


@pytest.mark.slow
def test_convergent_fit_and_resume(tmp_path, model):
    sample_dir = str(tmp_path / "chains")
    results_dir = str(tmp_path / "results")
    df = fit_mcmc_convergent(
        model, nwalkers=32, targetn=2, iter_chunksize=100, maxiter=4,
        nsamples=1000, sample_directory=sample_dir, resultsdir=results_dir,
        seed=0,
    )
    assert len(df) <= 1000
    assert np.isfinite(df["lnprob"]).all()
    assert os.path.exists(os.path.join(sample_dir, "harness-star.h5"))
    assert os.path.exists(os.path.join(results_dir, "harness-star.csv"))

    # resume: the backend chain is reloaded, not restarted
    backend = McmcBackend(os.path.join(sample_dir, "harness-star.h5"))
    chain, ln = backend.load()
    n_before = chain.shape[0]
    df2 = fit_mcmc_convergent(
        model, nwalkers=32, targetn=2, iter_chunksize=100, maxiter=1,
        nsamples=500, sample_directory=sample_dir, resultsdir=results_dir,
        seed=1,
    )
    chain2, _ = backend.load()
    assert chain2.shape[0] >= n_before
    assert np.allclose(chain2[:n_before], chain)


def test_prior_only(tmp_path, model):
    df = fit_mcmc_convergent(
        model, nwalkers=32, targetn=1, iter_chunksize=50, maxiter=1,
        nsamples=200, sample_directory=None, resultsdir=str(tmp_path),
        prior_only=True, seed=0,
    )
    # prior-only samples should roam the prior support, much wider than the
    # posterior (distance prior reaches 400 pc with the parallax bound)
    assert df["distance"].std() > 20
