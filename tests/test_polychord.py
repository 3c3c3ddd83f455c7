"""PolyChord-parity slice-sampling nested sampler tests.

Two layers, mirroring the reference's multi-sampler role
(/root/reference/isochrones/starmodel.py:703-715):
  * analytic targets with known evidence (Gaussian box, correlated Gaussian —
    the slice sampler's whitened directions must handle correlation);
  * NS-vs-NS cross-check (slow): the slice-replacement sampler and the
    random-walk-replacement sampler are INDEPENDENT constrained samplers;
    their evidences and posterior quantiles must agree on a star model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from isochrones_tpu import get_ichrone
from isochrones_tpu.samplers.nested import run_nested
from isochrones_tpu.samplers.polychord import run_polychord
from isochrones_tpu.starmodel import SingleStarModel


def test_polychord_gaussian_evidence():
    """Gaussian likelihood in a uniform box: analytic logZ (same contract as
    test_samplers.py::test_nested_gaussian_evidence)."""
    sigma = 0.1
    lo, hi = -1.0, 1.0

    def lnpost_v(x):
        return -0.5 * jnp.sum((x / sigma) ** 2, axis=-1) - x.shape[-1] * 0.5 * np.log(
            2 * np.pi * sigma ** 2
        )

    def prior_transform(u):
        return lo + (hi - lo) * u

    n_params = 2
    res = run_polychord(
        lnpost_v, prior_transform, n_params,
        key=jax.random.PRNGKey(2), n_live=400, max_iter=6000, rng=3,
    )
    expected = np.log(1.0 / (hi - lo) ** n_params)
    assert res.logz == pytest.approx(expected, abs=max(3 * res.logzerr, 0.1))
    assert np.abs(res.posterior.mean(axis=0)).max() < 0.02
    np.testing.assert_allclose(res.posterior.std(axis=0), sigma, rtol=0.15)


def test_polychord_correlated_gaussian():
    """Strongly correlated Gaussian: whitened slice directions must mix.
    Analytic logZ and the full covariance structure are checked."""
    rho = 0.95
    sigma = 0.08
    cov = sigma ** 2 * np.array([[1.0, rho], [rho, 1.0]])
    prec = np.linalg.inv(cov)
    norm = -0.5 * np.log((2 * np.pi) ** 2 * np.linalg.det(cov))
    prec_j = jnp.asarray(prec)

    def lnpost_v(x):
        return -0.5 * jnp.einsum("bi,ij,bj->b", x, prec_j, x) + norm

    def prior_transform(u):
        return -1.0 + 2.0 * u

    res = run_polychord(
        lnpost_v, prior_transform, 2,
        key=jax.random.PRNGKey(4), n_live=400, max_iter=8000, rng=5,
    )
    expected = np.log(1.0 / 2.0 ** 2)
    assert res.logz == pytest.approx(expected, abs=max(3 * res.logzerr, 0.15))
    emp_cov = np.cov(res.posterior.T)
    np.testing.assert_allclose(emp_cov, cov, rtol=0.25, atol=0.1 * sigma ** 2)


@pytest.mark.slow
def test_polychord_vs_multinest_star_model():
    """The two independent on-device nested samplers agree on a star model:
    evidence within quadrature-summed logzerr, posterior quantiles within
    Monte-Carlo tolerance."""
    iso = get_ichrone("synthetic", n_feh=7, n_mass=30, n_eep=100, n_age=30)
    truth = [60.0, 9.0, 0.0, 200.0, 0.1]
    Teff, logg, _, mags = iso.interp_mag(truth, ["J", "H", "K"])
    kw = dict(
        Teff=(float(Teff), 100.0),
        logg=(float(logg), 0.1),
        parallax=(5.0, 0.05),
    )
    for b, m in zip(["J", "H", "K"], np.asarray(mags)):
        kw[b] = (float(m), 0.02)
    m = SingleStarModel(iso, name="pc-vs-mn", **kw)

    res_mn = m.fit_multinest(n_live_points=500, seed=40)
    q_mn = {p: np.quantile(m.samples[p].values, [0.16, 0.5, 0.84]) for p in m.param_names}

    res_pc = m.fit_polychord(n_live_points=500, seed=41)
    q_pc = {p: np.quantile(m.samples[p].values, [0.16, 0.5, 0.84]) for p in m.param_names}

    err = np.hypot(res_mn.logzerr, res_pc.logzerr)
    assert abs(res_mn.logz - res_pc.logz) < 3.0 * err, (
        f"logz {res_mn.logz}+-{res_mn.logzerr} vs {res_pc.logz}+-{res_pc.logzerr}"
    )
    for p in m.param_names:
        scale = max(0.5 * (q_mn[p][2] - q_mn[p][0]), 1e-12)
        delta = np.abs(q_pc[p] - q_mn[p]) / scale
        assert np.all(delta < 0.35), f"{p}: {q_pc[p]} vs {q_mn[p]} ({delta})"


def test_polychord_dynamic_threads():
    """dynamic=True composes with the slice-replacement core: the thread
    rounds replay the SAME core (core= contract), reaching the ESS target
    with the evidence unchanged."""
    sigma = 0.1

    def lnpost_v(x):
        return -0.5 * jnp.sum((x / sigma) ** 2, axis=-1) - x.shape[-1] * 0.5 * np.log(
            2 * np.pi * sigma ** 2
        )

    def prior_transform(u):
        return -1.0 + 2.0 * u

    d, min_ess = 3, 1200
    res = run_polychord(
        lnpost_v, prior_transform, d, jax.random.PRNGKey(5),
        n_live=200, n_batch=8, dlogz=0.01, min_ess=min_ess, rng=7,
        dynamic=True,
    )
    assert res.dynamic_rounds >= 1
    assert res.ess >= min_ess and not res.truncated
    expected = np.log(1.0 / 2.0 ** d)
    assert res.logz == pytest.approx(expected, abs=max(3 * res.logzerr, 0.1))
    np.testing.assert_allclose(res.posterior.std(axis=0), sigma, rtol=0.15)
