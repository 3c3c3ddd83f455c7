"""NUTS sampler tests: exact-target statistics on a correlated Gaussian,
and posterior recovery on a star model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from isochrones_tpu import get_ichrone
from isochrones_tpu.samplers.nuts import run_nuts
from isochrones_tpu.starmodel import SingleStarModel


@pytest.mark.slow
def test_gaussian_target():
    dim = 4
    rng = np.random.default_rng(0)
    A = rng.normal(size=(dim, dim))
    cov = A @ A.T + dim * np.eye(dim)
    prec = jnp.asarray(np.linalg.inv(cov))
    mu_np = np.array([1.0, -2.0, 0.5, 3.0])
    mu = jnp.asarray(mu_np)

    def logp(x):
        d = x - mu
        return -0.5 * jnp.einsum("bi,ij,bj->b", d, prec, d)

    x0 = jnp.asarray(rng.normal(size=(8, dim)))
    res = run_nuts(logp, x0, jax.random.PRNGKey(0), n_warmup=500, n_samples=1000)

    assert res.n_divergent.sum() == 0
    assert (res.accept_rate > 0.6).all()
    flat = res.samples.reshape(-1, dim)
    # means within ~4 effective standard errors (conservative: tau ~ few)
    se = np.sqrt(np.diag(cov) / (len(flat) / 10))
    assert (np.abs(flat.mean(0) - mu_np) < 5 * se).all()
    # covariance structure recovered
    rel = np.abs(np.cov(flat.T) - cov).max() / np.abs(cov).max()
    assert rel < 0.12


def test_mass_matrix_adaptation():
    """Badly scaled Gaussian: adaptation should learn per-dim variances."""
    scales = jnp.asarray([0.01, 1.0, 100.0])

    def logp(x):
        return -0.5 * jnp.sum((x / scales) ** 2, axis=-1)

    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(4, 3)))
    res = run_nuts(logp, x0, jax.random.PRNGKey(1), n_warmup=600, n_samples=600)
    flat = res.samples.reshape(-1, 3)
    stds = flat.std(axis=0)
    ratio = stds / np.asarray(scales)
    assert (np.abs(np.log(ratio)) < np.log(1.6)).all(), ratio
    # inv_mass should separate the scales by orders of magnitude (the exact
    # ratio is limited by how well the slow dimension mixes during warmup)
    im = res.inv_mass.mean(axis=0)
    assert im[2] / im[0] > 1e3


@pytest.mark.slow
def test_star_model_nuts():
    iso = get_ichrone("synthetic", n_feh=7, n_mass=30, n_eep=100, n_age=30)
    Teff, logg, _, mags = iso.interp_mag([60.0, 9.0, 0.0, 200.0, 0.1], ["J", "H", "K"])
    m = SingleStarModel(
        iso, Teff=(Teff, 100.0), logg=(logg, 0.1),
        J=(float(mags[0]), 0.02), H=(float(mags[1]), 0.02), K=(float(mags[2]), 0.02),
        parallax=(5.0, 0.05),
    )
    df = m.fit_nuts(n_chains=6, n_warmup=500, n_samples=400, seed=0)
    assert np.isfinite(df["lnprob"]).all()
    assert abs(df["age"].median() - 9.0) < 0.1
    assert abs(df["distance"].median() - 200.0) < 10.0
    assert abs(df["feh"].median() - 0.0) < 0.15
    assert float(m.posterior_predictive) < 10.0


def test_lnpost_gradient_finite_with_missing_channels():
    """Regression for the round-4 NaN-gradient bug (JAX where-grad trap).

    A missing spectroscopic channel is encoded as NaN in the static
    observation arrays; masking only the FORWARD value of its Gaussian term
    (`where(isnan(val), 0, gauss_lnprob(NaN, ...))`) leaves reverse-mode
    multiplying the zero cotangent into d(term)/d(model_val) = NaN,
    poisoning the gradient of EVERY parameter the interpolated model value
    depends on. NUTS's _safe_value_and_grad then silently zeroed the force
    and the sampler ran ballistic trajectories (the misdiagnosed round-3
    "A_V-tail artifact"). Assert finite gradients through BOTH lnpost
    builders (fused packed-grid path and the composed fallback) on a model
    with no feh measurement, and through ops.star_lnlike directly.
    """
    iso = get_ichrone("synthetic", n_feh=7, n_mass=30, n_eep=100, n_age=30)
    Teff, logg, _, mags = iso.interp_mag([60.0, 9.0, 0.0, 200.0, 0.1], ["J", "H", "K"])
    # Teff/logg measured, feh NOT measured -> spec_vals[feh] = NaN
    m = SingleStarModel(
        iso, Teff=(float(Teff), 100.0), logg=(float(logg), 0.1),
        J=(float(mags[0]), 0.02), H=(float(mags[1]), 0.02), K=(float(mags[2]), 0.02),
        parallax=(5.0, 0.05),
    )
    pts = jnp.asarray(
        np.asarray(m.sample_from_prior(32, values=True, require_valid=True, rng=3),
                   dtype=float)
    )

    fused = m._build_lnpost_fused()
    assert fused is not None  # the packed-grid path must exist on this fixture
    composed_lnlike = m._build_lnlike_batch()

    for fn in (fused, composed_lnlike):
        vals, grads = jax.vmap(jax.value_and_grad(lambda p: fn(p[None, :])[0]))(pts)
        assert np.isfinite(np.asarray(vals)).all()
        assert np.isfinite(np.asarray(grads)).all(), (
            f"NaN/inf gradient through {fn.__qualname__} with a missing "
            f"spectroscopic channel"
        )

    # ops-level: star_lnlike with a NaN channel must have finite grad too
    from isochrones_tpu.ops.likelihood import star_lnlike

    index_order = tuple(iso._param_index_order)
    model = iso.model_packed
    model_icols = iso._packed_icols
    bc = iso.bc
    band_icols = tuple(bc.column_index[b] for b in ("J", "H", "K"))
    spec_vals = jnp.array([float(Teff), np.nan, np.nan])
    spec_uncs = jnp.array([100.0, np.nan, np.nan])
    mag_vals = jnp.asarray(np.asarray(mags, dtype=float))
    mag_uncs = jnp.full((3,), 0.02)

    def ll1(p):
        return star_lnlike(
            p[None, :], index_order, spec_vals, spec_uncs, mag_vals, mag_uncs,
            model, model_icols, bc, band_icols, n_stars=1,
        )[0]

    vals, grads = jax.vmap(jax.value_and_grad(ll1))(pts)
    assert np.isfinite(np.asarray(vals)).all()
    assert np.isfinite(np.asarray(grads)).all()


@pytest.mark.slow
def test_gaussian_target_with_eps_jitter():
    """eps_jitter > 1 (per-transition log-uniform step-size jitter, Neal
    2011 §3.2) must leave the sampled distribution exact — each transition
    is a valid NUTS kernel at its own step size, so the mixture is still
    invariant for the target. Same statistics bar as test_gaussian_target."""
    dim = 3
    rng = np.random.default_rng(1)
    A = rng.normal(size=(dim, dim))
    cov = A @ A.T + dim * np.eye(dim)
    prec = jnp.asarray(np.linalg.inv(cov))
    mu_np = np.array([1.0, -2.0, 0.5])
    mu = jnp.asarray(mu_np)

    def logp(x):
        d = x - mu
        return -0.5 * jnp.einsum("bi,ij,bj->b", d, prec, d)

    x0 = jnp.asarray(rng.normal(size=(8, dim)))
    res = run_nuts(logp, x0, jax.random.PRNGKey(0), n_warmup=500,
                   n_samples=1000, eps_jitter=2.0)

    assert res.n_divergent.sum() == 0
    flat = res.samples.reshape(-1, dim)
    se = np.sqrt(np.diag(cov) / (len(flat) / 10))
    assert (np.abs(flat.mean(0) - mu_np) < 5 * se).all()
    rel = np.abs(np.cov(flat.T) - cov).max() / np.abs(cov).max()
    assert rel < 0.12
