"""Statistical prior tests: integral ~= 1 and sampling-vs-pdf chi
(the reference's per-prior test pattern, priors.py:74-104), plus host-vs-jax
lnpdf consistency for every prior."""

import jax.numpy as jnp
import numpy as np
import pytest

from isochrones_tpu.priors import (
    AgePrior,
    AVPrior,
    ChabrierPrior,
    DistancePrior,
    EEP_prior,
    FehPrior,
    FlatLogPrior,
    FlatPrior,
    GaussianPrior,
    LogNormalPrior,
    PowerLawPrior,
    QPrior,
    SalpeterPrior,
    powerlaw_lnpdf,
    powerlaw_pdf,
)

PRIORS = {
    "age": AgePrior(),
    "av": AVPrior(),
    "chabrier": ChabrierPrior(),
    "distance": DistancePrior(),
    "feh": FehPrior(),
    "flat": FlatPrior((1.0, 3.0)),
    "flatlog": FlatLogPrior((1.0, 3.0)),
    "gauss": GaussianPrior(0.5, 2.0, bounds=(-5, 5)),
    "lognorm": LogNormalPrior(np.log(0.5), 1.1),
    "powerlaw": PowerLawPrior(-1.7, (0.3, 5.0)),
    "q": QPrior(),
    "salpeter": SalpeterPrior(),
}


@pytest.mark.parametrize("name", sorted(PRIORS))
def test_integral(name):
    PRIORS[name].test_integral()


@pytest.mark.parametrize("name", sorted(PRIORS))
def test_sampling(name):
    PRIORS[name].test_sampling(n=100000, rng=np.random.default_rng(42))


@pytest.mark.parametrize("name", sorted(PRIORS))
def test_jax_host_consistency(name):
    """lnpdf_jax must agree with host lnpdf inside the support."""
    p = PRIORS[name]
    lo, hi = p.bounds
    if not (np.isfinite(lo) and np.isfinite(hi)):
        s = p.sample(10000, rng=np.random.default_rng(0))
        lo = max(lo, np.percentile(s, 1))
        hi = min(hi, np.percentile(s, 99))
    else:
        lo, hi = lo + 1e-6, hi - 1e-6
    xs = np.linspace(lo + 1e-9, hi, 50)
    host = np.array([p.lnpdf(float(x)) for x in xs])
    jaxv = np.asarray(p.lnpdf_jax(jnp.asarray(xs)))
    np.testing.assert_allclose(jaxv, host, rtol=1e-8, atol=1e-10)


def test_jax_out_of_bounds():
    p = FlatPrior((0.0, 1.0))
    out = np.asarray(p.lnpdf_jax(jnp.asarray([-0.5, 0.5, 1.5])))
    assert out[0] == -np.inf and out[2] == -np.inf and np.isfinite(out[1])


def test_powerlaw_kernels():
    x = jnp.asarray([0.5, 1.0, 2.0])
    pdf = np.asarray(powerlaw_pdf(x, -2.0, 0.1, 10.0))
    lnpdf = np.asarray(powerlaw_lnpdf(x, -2.0, 0.1, 10.0))
    np.testing.assert_allclose(np.log(pdf), lnpdf, rtol=1e-12)


def test_bounds_renormalization():
    p = FehPrior()
    p.bounds = (-1.0, 0.5)
    from scipy.integrate import quad

    val = quad(p.pdf, -1.0, 0.5)[0]
    assert val == pytest.approx(1.0, rel=1e-6)
    # jax version renormalizes identically
    assert float(p.lnpdf_jax(jnp.asarray(0.0))) == pytest.approx(p.lnpdf(0.0), rel=1e-10)


def test_eep_prior():
    from isochrones_tpu import get_ichrone

    track = get_ichrone("synthetic", tracks=True)
    prior = EEP_prior(track, AgePrior(), bounds=track.eep_bounds)
    # in-bounds EEP on a live track: finite and equal between host and jax
    val_host = prior.lnpdf(100.0, mass=1.0, feh=0.0)
    val_jax = float(prior.lnpdf_jax(jnp.asarray(100.0), mass=jnp.asarray(1.0), feh=jnp.asarray(0.0)))
    assert np.isfinite(val_host)
    assert val_jax == pytest.approx(val_host, rel=1e-8)
    # out of bounds -> -inf
    assert prior.lnpdf(1e6, mass=1.0, feh=0.0) == -np.inf
    # sampling returns in-bounds integer EEPs weighted by dt_deep * p(age)
    samples = prior.sample(500, rng=0, mass=1.0, feh=0.0)
    assert len(samples) == 500
    assert (samples >= prior.bounds[0]).all() and (samples <= prior.bounds[1]).all()


def test_bounded_lnpdf_vectorized_masks_oob():
    """Array inputs must get the same bounds mask scalars do (regression:
    out-of-bounds array entries returned finite log-density)."""
    g = GaussianPrior(0.0, 1.0, bounds=(-1, 1))
    out = g.lnpdf(np.array([0.0, 5.0]))
    assert np.isfinite(out[0]) and out[1] == -np.inf
    f = FlatPrior((0, 1))
    out = f.lnpdf(np.array([0.5, 2.0]))  # used to raise ValueError
    assert np.isfinite(out[0]) and out[1] == -np.inf


def test_broken_prior_continuous_three_components():
    """Continuity norms must CHAIN across breakpoints (regression: 3+
    components had a jump at the second breakpoint)."""
    from isochrones_tpu.priors import BrokenPrior, PowerLawPrior

    p = BrokenPrior(
        [PowerLawPrior(1.0, (1.0, 9.0)), PowerLawPrior(-0.5, (1.0, 9.0)),
         PowerLawPrior(2.0, (1.0, 9.0))],
        [3.0, 6.0], bounds=(1.0, 9.0),
    )
    for bp in (3.0, 6.0):
        lo, hi = p.pdf(bp - 1e-9), p.pdf(bp + 1e-9)
        assert lo == pytest.approx(hi, rel=1e-6), (bp, lo, hi)
    p.test_integral()


def test_gaussian_bounds_setter_retruncates():
    """Assigning .bounds after construction must rebuild the truncation
    (regression: it kept the old norm and always failed test_integral)."""
    g = GaussianPrior(0.0, 1.0)
    g.bounds = (-1.0, 1.0)
    assert g.norm == pytest.approx(0.6826894921370859)
    x = g.sample(2000, rng=1)
    assert np.all((x >= -1) & (x <= 1))


def test_gaussian_half_infinite_bounds_truncate():
    """One-sided bounds must still renormalize (ADVICE r2): scipy truncnorm
    handles +-inf endpoints, so (0, inf) halves the support and doubles the
    density — skipping truncation under-normalizes by 1/(Phi(b)-Phi(a))."""
    from scipy.stats import norm

    g = GaussianPrior(0.0, 1.0, bounds=(0.0, np.inf))
    g.test_integral()
    np.testing.assert_allclose(g.pdf(1.0), 2.0 * norm.pdf(1.0), rtol=1e-10)
    assert g.pdf(-0.5) == 0.0
    assert (g.sample(1000, rng=np.random.default_rng(0)) >= 0).all()
    # assigning half-infinite bounds via the setter must not raise and must
    # re-truncate (the reference accepts these through truncnorm directly)
    h = GaussianPrior(0.0, 1.0)
    h.bounds = (0.0, np.inf)
    h.test_integral()
    np.testing.assert_allclose(h.pdf(1.0), 2.0 * norm.pdf(1.0), rtol=1e-10)


def test_eep_prior_sample_respects_row_conditioning():
    """Vector age/feh: each row's EEP must come from its OWN conditional
    (regression: one global categorical detached EEPs from their rows)."""
    from isochrones_tpu import get_ichrone
    from isochrones_tpu.priors import ChabrierPrior

    iso = get_ichrone("synthetic", n_feh=5, n_mass=20, n_eep=80, n_age=20)
    lo, hi = iso.get_limits("eep")
    prior = EEP_prior(iso, ChabrierPrior(), bounds=(lo + 1, hi - 1))
    rng = np.random.default_rng(0)
    n = 400
    age = np.where(rng.random(n) < 0.5, 8.2, 9.6)  # two very different ages
    feh = np.zeros(n)
    eeps = prior.sample(n, rng=1, age=age, feh=feh)
    assert np.isfinite(eeps).all()
    # per-row lnpdf of the drawn eep under its own conditioning: every draw
    # must be supported by its own row (the old sampler violated this)
    import jax.numpy as jnp

    ln = np.asarray(prior.lnpdf_jax(jnp.asarray(eeps), age=jnp.asarray(age), feh=jnp.asarray(feh)))
    assert np.isfinite(ln).all()
    # the two age groups must have distinct EEP distributions
    m_young = np.median(eeps[age < 9.0])
    m_old = np.median(eeps[age > 9.0])
    assert m_young != m_old
