"""Multi-chip (virtual 8-device CPU mesh) sharding tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from isochrones_tpu import get_ichrone
from isochrones_tpu.parallel import default_mesh, pad_to_multiple, replicate, shard_batch, sharded_lnpost
from isochrones_tpu.starmodel import SingleStarModel


@pytest.fixture(scope="module")
def model():
    iso = get_ichrone("synthetic", n_feh=7, n_mass=30, n_eep=100, n_age=30)
    Teff, logg, _, mags = iso.interp_mag([60.0, 9.0, 0.0, 200.0, 0.1], ["J", "H", "K"])
    return SingleStarModel(
        iso, Teff=(Teff, 100.0), logg=(logg, 0.1),
        J=(float(mags[0]), 0.02), parallax=(5.0, 0.05),
    )


def test_eight_devices():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual CPU devices"


def test_sharded_lnpost_matches(model):
    mesh = default_mesh(8)
    rng = np.random.default_rng(0)
    batch = np.array([60.0, 9.0, 0.0, 200.0, 0.1]) + rng.normal(
        0, [3.0, 0.03, 0.03, 3.0, 0.02], size=(64, 5)
    )
    ref = np.asarray(model.lnpost_batch(jnp.asarray(batch)))
    sharded_fn = sharded_lnpost(model.lnpost_batch, mesh)
    out = np.asarray(sharded_fn(shard_batch(jnp.asarray(batch), mesh)))
    np.testing.assert_allclose(out, ref, rtol=1e-12)


@pytest.mark.slow
def test_sharded_fit_mcmc_matches_unsharded(model):
    """Same PRNG key + sharded walkers -> bitwise-deterministic chain."""
    mesh = default_mesh(8)
    p0 = model.emcee_p0(32, rng=7)
    df_plain = model.fit_mcmc(nwalkers=32, nburn=10, niter=10, p0=p0, seed=3)
    df_shard = model.fit_mcmc(nwalkers=32, nburn=10, niter=10, p0=p0, seed=3, mesh=mesh)
    np.testing.assert_allclose(df_shard.values, df_plain.values, rtol=1e-10)


def test_replicate(model):
    mesh = default_mesh(8)
    rep = replicate(model.ic.model, mesh)
    assert np.allclose(np.asarray(rep.values), np.asarray(model.ic.model.values), equal_nan=True)


def test_pad_to_multiple():
    x = np.ones((13, 5))
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape == (16, 5)
    assert n == 13
    assert np.isnan(padded[13:]).all()


def test_mag_accessor(model):
    ic = model.ic
    magJ = ic.mag["J"](60.0, 9.0, 0.0, 200.0, 0.1)
    _, _, _, mags = ic.interp_mag([60.0, 9.0, 0.0, 200.0, 0.1], ["J"])
    assert np.isclose(magJ, float(mags[0]))
    assert "J" in ic.mag.keys()
