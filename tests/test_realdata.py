"""Real-MIST validation suite — skipped cleanly unless real grid data exists.

The whole framework is hermetically tested on synthetic MIST-format grids; the
real-data path (downloads, real ``.iso``/``.track.eep`` parsing, ragged
completion at real scale — reference mist/models.py:318-389) cannot run in a
network-blocked environment. This module is the turnkey validation for the
moment data is present under ``$ISOCHRONES``: golden values pre-wired from the
reference's own tests (/root/reference/isochrones/tests/test_basic.py:16-18,
60-87, 90-127), run with ``pytest -m realdata`` once either

  * raw MIST tarballs/extracted trees exist (``mist-initialize`` has run), or
  * baked parquet/npz caches exist from a prior bake.

Carve-out: exact TOP-knot queries return the clamped grid value here, where
the reference's numba kernel reads out-of-bounds memory (UB) — see
ops/interp.py:17-20. None of the golden points below sit on a top knot.
"""

import glob
import os

import numpy as np
import pytest

from isochrones_tpu import config

pytestmark = pytest.mark.realdata


def _mist_data_present():
    d = os.path.join(config.ISOCHRONES, "mist")
    if not os.path.isdir(d):
        return False
    has_iso = bool(
        glob.glob(os.path.join(d, "MIST*"))  # extracted iso dirs or caches
        or glob.glob(os.path.join(d, "*.parquet"))
    )
    has_tracks = bool(glob.glob(os.path.join(d, "tracks", "*")))
    has_bc = bool(glob.glob(os.path.join(config.ISOCHRONES, "BC", "*"))) or bool(
        glob.glob(os.path.join(d, "bc", "*"))
    )
    return has_iso and has_tracks and has_bc


requires_data = pytest.mark.skipif(
    not _mist_data_present(),
    reason="real MIST grid data not present under $ISOCHRONES "
    f"({config.ISOCHRONES}); run `mist-initialize` with network access",
)


@pytest.fixture(scope="module")
def mist():
    from isochrones_tpu import get_ichrone

    return get_ichrone("mist", bands=["J", "H", "K"])


@pytest.fixture(scope="module")
def mist_tracks(mist):
    return mist.track


@requires_data
def test_golden_logg(mist):
    """Reference golden scalars (test_basic.py:16-18). The first is an exact
    grid point; the others interior interpolations."""
    assert np.isclose(mist.logg(632, 7.55, -1.75), 2.4117770214014103)
    assert np.isclose(mist.logg(355, 9.653, 0.0), 4.4124675)
    assert np.isclose(mist.logg(700, 9.3, -0.03), 2.24831956)


@requires_data
def test_broadcasting_matrix(mist):
    """All scalar/vector argument combinations (test_basic.py:90-100)."""
    age, feh = 9.5, -0.2
    eep = mist.track.get_eep(1.0, age, feh, accurate=True)
    v = np.ones(100)
    assert np.isfinite(mist.radius(eep, age, feh))
    for a in (eep, v * eep):
        for b in (age, v * age):
            for c in (feh, v * feh):
                assert np.isfinite(np.asarray(mist.radius(a, b, c))).all()


@requires_data
def test_nan_propagation_and_grid_points(mist):
    """NaN-in -> NaN-out (issue #65) and no failure on on-the-grid isochrone
    calls (issue #64) — test_basic.py:116-119."""
    assert np.isnan(mist.radius(1.0, np.nan, 0.1))
    assert len(mist.isochrone(8.0, feh=0.0)) > 0


@requires_data
def test_interp_mag_finite(mist):
    age, feh = 9.5, -0.2
    eep = mist.track.get_eep(1.0, age, feh, accurate=True)
    _, _, _, mags = mist.interp_mag([eep, age, feh, 500.0, 0.2], mist.bands)
    assert np.isfinite(np.asarray(mags)).all()


@requires_data
def test_mass_eep_roundtrip(mist):
    """Accurate mass->EEP inversion on the isochrone grid round-trips
    |initial_mass(eep, age, feh) - mass| < tol over random draws
    (test_basic.py:60-87), vectorized here."""
    rng = np.random.default_rng(1234)
    n = 10_000
    resid_tol = 0.02
    masses = rng.random(n) * 2.5 + 0.1
    fehs = rng.random(n) * (mist.maxfeh - mist.minfeh) + mist.minfeh
    ages = rng.random(n) * (10.0 - mist.minage) + mist.minage
    eeps = mist.get_eep(masses, ages, fehs, accurate=True, resid_tol=resid_tol)
    ok = np.isfinite(eeps)
    assert ok.sum() > n // 4  # much of the random box is off-grid by design
    m_back = np.asarray(
        mist.interp_value([eeps[ok], ages[ok], fehs[ok]], ["initial_mass"])
    ).squeeze(-1)
    good = np.isfinite(m_back)
    assert good.mean() > 0.99
    assert np.nanmax(np.abs(m_back[good] - masses[ok][good])) < resid_tol * 1.1


@requires_data
def test_min_mass_edge(mist):
    """minmass+0.01 inverts on every interior feh knot (test_basic.py:79-87)."""
    for feh in mist.fehs[1:-1]:
        eep = mist.get_eep(mist.minmass + 0.01, 9.0, float(feh), accurate=True)
        assert np.isfinite(eep), feh


@requires_data
def test_track_spec_model_lnlike(mist_tracks):
    """Spec-only StarModel on the real track grid gives finite lnlike
    (test_basic.py:160-163)."""
    from isochrones_tpu.starmodel import BasicStarModel

    m = BasicStarModel(mist_tracks, Teff=(5700, 100), logg=(4.5, 0.1), feh=(0.0, 0.2))
    eep = mist_tracks.get_eep(1.0, 9.6, 0.1, accurate=True)
    assert np.isfinite(m.lnlike([1.0, eep, 0.1, 200, 0.2]))


@requires_data
def test_gaia_bands_resolve(mist):
    """Band shortcut resolution on the real BC grids (test_basic.py:49-53)."""
    from isochrones_tpu import get_ichrone

    ic = get_ichrone("mist", bands=["Gaia_G_MAW", "Gaia_BP_MAWf", "Gaia_RP_MAW"])
    assert len(ic.bands) == 3
