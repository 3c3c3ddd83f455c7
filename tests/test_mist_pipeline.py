"""Hermetic end-to-end tests of the MIST grid pipeline (L1) against fake
MIST-format files (exact real-distribution layouts; synthetic physics).

Covers: native/pandas table parsing, .iso and .track.eep parsers, ragged
track completion, dt/dEEP + dm/dEEP derivatives, parquet caches, array grids
for EEP inversion, eep(age) curve-fit machinery, BC band resolution + Rv
cross-section, and interpolator assembly (get_mist_interpolators).
"""

import os

import numpy as np
import pytest

from isochrones_tpu import config
from mist_fixtures import make_bc_tree, make_full_mist_fixture, make_iso_tree, make_track_tree

FIXTURE_EEP = 60


@pytest.fixture(scope="module")
def mist_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("isochrones_data"))
    make_full_mist_fixture(root)
    return root


@pytest.fixture()
def mist_env(mist_root, monkeypatch):
    monkeypatch.setattr(config, "ISOCHRONES", mist_root)
    # fixture tracks are FIXTURE_EEP long; patch the (real-MIST) truncation map
    from isochrones_tpu.grids import mist as mist_mod

    monkeypatch.setattr(
        mist_mod.MISTModelGrid, "max_eep", lambda self, m, feh: FIXTURE_EEP
    )
    monkeypatch.setattr(mist_mod.MISTModelGrid, "fehs", np.array([-0.5, 0.0]))
    monkeypatch.setattr(mist_mod.MISTModelGrid, "n_eep", FIXTURE_EEP)
    return mist_root


def test_native_parser_matches_pandas(tmp_path):
    import pandas as pd

    from isochrones_tpu.grids.parse import get_fastparse_lib, parse_numeric_table

    fn = str(tmp_path / "table.txt")
    rng = np.random.default_rng(0)
    data = rng.normal(size=(200, 7))
    with open(fn, "w") as f:
        f.write("# header comment\n# another\n")
        for i, row in enumerate(data):
            if i == 50:
                f.write("# mid-file comment\n\n")
            f.write(" ".join(f"{v:.12g}" for v in row) + "\n")

    assert get_fastparse_lib() is not None, "native parser should build in this env"
    parsed = parse_numeric_table(fn)
    oracle = pd.read_csv(fn, sep=r"\s+", comment="#", header=None).values
    np.testing.assert_allclose(parsed, oracle, rtol=1e-12)


def test_track_parser(mist_env):
    from isochrones_tpu.grids.mist import MISTEvolutionTrackGrid

    grid = MISTEvolutionTrackGrid()
    files = grid.get_feh_filenames(0.0)
    assert len(files) == 3
    df = grid.to_df(files[0])
    assert "star_age" in df.columns
    assert df["EEP"].iloc[0] == 1
    assert (df["initial_mass"] == MISTEvolutionTrackGrid.get_mass(files[0])).all()


def test_track_ragged_completion(mist_env):
    from isochrones_tpu.grids.mist import MISTEvolutionTrackGrid

    grid = MISTEvolutionTrackGrid()
    df = grid.df_all_feh_interpolated(0.0)
    sub = df.xs(0.8, level="initial_mass")
    # short (40-row) track completed to FIXTURE_EEP by neighbor interpolation
    assert len(sub) == FIXTURE_EEP
    assert sub["interpolated"].values[-1]
    assert not sub["interpolated"].values[0]
    # interpolated tail is the mean of the 0.7/0.9 neighbors (equidistant)
    lo = df.xs(0.7, level="initial_mass")["star_age"].values[45]
    hi = df.xs(0.9, level="initial_mass")["star_age"].values[45]
    mid = sub["star_age"].values[45]
    assert np.isclose(mid, 0.5 * (lo + hi), rtol=1e-6)


def test_track_grid_df(mist_env):
    from isochrones_tpu.grids.mist import MISTEvolutionTrackGrid

    grid = MISTEvolutionTrackGrid()
    df = grid.df
    for c in ("eep", "feh", "mass", "initial_mass", "Teff", "logg", "Mbol", "age", "dt_deep"):
        assert c in df.columns, c
    assert df.index.names == ["initial_feh", "initial_mass", "EEP"]
    # dt_deep is d(log age)/dEEP > 0 for monotonic toy tracks
    assert (df["dt_deep"].dropna() > 0).all()
    # surface feh recomputation recovers the input feh
    np.testing.assert_allclose(
        df.xs(0.0, level="initial_feh")["feh"].values, 0.0, atol=1e-6
    )


def test_iso_grid(mist_env):
    from isochrones_tpu.grids.mist import MISTIsochroneGrid

    grid = MISTIsochroneGrid()
    df = grid.df
    assert df.index.names == ["log10_isochrone_age_yr", "feh", "EEP"]
    assert "dm_deep" in df.columns
    assert "initial_mass" in df.columns
    ages = df.index.levels[0]
    assert set(np.round(ages, 3)) == {8.0, 8.5, 9.0}


def test_array_grids(mist_env):
    from isochrones_tpu.grids.mist import MISTEvolutionTrackGrid

    grid = MISTEvolutionTrackGrid()
    age, dt, lengths = grid.get_array_grids()
    assert age.shape == (2 * 3, FIXTURE_EEP)
    assert (lengths == FIXTURE_EEP).all()
    # padded region is +inf
    assert np.isinf(age[0, lengths[0]:]).all() or lengths[0] == FIXTURE_EEP


def test_bc_grid(mist_env):
    from isochrones_tpu.grids.mist import MISTBolometricCorrectionGrid

    bc = MISTBolometricCorrectionGrid(bands=["J", "H", "K", "W1", "W2"])
    assert bc.band_map["K"] == "2MASS_Ks"
    assert bc.phot_systems == {"UBVRIplus", "WISE"}
    df = bc.df
    assert list(df.columns) == ["J", "H", "K", "W1", "W2"]
    # Rv level consumed by the 3.1 cross-section
    assert df.index.names == ["Teff", "logg", "[Fe/H]", "Av"]


def test_band_resolution():
    from isochrones_tpu.grids.mist import MISTBolometricCorrectionGrid as G

    assert G.get_band("K") == ("UBVRIplus", "2MASS_Ks")
    assert G.get_band("G") == ("UBVRIplus", "Gaia_G_DR2Rev")
    assert G.get_band("W2") == ("WISE", "WISE_W2")
    assert G.get_band("g") == ("SDSSugriz", "SDSS_g")
    assert G.get_band("Kepler") == ("UBVRIplus", "Kepler_Kp")
    assert G.get_band("TESS") == ("UBVRIplus", "TESS")
    assert G.get_band("PanSTARRS_g") == ("PanSTARRS", "PS_g")
    assert G.get_band("LSST_u") == ("LSST", "LSST_u")
    assert G.get_band("UK_J") == ("UKIDSS", "UKIDSS_J")
    assert G.get_band("F200W") == ("JWST", "F200W")
    with pytest.raises(ValueError):
        G.get_band("notaband")


def test_max_eep_table():
    from isochrones_tpu.grids.mist_eep import default_max_eep, max_eep

    # spot values from the MIST v1.2 truncation map (reference mist/eep.py)
    assert default_max_eep(0.5) == 454
    assert default_max_eep(0.6) == 605
    assert default_max_eep(0.65) == 808
    assert default_max_eep(1.0) == 1710
    assert default_max_eep(8.0) == 808
    assert max_eep(0.8, -4.0) == 631
    assert max_eep(4.0, -4.0) == 1409
    assert max_eep(20.0, -4.0) == 631
    assert max_eep(1.0, -3.0) == 808
    assert max_eep(3.0, -2.5) == 1409
    assert max_eep(0.72, 0.5) == 808
    assert max_eep(1.0, 0.0) == 1710  # no override -> default


def test_get_mist_interpolators(mist_env):
    from isochrones_tpu.grids.mist import get_mist_interpolators

    iso, track = get_mist_interpolators(bands=["J", "H", "K", "W1"])
    assert iso.eep_replaces == "mass"
    assert track.eep_replaces == "age"
    assert iso.track is track
    assert track.iso is iso

    # forward evaluations on the baked grids
    Teff, logg, feh, mags = track.interp_mag([0.8, 30.0, 0.0, 100.0, 0.1], ["J", "K"])
    assert np.isfinite([Teff, logg, feh]).all()
    assert np.isfinite(mags).all()

    eep = track.get_eep(0.8, 8.8, 0.0)
    assert np.isfinite(eep)
    # round trip: age at that eep should match the request
    age_back = float(track.interp_value([0.8, eep, 0.0], ["age"]).squeeze())
    assert abs(age_back - 8.8) < 0.05


def test_get_ichrone_mist(mist_env):
    from isochrones_tpu import get_ichrone

    iso = get_ichrone("mist", bands=["J", "H", "K"])
    df = iso.isochrone(8.5, feh=0.0)
    assert len(df) > 10
    assert "J_mag" in df.columns


def test_eep_fit_machinery(mist_env, monkeypatch):
    from isochrones_tpu.grids.mist import MISTEvolutionTrackGrid

    # restrict sections to the fixture's EEP range
    monkeypatch.setattr(MISTEvolutionTrackGrid, "primary_eeps", (1, 20, 40, 60))
    grid = MISTEvolutionTrackGrid()
    p_df = grid.fit_eep_section(1, 20, order=3)
    assert p_df.shape == (6, 4)
    assert np.isfinite(p_df.values.astype(float)).all()

    approx = grid.fit_approx_eep(max_fit_eep=60)
    assert approx.shape == (6, 9)

    grid.write_eep_params(orders=[3, 3, 3])
    interp = grid.get_approx_eep_interp()
    pars = np.asarray(interp([0.0, 0.8], "all")).squeeze()
    assert pars.shape == (9,)

    eep = grid.get_eep_fit(0.8, 8.8, 0.0, approx=True)
    assert np.isfinite(eep)
    # approx fit should land in the right neighborhood
    true_eep = grid.df.xs((0.0, 0.8), level=(0, 1))
    age_at = np.interp(eep, true_eep["eep"].values, true_eep["age"].values)
    assert abs(age_at - 8.8) < 0.3


def test_offline_gating(tmp_path, monkeypatch):
    monkeypatch.setattr(config, "ISOCHRONES", str(tmp_path))
    monkeypatch.setattr(config, "OFFLINE", True)
    from isochrones_tpu.grids.mist import MISTEvolutionTrackGrid

    grid = MISTEvolutionTrackGrid()
    with pytest.raises(RuntimeError, match="Offline"):
        grid.download_tarball(feh=0.0)


def test_track_grid_accessors(mist_env, monkeypatch):
    """masses/primary_eeps_arr/cache-path aliases/view_eep_fit
    (reference mist/models.py:186-190, 297-303, 530-534, 558-596)."""
    from isochrones_tpu.grids.mist import MISTEvolutionTrackGrid

    monkeypatch.setattr(MISTEvolutionTrackGrid, "primary_eeps", (1, 20, 40, 60))
    grid = MISTEvolutionTrackGrid()
    ms = grid.masses
    assert ms.ndim == 1 and len(ms) >= 2 and np.all(np.diff(ms) > 0)
    assert grid.masses is ms  # cached
    assert np.array_equal(grid.primary_eeps_arr, np.array(grid.primary_eeps))
    assert grid.get_feh_hdf_filename(0.0) == grid.get_feh_cache_filename(0.0)
    assert grid.get_feh_interpolated_hdf_filename(0.0).endswith("_interpolated.parquet")

    ax = grid.view_eep_fit(float(ms[0]), 0.0, plot_p0=True)
    assert ax.get_title() == f"mass={float(ms[0])}, feh=0.0"
    assert len(ax.lines) >= 3  # track, fit, p0 (+ primary-EEP markers)
