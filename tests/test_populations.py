"""Population synthesis tests (mirror of reference tests/test_populations.py:
deredden-equals-regeneration property, no null total mags, A_x addmags
identity, corner-case regeneration)."""

import numpy as np
import pytest
from pandas.testing import assert_frame_equal

from isochrones_tpu import get_ichrone
from isochrones_tpu.populations import (
    BinaryDistribution,
    StarFormationHistory,
    StarFormationHistoryGrid,
    StarPopulation,
    deredden,
)
from isochrones_tpu.priors import AVPrior, DistancePrior, GaussianPrior, SalpeterPrior
from isochrones_tpu.utils import addmags


@pytest.fixture(scope="module")
def setup():
    ic = get_ichrone("synthetic", n_feh=7, n_mass=30, n_eep=100, n_age=30)
    sfh = StarFormationHistory()
    imf = SalpeterPrior(bounds=(0.4, 8))
    feh = GaussianPrior(-0.2, 0.2)
    distance = DistancePrior(max_distance=3000)
    AV = AVPrior(bounds=[0, 2])
    pop = StarPopulation(
        ic, imf=imf, fB=0.4, gamma=0.3, sfh=sfh, feh=feh, distance=distance, AV=AV
    )
    df = pop.generate(500, rng=42)
    return ic, pop, df, deredden(df)


def _regenerate_at_av0(ic, pop_df):
    """The reference's old_deredden oracle (test_populations.py:10-24)."""
    return ic.generate_binary(
        pop_df["initial_mass_0"].values,
        pop_df["initial_mass_1"].values,
        pop_df["requested_age_0"].values,
        pop_df["initial_feh_0"].values,
        distance=pop_df["distance_0"].values,
        AV=0.0,
        all_As=True,
    )


def test_exact_n(setup):
    _, _, df, _ = setup
    assert len(df) == 500
    assert df["mass_0"].isnull().sum() == 0


def test_deredden_equals_regeneration(setup):
    ic, _, df, dered = setup
    old = _regenerate_at_av0(ic, df)
    common = [c for c in dered.columns if c in old.columns]
    assert_frame_equal(
        dered[common].fillna(0), old[common].fillna(0), check_dtype=False, atol=1e-8
    )


def test_no_null_total_mags(setup):
    ic, _, df, _ = setup
    mags = [f"{b}_mag" for b in ic.bands]
    assert df[mags].isnull().sum().sum() == 0


def test_dereddening_preserves_params(setup):
    _, _, df, dered = setup
    cols = ["initial_mass_0", "initial_feh_0", "requested_age_0"]
    assert_frame_equal(df[cols], dered[cols])


def test_av_consistency(setup):
    ic, _, df, dered = setup
    is_binary = df["mass_1"] > 0
    for b in ic.bands[:3]:
        diff = (dered[f"{b}_mag"] + df[f"A_{b}_0"]) - df[f"{b}_mag"]
        assert diff.loc[~is_binary].std() < 1e-4


def test_extinction_addmags_identity(setup):
    ic, _, df, dered = setup
    b = ic.bands[0]
    lhs = df[f"{b}_mag"].values
    rhs = addmags(
        dered[f"{b}_mag_0"].values + df[f"A_{b}_0"].values,
        np.nan_to_num((dered[f"{b}_mag_1"] + df[f"A_{b}_1"]).values, nan=np.inf),
    )
    np.testing.assert_array_almost_equal(lhs, rhs)


def test_generate_corner_cases(setup):
    _, pop, _, _ = setup
    for i in range(5):
        df = pop.generate(10, rng=i)
        assert len(df) == 10


def test_sfh_grid():
    t = np.array([1.0, 2.0, 5.0, 10.0])
    sfh = StarFormationHistoryGrid(t, np.array([0.0, 1.0, 1.0, 0.5]))
    ages = sfh.sample_ages(1000, rng=0)
    assert np.isfinite(ages).all()
    assert (10 ** ages / 1e9 <= 10.0).all()


def test_binary_distribution():
    bd = BinaryDistribution(SalpeterPrior(bounds=(0.4, 8)), fB=0.5, gamma=0.3)
    pri, sec = bd.sample(2000, rng=0)
    assert ((sec > 0).mean() - 0.5) < 0.05
    mask = sec > 0
    q = sec[mask] / pri[mask]
    assert (q >= 0.2).all() and (q <= 1.0).all()
