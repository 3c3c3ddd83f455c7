"""Query-subsystem tests against injected fake tables (the reference's
network tests are skipped even upstream, test_query.py:21-41 'Gaia query
breaks'; here the catalog logic is tested hermetically)."""

import numpy as np
import pandas as pd
import pytest

from isochrones_tpu.query import EmptyQueryError, Gaia, Query, TwoMASS, Tycho2, WISE
from isochrones_tpu.query.query import position_angle_deg, separation_arcsec


def test_query_pm_propagation():
    q = Query(100.0, 30.0, pmra=100.0, pmdec=-50.0, epoch=2000.0, radius=5)
    ra, dec = q.coords_at_epoch(2000.0)
    assert (ra, dec) == (100.0, 30.0)
    ra, dec = q.coords_at_epoch(1990.0)
    # dt = 2000 - 1990 = 10 yr; dec -= dt * pmdec -> +500 mas
    assert dec > 30.0
    assert abs((dec - 30.0) * 3.6e6 - 10 * 50.0) < 1e-6


def test_separation_and_pa():
    assert abs(separation_arcsec(10.0, 0.0, 10.0, 1.0 / 3600) - 1.0) < 1e-6
    assert abs(position_angle_deg(10.0, 0.0, 10.0, 1.0) - 0.0) < 1e-9  # due north
    assert abs(position_angle_deg(10.0, 0.0, 10.0 + 1.0, 0.0) - 90.0) < 0.01  # due east


def _fake_2mass(ra, dec, radius, vizier_name):
    return pd.DataFrame(
        {
            # NB the base quality cut is _r > 0 (reference catalog.py:107-111),
            # so even the "close" source must sit slightly off the query position
            "_RAJ2000": [ra + 0.0001, ra + 0.000001],
            "_DEJ2000": [dec, dec],
            "Jmag": [10.0, 9.0],
            "e_Jmag": [0.02, 0.02],
            "Hmag": [9.8, 8.8],
            "e_Hmag": [0.03, 0.02],
            "Kmag": [9.7, 8.7],
            "e_Kmag": [0.02, 0.02],
            "_2MASS": ["far", "close"],
        }
    )


def test_twomass_photometry(monkeypatch):
    monkeypatch.setattr(TwoMASS, "table_provider", staticmethod(_fake_2mass))
    cat = TwoMASS(Query(120.0, -20.0))
    phot = cat.get_photometry(systematic_unc=0.01)
    assert set(phot) == {"J", "H", "K"}
    mag, unc = phot["J"]
    assert mag == 9.0  # closest row
    assert unc == pytest.approx(np.sqrt(0.02 ** 2 + 0.01 ** 2))
    assert cat.get_id() == "close"
    assert cat.get_id(brightest=True) == "close"
    # _r computed from coordinates
    assert (cat.table["_r"].values >= 0).all()


def test_empty_query(monkeypatch):
    monkeypatch.setattr(TwoMASS, "table_provider", staticmethod(lambda *a: None))
    cat = TwoMASS(Query(0.0, 0.0))
    with pytest.raises(EmptyQueryError):
        _ = cat.table


def test_tycho_conversions(monkeypatch):
    def fake(ra, dec, radius, name):
        return pd.DataFrame(
            {
                "_RAJ2000": [ra + 0.000001], "_DEJ2000": [dec],
                "BTmag": [10.6], "e_BTmag": [0.03],
                "VTmag": [10.0], "e_VTmag": [0.02],
                "TYC1": [1], "TYC2": [2], "TYC3": [3],
            }
        )

    monkeypatch.setattr(Tycho2, "table_provider", staticmethod(fake))
    cat = Tycho2(Query(50.0, 10.0))
    V, dV = cat.V()
    B, dB = cat.B()
    # BT-VT = 0.6: V = VT + a - b x + c x^2 - d x^3
    x = 0.6
    V_expected = 10.0 + 0.00097 - 0.1334 * x + 0.05486 * x ** 2 - 0.01998 * x ** 3
    assert V == pytest.approx(V_expected, abs=1e-10)
    assert B > V  # BT-VT positive -> B brighter value (larger mag)
    phot = cat.get_photometry()
    assert set(phot) == {"B", "V"}
    assert cat.get_id() == "1-2-3"


def test_gaia_quality_cuts(monkeypatch):
    def fake(ra, dec, radius, name):
        return pd.DataFrame(
            {
                "_RAJ2000": [ra, ra], "_DEJ2000": [dec, dec],
                "Gmag": [12.0, 12.5], "e_Gmag": [0.001, 0.001],
                "BPmag": [12.3, 12.8], "e_BPmag": [0.002, 0.002],
                "RPmag": [11.5, 12.0], "e_RPmag": [0.002, 0.002],
                "RPlx": [50.0, 5.0],  # second row fails RPlx > 10
                "RFG": [100.0, 100.0],
                "RFRP": [50.0, 50.0],
                "RFBP": [50.0, 50.0],
                "Nper": [10, 10],
                "chi2AL": [100.0, 100.0],
                "NgAL": [105, 105],
                "Source": [111, 222],
            }
        )

    monkeypatch.setattr(Gaia, "table_provider", staticmethod(fake))
    cat = Gaia(Query(80.0, 5.0))
    df = cat.df
    assert len(df) == 1
    assert cat.get_id() == 111


def test_extinction_offline(monkeypatch):
    from isochrones_tpu import config, extinction

    monkeypatch.setattr(config, "OFFLINE", True)
    with pytest.raises(RuntimeError, match="Offline"):
        extinction.get_AV_infinity(280.0, 45.0)


def test_extinction_url_formatting(monkeypatch):
    """Capture the URL instead of hitting the network."""
    from isochrones_tpu import extinction

    captured = {}

    class FakeResponse:
        def readlines(self):
            return [b"Landolt V (0.54)             0.123  mag\n"]

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    def fake_urlopen(url):
        captured["url"] = url
        return FakeResponse()

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    av = extinction.get_AV_infinity(280.5, 45.25)
    assert av == 0.123
    assert "nph-calc" in captured["url"]
    assert "%2B45%3A15%3A00.00" in captured["url"]  # +45d15m
