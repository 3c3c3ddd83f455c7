"""Generators for fake MIST-format data files (hermetic pipeline tests).

Writes ``.track.eep``, ``.iso``, and BC text tables in the exact layouts the
real MIST distribution uses (headers, filename conventions, comment style),
filled with the synthetic analytic physics from
``isochrones_tpu.grids.synthetic`` so parsed values are smooth and
physically consistent.
"""

import os
import tarfile

import numpy as np

from isochrones_tpu.grids.synthetic import _bc_value, _log_age, _stellar_props

TRACK_COLUMNS = (
    "star_age", "star_mass", "log_Teff", "log_g", "log_L", "log_R",
    "log_surf_z", "surface_h1", "delta_nu", "nu_max", "phase",
)
ISO_COLUMNS = (
    "EEP", "log10_isochrone_age_yr", "initial_mass", "star_mass", "log_Teff",
    "log_g", "log_L", "log_R", "log_surf_z", "surface_h1", "delta_nu",
    "nu_max", "phase",
)

SURFACE_H1 = 0.7
Z_SUN = 0.0181


def _surf_z(feh):
    # invert feh = log_surf_z - log10(surface_h1) - log10(0.0181)
    return 10 ** (feh + np.log10(SURFACE_H1) + np.log10(Z_SUN))


def _row_values(mass, feh, eep, n_eep_total):
    frac = eep / n_eep_total
    p = _stellar_props(mass, feh, frac)
    log_age = _log_age(mass, frac)
    return dict(
        star_age=10 ** log_age,
        star_mass=mass,
        log_Teff=p["logTeff"],
        log_g=p["logg"],
        log_L=p["logL"],
        log_R=np.log10(p["radius"]),
        log_surf_z=np.log10(_surf_z(feh)),
        surface_h1=SURFACE_H1,
        delta_nu=p["delta_nu"],
        nu_max=p["nu_max"],
        phase=0.0,
    )


def write_track_file(directory, mass, feh, n_rows, n_eep_total=1710):
    """One ``XXXXXM.track.eep`` file with the real header conventions."""
    fn = os.path.join(directory, "{:05.0f}M.track.eep".format(mass * 100))
    with open(fn, "w") as f:
        f.write("# MIST-format synthetic track (test fixture)\n")
        f.write("# EEPs: " + " ".join(str(i) for i in range(1, n_rows + 1)) + "\n")
        f.write("#  " + " ".join(TRACK_COLUMNS) + "\n")
        for eep in range(1, n_rows + 1):
            v = _row_values(mass, feh, eep, n_eep_total)
            f.write(" ".join(f"{v[c]:.8g}" for c in TRACK_COLUMNS) + "\n")
    return fn


def make_track_tree(root, fehs=(-0.5, 0.0), masses=(0.7, 0.8, 0.9),
                    short={}, n_eep=60, version="1.2", vvcrit=0.4, afe=0.0):
    """Build the tracks directory tree for MISTEvolutionTrackGrid.

    short : {(feh, mass): n_rows} override for incomplete tracks.
    """
    datadir = os.path.join(root, "mist", "tracks")
    for feh in fehs:
        fs = "m" if feh < 0 else "p"
        basename = (
            f"MIST_v{version}_feh_{fs}{abs(feh):.2f}_afe_p{abs(afe):.1f}"
            f"_vvcrit{vvcrit:.1f}_EEPS"
        )
        d = os.path.join(datadir, basename)
        os.makedirs(d, exist_ok=True)
        for m in masses:
            n_rows = short.get((feh, m), n_eep)
            write_track_file(d, m, feh, n_rows, n_eep_total=n_eep)
    return datadir


def write_iso_file(directory, feh, ages, masses, n_eep=60, version="1.2", vvcrit=0.4):
    """One ``.iso`` file: multiple isochrones stacked (reference layout)."""
    fs = "m" if feh < 0 else "p"
    fn = os.path.join(
        directory, f"MIST_v{version}_feh_{fs}{abs(feh):.2f}_afe_p0.0_vvcrit{vvcrit:.1f}_full.iso"
    )
    from isochrones_tpu.grids.synthetic import _mass_from_age

    with open(fn, "w") as f:
        f.write("# MIST-format synthetic isochrones (test fixture)\n")
        f.write("# " + " ".join(ISO_COLUMNS) + "\n")
        for age in ages:
            for eep in range(1, n_eep + 1):
                frac = eep / n_eep
                mass = float(_mass_from_age(age, frac))
                if not (masses[0] <= mass <= masses[-1]):
                    continue
                v = _row_values(mass, feh, eep, n_eep)
                row = dict(v)
                row["EEP"] = eep
                row["log10_isochrone_age_yr"] = age
                row["initial_mass"] = mass
                f.write(" ".join(f"{row[c]:.8g}" for c in ISO_COLUMNS) + "\n")
    return fn


def make_iso_tree(root, fehs=(-0.5, 0.0), ages=(8.0, 8.5, 9.0), masses=(0.3, 3.0),
                  n_eep=60, version="1.2", vvcrit=0.4, kind="full_isos"):
    d = os.path.join(root, "mist", f"MIST_v{version}_vvcrit{vvcrit}_{kind}")
    os.makedirs(d, exist_ok=True)
    for feh in fehs:
        write_iso_file(d, feh, ages, masses, n_eep=n_eep, version=version, vvcrit=vvcrit)
    return d


def make_bc_tree(root, systems=("UBVRIplus", "WISE"), fehs=(-0.5, 0.0)):
    """BC tables per system, MIST layout: header comment block with column
    names on line 6; full (Teff, logg, feh, Av, Rv=3.1) product per file."""
    from isochrones_tpu.grids.mist import MISTBolometricCorrectionGrid

    teffs = np.array([3000.0, 4500.0, 6000.0, 8000.0, 12000.0])
    loggs = np.array([1.0, 3.0, 5.0])
    avs = np.array([0.0, 1.0, 3.0])
    rv = 3.1

    datadir = os.path.join(root, "BC", "mist")
    os.makedirs(datadir, exist_ok=True)
    for phot in systems:
        bands = MISTBolometricCorrectionGrid.phot_bands[phot]
        for feh in fehs:
            fs = "m" if feh < 0 else "p"
            fn = os.path.join(datadir, "feh{0}{1:03.0f}.{2}".format(fs, abs(feh) * 100, phot))
            with open(fn, "w") as f:
                for _ in range(5):
                    f.write("# synthetic MIST BC table (test fixture)\n")
                f.write("# Teff logg [Fe/H] Av Rv " + " ".join(bands) + "\n")
                for T in teffs:
                    for g in loggs:
                        for av in avs:
                            vals = [
                                _bc_value_any(b, np.log10(T), g, feh, av) for b in bands
                            ]
                            f.write(
                                f"{T:.1f} {g:.2f} {feh:.2f} {av:.2f} {rv:.1f} "
                                + " ".join(f"{v:.6f}" for v in vals) + "\n"
                            )
    return datadir


def _bc_value_any(band, logTeff, logg, feh, AV):
    """Toy BC for arbitrary MIST band names (hash-derived coefficients for
    bands outside the synthetic-grid tables)."""
    from isochrones_tpu.grids.synthetic import _BAND_EXT, _BAND_ZP

    short = band.split("_")[-1] if "_" in band else band
    if short in _BAND_ZP:
        return float(_bc_value(short, logTeff, logg, feh, AV))
    h = (hash(band) % 1000) / 1000.0
    zp = (h - 0.5) * 2.0
    ext = 0.1 + h
    x = logTeff - 3.77
    return float(zp - 3.2 * x ** 2 + 0.45 * x - 0.04 * (logg - 4.4) + 0.06 * feh - ext * AV)


def make_full_mist_fixture(root, **kwargs):
    """Full fixture tree: tracks + isos + BC tables under ``root``."""
    # a short track at (0.0, 0.8) exercises the ragged-completion path;
    # max_eep for these masses at these fehs is the default 1710, so tests
    # monkeypatch max_eep to the fixture n_eep (see test_mist_pipeline).
    make_track_tree(root, short={(0.0, 0.8): 40}, **kwargs.get("track_kwargs", {}))
    make_iso_tree(root, **kwargs.get("iso_kwargs", {}))
    make_bc_tree(root, **kwargs.get("bc_kwargs", {}))
    return root
