"""CLI end-to-end tests (in-process main() invocations, tiny budgets)."""

import os

import numpy as np
import pytest


@pytest.fixture()
def star_folder(tmp_path):
    folder = tmp_path / "mystar"
    folder.mkdir()
    (folder / "star.ini").write_text(
        "RA = 10.0\ndec = 20.0\n"
        "Teff = 6460, 100.0\nlogg = 3.56, 0.1\nparallax = 5.0, 0.05\n\n"
        "[twomass]\nJ = 6.80, 0.02\nH = 6.54, 0.02\nK = 6.44, 0.02\n"
    )
    return str(folder)


@pytest.mark.slow
def test_starfit_cli(star_folder):
    from isochrones_tpu.cli.starfit import main

    rc = main([
        star_folder, "--models", "synthetic", "--n_live_points", "60",
        "--max_iter", "400", "--seed", "1", "--no_plots",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(star_folder, "synthetic_starmodel_single.h5"))
    assert os.path.exists(os.path.join(star_folder, "starfit.log"))

    # rerun without overwrite -> skip (file survives)
    mtime = os.path.getmtime(os.path.join(star_folder, "synthetic_starmodel_single.h5"))
    rc = main([star_folder, "--models", "synthetic", "--no_plots"])
    assert rc == 0
    assert os.path.getmtime(os.path.join(star_folder, "synthetic_starmodel_single.h5")) == mtime


@pytest.mark.slow
def test_starfit_cli_resume(star_folder, monkeypatch):
    """--resume writes the NS checkpoint under the model's chains basename
    (the reference's MultiNest chains/* resume role); --overwrite deletes
    it and refits fresh (the reference deletes the chains files on
    refit/overwrite — ADVICE r4: resuming a stale checkpoint under
    --overwrite silently replayed the old posterior)."""
    import isochrones_tpu.samplers.nested as nested
    from isochrones_tpu.cli.starfit import main

    loads = []
    orig_load = nested._ckpt_load
    monkeypatch.setattr(
        nested, "_ckpt_load", lambda p, c: (loads.append(p), orig_load(p, c))[1]
    )

    args = [
        star_folder, "--models", "synthetic", "--n_live_points", "60",
        "--max_iter", "400", "--seed", "1", "--no_plots", "--resume",
    ]
    rc = main(args)
    assert rc == 0
    chains = os.path.join(star_folder, "chains")
    ckpts = [f for f in os.listdir(chains) if f.endswith("checkpoint.pkl")]
    assert len(ckpts) == 1
    assert loads == []  # nothing to resume from on the first run

    # a rerun with --overwrite must REFIT (checkpoint deleted up front),
    # not resume the terminal checkpoint of the completed fit
    rc = main(args + ["--overwrite"])
    assert rc == 0
    assert loads == []
    assert os.path.exists(os.path.join(star_folder, "synthetic_starmodel_single.h5"))


@pytest.mark.slow
def test_starfit_cli_resume_continues_mid_run(star_folder, monkeypatch):
    """Genuine preemption recovery through the CLI (ADVICE r4): a fit that
    stopped at a small --max_iter hard cap leaves a mid-run checkpoint; if
    the process dies before the h5 is saved, a --resume rerun with a larger
    budget restores that state (not a fresh start) and completes."""
    import isochrones_tpu.samplers.nested as nested
    from isochrones_tpu.cli.starfit import main

    loads = []
    orig_load = nested._ckpt_load
    monkeypatch.setattr(
        nested, "_ckpt_load", lambda p, c: (loads.append(p), orig_load(p, c))[1]
    )

    base_args = [
        star_folder, "--models", "synthetic", "--n_live_points", "60",
        "--seed", "1", "--no_plots", "--resume",
    ]
    rc = main(base_args + ["--max_iter", "150"])
    assert rc == 0
    h5 = os.path.join(star_folder, "synthetic_starmodel_single.h5")
    chains = os.path.join(star_folder, "chains")
    ckpt = [f for f in os.listdir(chains) if f.endswith("checkpoint.pkl")]
    assert len(ckpt) == 1
    # simulate preemption between the last checkpoint write and the h5 save
    os.remove(h5)

    rc = main(base_args + ["--max_iter", "400"])
    assert rc == 0
    assert len(loads) == 1  # the rerun restored the mid-run checkpoint
    assert os.path.exists(h5)


def test_starfit_cli_resume_rejects_emcee(star_folder):
    from isochrones_tpu.cli.starfit import main

    with pytest.raises(SystemExit):
        main([star_folder, "--models", "synthetic", "--no_plots", "--resume", "--emcee"])


def test_select_and_summarize_cli(star_folder, tmp_path, capsys):
    from isochrones_tpu.cli.select import main as select_main
    from isochrones_tpu.cli.starfit import main as starfit_main
    from isochrones_tpu.cli.summarize import main as summarize_main

    starfit_main([
        star_folder, "--models", "synthetic", "--n_live_points", "60",
        "--max_iter", "400", "--seed", "1", "--no_plots",
    ])
    rc = select_main([star_folder, "--models", "synthetic"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "delta_lnZ" in out

    outfile = str(tmp_path / "summary.csv")
    rc = summarize_main([
        os.path.basename(star_folder), "--rootdir", os.path.dirname(star_folder),
        "--modelname", "synthetic_starmodel_single", "-O", outfile,
    ])
    assert rc == 0
    import pandas as pd

    df = pd.read_csv(outfile, index_col=0)
    assert "eep_50" in df.columns
    assert np.isfinite(df["eep_50"]).all()


@pytest.mark.slow
def test_generate_cmd_and_fit_catalog_cli(tmp_path):
    from isochrones_tpu.cli.fit_catalog import main as fit_main
    from isochrones_tpu.cli.generate_cmd import main as gen_main

    cmd_file = str(tmp_path / "cmd.csv")
    rc = gen_main(["-N", "16", "--models", "synthetic", "--seed", "3", "-o", cmd_file])
    assert rc == 0
    assert os.path.exists(cmd_file)

    out_file = str(tmp_path / "fits.csv")
    rc = fit_main([
        cmd_file, "--models", "synthetic", "--props", "parallax",
        "--nwalkers", "32", "--nburn", "100", "--niter", "30", "--seed", "0",
        "-O", out_file,
    ])
    assert rc == 0
    import pandas as pd

    df = pd.read_csv(out_file, index_col=0)
    assert len(df) == 16
    assert (df["distance_16"] <= df["distance_84"]).all()


def test_batch_starfit_script(tmp_path):
    from isochrones_tpu.starfit import batch_starfit_script

    listfile = str(tmp_path / "folders.txt")
    with open(listfile, "w") as f:
        f.write("star1\nstar2\nstar3\n")
    script = batch_starfit_script(listfile, ntasks_per_node=2, minutes_per_fit=5)
    with open(script) as fh:
        text = fh.read()
    assert "#SBATCH" in text
    assert "xargs starfit" in text


def _fake_gaia_table(ra, dec, radius, name):
    import pandas as pd

    return pd.DataFrame({
        "_RAJ2000": [ra], "_DEJ2000": [dec],
        "Gmag": [12.0], "e_Gmag": [0.001],
        "BPmag": [12.3], "e_BPmag": [0.002],
        "RPmag": [11.5], "e_RPmag": [0.002],
        "Plx": [4.0], "e_Plx": [0.1],
        "RPlx": [50.0], "RFG": [100.0], "RFRP": [50.0], "RFBP": [50.0],
        "Nper": [10], "chi2AL": [100.0], "NgAL": [105], "Source": [111],
    })


def test_gaia_data_and_ini_update(star_folder, monkeypatch):
    """get_gaia_data + update_ini_with_gaia: the native --gaia machinery
    (reference gates this on the external tgastars package)."""
    from isochrones_tpu.iniparse import parse_ini, parse_value
    from isochrones_tpu.query import Gaia
    from isochrones_tpu.starfit import get_gaia_data, update_ini_with_gaia
    from isochrones_tpu.treemodel import StarModel

    monkeypatch.setattr(Gaia, "table_provider", staticmethod(_fake_gaia_table))
    data = get_gaia_data(10.0, 20.0)
    assert data["parallax"] == (4.0, 0.1)
    assert float(data["G"][0]) == 12.0

    ini_path = os.path.join(star_folder, "star.ini")
    update_ini_with_gaia(ini_path, data)
    update_ini_with_gaia(ini_path, data)  # idempotent: replaces, not appends
    c = parse_ini(ini_path)
    assert parse_value(c["parallax"]) == [4.0, 0.1]
    assert parse_value(c["gaia"]["G"])[0] == 12.0
    with open(ini_path) as fh:
        text = fh.read()
    assert text.count("parallax") == 1
    assert text.count("\n\n\n") == 0  # no blank-line churn across rewrites
    # the [gaia] photometry participates in band discovery
    assert "G" in StarModel.get_bands(ini_path)
    # and the original sections survive
    assert parse_value(c["twomass"]["J"]) == [6.80, 0.02]
    # parallax-only data removes a previously written [gaia] section
    update_ini_with_gaia(ini_path, {"parallax": data["parallax"]})
    with open(ini_path) as fh:
        assert "[gaia]" not in fh.read()


@pytest.mark.slow
def test_starfit_gaia_cli(star_folder, monkeypatch):
    """starfit --gaia --write_ini: fit conditioned on the queried parallax
    and G/BP/RP photometry (the synthetic grid carries the Gaia system)."""
    from isochrones_tpu.query import Gaia

    monkeypatch.setattr(Gaia, "table_provider", staticmethod(_fake_gaia_table))
    from isochrones_tpu.cli.starfit import main

    rc = main([
        os.path.basename(star_folder), "--rootdir", os.path.dirname(star_folder),
        "--models", "synthetic", "--n_live_points", "60",
        "--max_iter", "400", "--seed", "1", "--no_plots", "--gaia", "--write_ini",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(star_folder, "synthetic_starmodel_single.h5"))
    with open(os.path.join(star_folder, "star.ini")) as fh:
        ini = fh.read()
    assert "parallax = 4.0, 0.1" in ini
    assert "[gaia]" in ini and "G = 12.0" in ini


def test_summarize_results_txt(star_folder):
    """--results-txt mode writes the reference's per-folder med/lo/hi table
    (scripts/starfit-summarize:75-110)."""
    from isochrones_tpu.cli.starfit import main as starfit_main
    from isochrones_tpu.cli.summarize import main as summarize_main

    starfit_main([
        star_folder, "--models", "synthetic", "--n_live_points", "60",
        "--max_iter", "400", "--seed", "1", "--no_plots",
    ])
    rc = summarize_main([
        os.path.basename(star_folder), "--rootdir", os.path.dirname(star_folder),
        "--models", "synthetic", "--results-txt",
    ])
    assert rc == 0
    rf = os.path.join(star_folder, "synthetic_single_results.txt")
    with open(rf) as fh:
        header, vals = fh.read().splitlines()
    assert header.split()[:3] == ["mass", "mass_lo", "mass_hi"]
    nums = [float(x) for x in vals.split()]
    assert len(nums) == 24
    med_mass, lo_mass, hi_mass = nums[0:3]
    assert lo_mass <= med_mass <= hi_mass


@pytest.mark.slow
def test_starfit_gaia_fallback_parallax_only(star_folder, monkeypatch):
    """Grid without Gaia bands: --gaia falls back to parallax-only and the
    fit still completes (even with --write_ini, which must strip the
    just-written [gaia] photometry)."""
    from isochrones_tpu import isochrone as iso_mod
    from isochrones_tpu.query import Gaia

    monkeypatch.setattr(Gaia, "table_provider", staticmethod(_fake_gaia_table))
    real_get_ichrone = iso_mod.get_ichrone

    def no_gaia_bands(models, bands=None, **kw):
        if bands and any(b in ("G", "BP", "RP") for b in bands):
            raise ValueError("grid lacks the Gaia system")
        return real_get_ichrone(models, bands, **kw)

    monkeypatch.setattr(iso_mod, "get_ichrone", no_gaia_bands)
    from isochrones_tpu.cli.starfit import main

    rc = main([
        star_folder, "--models", "synthetic", "--n_live_points", "60",
        "--max_iter", "400", "--seed", "1", "--no_plots", "--gaia", "--write_ini",
    ])
    assert rc == 0
    # the fit must have actually happened (starfit swallows per-folder errors)
    assert os.path.exists(os.path.join(star_folder, "synthetic_starmodel_single.h5"))
    with open(os.path.join(star_folder, "star.ini")) as fh:
        ini = fh.read()
    assert "parallax = 4.0, 0.1" in ini
    assert "[gaia]" not in ini  # photometry dropped in the fallback
