"""Nested-sampling checkpoint/resume (VERDICT r3 missing #2).

The reference's default engine checkpoints for free — MultiNest resumes
from its ``chains/*`` files (reference ``isochrones/starmodel.py:779-797``).
Here ``run_nested(checkpoint=..., resume=...)`` persists the full sampler
state at every compiled chunk boundary (and every dynamic thread round);
the acceptance bar is the same as the mesh-sharding tests: a resumed run
must reproduce the uninterrupted run BITWISE.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isochrones_tpu.samplers.nested import run_nested, run_nested_vmapped

MU = np.array([0.3, -0.2])
SIG = np.array([0.15, 0.1])


def lnpost_v(x):
    return -0.5 * jnp.sum(((x - MU) / SIG) ** 2 + jnp.log(2 * jnp.pi * SIG ** 2), axis=-1)


def prior_transform(u):
    return u * 4.0 - 2.0  # box [-2, 2]^2


def _assert_same(a, b):
    assert a.logz == b.logz
    assert a.logzerr == b.logzerr
    assert a.ess == b.ess
    assert a.n_iter == b.n_iter
    np.testing.assert_array_equal(a.samples, b.samples)
    np.testing.assert_array_equal(a.logl, b.logl)
    np.testing.assert_array_equal(a.posterior, b.posterior)
    np.testing.assert_array_equal(a.logl_posterior, b.logl_posterior)


def test_single_run_resume_bitwise(tmp_path):
    """Interrupt a static run at a chunk boundary (via max_iter aligned to
    the chunk size); resuming must reproduce the uninterrupted run bitwise."""
    kw = dict(n_live=100, n_batch=8, n_chains=4, n_repeat=8)
    key = jax.random.PRNGKey(3)
    full = run_nested(lnpost_v, prior_transform, 2, key, rng=5, **kw)

    ck = str(tmp_path / "ns.ckpt")
    # chunk = max(n_live, 256) = 256 deaths per chunk -> max_iter=256 stops
    # after exactly one full-size chunk (a "kill" at the chunk boundary)
    part = run_nested(
        lnpost_v, prior_transform, 2, key, rng=5, max_iter=256,
        checkpoint=ck, **kw,
    )
    assert os.path.exists(ck)
    assert part.n_iter == 256 < full.n_iter

    resumed = run_nested(
        lnpost_v, prior_transform, 2, key, rng=5, checkpoint=ck, resume=True,
        **kw,
    )
    _assert_same(full, resumed)


def test_single_run_resume_after_complete_is_stable(tmp_path):
    """Resuming from a checkpoint of a COMPLETED run returns the same result
    without running new chunks."""
    kw = dict(n_live=100, n_batch=8, n_chains=4, n_repeat=8)
    key = jax.random.PRNGKey(3)
    ck = str(tmp_path / "ns.ckpt")
    full = run_nested(lnpost_v, prior_transform, 2, key, rng=5, checkpoint=ck, **kw)
    again = run_nested(
        lnpost_v, prior_transform, 2, key, rng=5, checkpoint=ck, resume=True, **kw
    )
    _assert_same(full, again)


def test_config_mismatch_raises(tmp_path):
    ck = str(tmp_path / "ns.ckpt")
    key = jax.random.PRNGKey(3)
    run_nested(
        lnpost_v, prior_transform, 2, key, rng=5, n_live=100, n_batch=8,
        n_chains=4, n_repeat=8, max_iter=256, checkpoint=ck,
    )
    with pytest.raises(ValueError, match="different sampler configuration"):
        run_nested(
            lnpost_v, prior_transform, 2, key, rng=5, n_live=120, n_batch=8,
            n_chains=4, n_repeat=8, checkpoint=ck, resume=True,
        )


def test_config_tag_mismatch_raises(tmp_path):
    """A checkpoint written for a different PROBLEM (config_tag: observed
    data / bounds / seed hash) refuses to resume (ADVICE r4: without it, a
    user who edits star.ini and reruns --resume silently replays the old
    posterior)."""
    from isochrones_tpu.samplers.nested import CheckpointConfigError

    ck = str(tmp_path / "ns.ckpt")
    key = jax.random.PRNGKey(3)
    kw = dict(n_live=100, n_batch=8, n_chains=4, n_repeat=8)
    run_nested(lnpost_v, prior_transform, 2, key, rng=5, max_iter=256,
               checkpoint=ck, config_tag="data-hash-A", **kw)
    with pytest.raises(CheckpointConfigError, match="different sampler configuration"):
        run_nested(lnpost_v, prior_transform, 2, key, rng=5, checkpoint=ck,
                   resume=True, config_tag="data-hash-B", **kw)


def test_fit_multinest_overwrite_deletes_checkpoint(tmp_path):
    """fit_multinest(resume=True, overwrite=True) must refit fresh — the
    reference deletes the MultiNest chains files on refit/overwrite
    (reference starmodel.py:775-777); resuming a stale terminal checkpoint
    instead silently replays the old fit (ADVICE r4 medium)."""
    from isochrones_tpu import get_ichrone
    from isochrones_tpu.starmodel import SingleStarModel

    iso = get_ichrone("synthetic")
    pars = [350.0, 9.0, 0.0, 200.0, 0.1]
    Teff, logg, _, mags = iso.interp_mag(pars, ["J", "K"])
    model = SingleStarModel(
        iso, Teff=(float(Teff), 100.0), logg=(float(logg), 0.1),
        J=(float(np.asarray(mags)[0]), 0.02), K=(float(np.asarray(mags)[1]), 0.02),
        parallax=(5.0, 0.05), name="ckpt-ow", directory=str(tmp_path),
    )
    ck = str(tmp_path / "m.ckpt")
    kw = dict(n_live_points=60, max_iter=200, seed=1, checkpoint=ck,
              n_batch=8, n_chains=4)
    model.fit_multinest(**kw)
    assert os.path.exists(ck)
    mtime = os.path.getmtime(ck)

    import isochrones_tpu.samplers.nested as nested

    loads = []
    orig_load = nested._ckpt_load
    try:
        nested._ckpt_load = lambda p, c: (loads.append(p), orig_load(p, c))[1]
        model.fit_multinest(resume=True, overwrite=True, **kw)
    finally:
        nested._ckpt_load = orig_load
    assert loads == []  # refit fresh: the stale checkpoint was deleted
    assert os.path.getmtime(ck) > mtime  # and a new one written

    # a changed seed refuses to resume the (new) checkpoint
    from isochrones_tpu.samplers.nested import CheckpointConfigError

    with pytest.raises(CheckpointConfigError):
        model.fit_multinest(**{**kw, "seed": 2}, resume=True)


def test_dynamic_resume_bitwise(tmp_path):
    """Interrupt a dynamic run at a thread-round boundary (via
    max_dynamic_rounds=1); resuming with the full round budget must
    reproduce the uninterrupted dynamic run bitwise."""
    kw = dict(n_live=100, n_batch=8, n_chains=4, n_repeat=8, dynamic=True,
              min_ess=1200)
    key = jax.random.PRNGKey(7)
    full = run_nested(lnpost_v, prior_transform, 2, key, rng=9, **kw)
    assert full.dynamic_rounds >= 2, "fixture must need >= 2 thread rounds"

    ck = str(tmp_path / "dyn.ckpt")
    part = run_nested(
        lnpost_v, prior_transform, 2, key, rng=9, checkpoint=ck,
        max_dynamic_rounds=1, **{k: v for k, v in kw.items() if k != "max_dynamic_rounds"},
    )
    assert part.dynamic_rounds == 1

    resumed = run_nested(
        lnpost_v, prior_transform, 2, key, rng=9, checkpoint=ck, resume=True, **kw
    )
    assert resumed.dynamic_rounds == full.dynamic_rounds
    _assert_same(full, resumed)


def _family_setup(M=3, n_live=80):
    offsets = jnp.linspace(-0.5, 0.5, M)[:, None] + jnp.asarray(MU)[None, :]

    def make_lnlike_u(mu):
        def lnlike_u(u):
            x = prior_transform(u)
            return -0.5 * jnp.sum(((x - mu) / SIG) ** 2, axis=-1)

        return lnlike_u

    rng = np.random.default_rng(11)
    live_u = rng.random((M, n_live, 2))
    live_lnl = np.stack([
        np.asarray(make_lnlike_u(offsets[m])(jnp.asarray(live_u[m]))) for m in range(M)
    ])
    return make_lnlike_u, offsets, live_u, live_lnl


def test_vmapped_resume_bitwise(tmp_path):
    make_lnlike_u, data, live_u, live_lnl = _family_setup()
    kw = dict(n_live=80, n_batch=8, n_chains=4, n_repeat=8, seed=13)
    full = run_nested_vmapped(make_lnlike_u, data, live_u, live_lnl, **kw)

    ck = str(tmp_path / "fam.ckpt")
    part = run_nested_vmapped(
        make_lnlike_u, data, live_u, live_lnl, max_iter=256, checkpoint=ck, **kw
    )
    assert part["n_dead"] == 256 < full["n_dead"]

    resumed = run_nested_vmapped(
        make_lnlike_u, data, live_u, live_lnl, checkpoint=ck, resume=True, **kw
    )
    np.testing.assert_array_equal(full["logz"], resumed["logz"])
    np.testing.assert_array_equal(full["ess"], resumed["ess"])
    np.testing.assert_array_equal(full["samples_u"], resumed["samples_u"])
    np.testing.assert_array_equal(full["lnl"], resumed["lnl"])
    np.testing.assert_array_equal(full["converged"], resumed["converged"])
    assert full["n_dead"] == resumed["n_dead"]


def test_batch_fitter_checkpoint_roundtrip(tmp_path):
    """BatchStarFitter.fit_multinest(checkpoint=..., resume=...) end-to-end:
    a resumed whole-catalog fit matches the uninterrupted one bitwise."""
    import pandas as pd

    from isochrones_tpu import get_ichrone
    from isochrones_tpu.batch import BatchStarFitter
    from isochrones_tpu.catalog import StarCatalog

    iso = get_ichrone("synthetic", n_feh=5, n_mass=24, n_eep=60, n_age=20)
    rng = np.random.default_rng(3)
    eep, age, feh, dist, av = [40.0, 50.0], [8.8, 9.0], [0.0, -0.1], [200.0, 250.0], [0.05, 0.1]
    _, _, _, mags = iso.interp_mag([eep, age, feh, dist, av], ["J", "H", "K"])
    mags = np.asarray(mags)
    rows = {}
    for i, b in enumerate(("J", "H", "K")):
        rows[f"{b}_mag"] = mags[:, i] + rng.normal(0, 0.02, 2)
        rows[f"{b}_mag_unc"] = 0.02
    rows["parallax"] = 1000.0 / np.asarray(dist)
    rows["parallax_unc"] = 0.05
    cat = StarCatalog(pd.DataFrame(rows), bands=("J", "H", "K"), props=("parallax",))
    kw = dict(n_live_points=60, n_batch=4, n_chains=4, seed=5)

    f_full = BatchStarFitter(iso, cat)
    full = f_full.fit_multinest(**kw)

    ck = str(tmp_path / "batch.ckpt")
    f_part = BatchStarFitter(iso, cat)
    f_part.fit_multinest(max_iter=256, checkpoint=ck, **kw)

    f_res = BatchStarFitter(iso, cat)
    res = f_res.fit_multinest(checkpoint=ck, resume=True, **kw)
    np.testing.assert_array_equal(full["logz"], res["logz"])
    np.testing.assert_array_equal(f_full.samples, f_res.samples)


def test_config_hash_covers_tree_and_cluster_data():
    """Tree and cluster models keep their data outside self.kwargs; the
    checkpoint problem-hash must still change when that data changes
    (self-review r5: the base-class hash gave identical tags for entirely
    different observations, silently disabling the stale-resume guard)."""
    from isochrones_tpu import get_ichrone
    from isochrones_tpu.cluster import SimulatedCluster, StarClusterModel
    from isochrones_tpu.treemodel import StarModel

    iso = get_ichrone("synthetic", n_feh=5, n_mass=20, n_eep=60, n_age=20)

    t1 = StarModel(iso, Teff=(6000.0, 100.0), J=(7.0, 0.02), parallax=(5.0, 0.05))
    t2 = StarModel(iso, Teff=(5500.0, 100.0), J=(8.3, 0.02), parallax=(2.0, 0.05))
    t1b = StarModel(iso, Teff=(6000.0, 100.0), J=(7.0, 0.02), parallax=(5.0, 0.05))
    assert t1._fit_config_hash(0) != t2._fit_config_hash(0)
    assert t1._fit_config_hash(0) == t1b._fit_config_hash(0)  # deterministic
    assert t1._fit_config_hash(0) != t1._fit_config_hash(1)  # seed covered

    def cluster(rng):
        sim = SimulatedCluster(
            6, age=9.0, feh=0.0, distance=300.0, AV=0.05, alpha=-2.0,
            gamma=0.3, fB=0.3, bands=("J", "K"), mass_range=(0.6, 2.0),
            ic=iso, rng=rng,
        )
        return StarClusterModel(iso, sim, eep_bounds=(1, 50), max_distance=2000)

    c1, c2, c1b = cluster(0), cluster(3), cluster(0)
    assert c1._fit_config_hash(0) != c2._fit_config_hash(0)
    assert c1._fit_config_hash(0) == c1b._fit_config_hash(0)
