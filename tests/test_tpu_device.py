"""Opt-in on-chip tier: ``ISOTPU_TEST_TPU=1 pytest -m tpu``.

The CI tier exercises the pallas cluster kernel only in interpret mode and
the device-resident generate path only on the CPU backend; a compiled-kernel
(Mosaic) regression would otherwise surface first at bench time (round-2
verdict, "what's weak" #6). This module runs the same parity assertions on
the real TPU in its native f32.

Shapes here are deliberately small and fixed — every new shape costs a cold
XLA/Mosaic compile through the tunnel (minutes); the persistent compile
cache makes reruns take seconds.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu",
        reason="needs the real TPU backend (run with ISOTPU_TEST_TPU=1)",
    ),
]


def _cluster_fixture(seed, S=8, E=128, B=3):
    rng = np.random.default_rng(seed)
    f32 = jnp.float32
    model_mags = jnp.asarray(rng.normal(8.0, 1.0, (E, B)), dtype=f32)
    masses = jnp.asarray(np.linspace(0.4, 2.2, E), dtype=f32)
    ln_dm = jnp.asarray(rng.normal(-4.0, 0.3, E), dtype=f32)
    eeps = jnp.asarray(np.linspace(1.0, 260.0, E), dtype=f32)
    lnlike_prop = jnp.asarray(rng.normal(-1.0, 0.5, (S, E)), dtype=f32)
    mag_values = jnp.asarray(rng.normal(8.0, 0.8, (S, B)), dtype=f32)
    mag_uncs = jnp.full((S, B), 0.05, dtype=f32)
    valid = jnp.asarray(rng.random(E) > 0.05)
    return dict(
        lnlike_prop=lnlike_prop, model_mags=model_mags, masses=masses,
        ln_dm_deeps=ln_dm, eeps=eeps, mag_values=mag_values,
        mag_uncs=mag_uncs, alpha=-2.0, gamma=0.3, fB=0.35,
        mass_lo=0.4, mass_hi=2.2, q_lo=0.2, valid=valid,
    )


@pytest.mark.parametrize("q_jacobian", [False, True])
def test_compiled_pallas_matches_xla_on_chip(q_jacobian):
    """Compiled (Mosaic) pallas cluster marginal == XLA grid path on the
    real chip, f32. The CI tier checks this in interpret mode only."""
    from isochrones_tpu.ops.cluster import cluster_lnmarginal

    kw = _cluster_fixture(3)
    ref = np.asarray(
        cluster_lnmarginal(**kw, use_pallas=False, q_jacobian=q_jacobian)
    )
    got = np.asarray(
        cluster_lnmarginal(**kw, use_pallas=True, q_jacobian=q_jacobian)
    )
    m = np.isfinite(ref)
    assert m.any()
    np.testing.assert_allclose(got[m], ref[m], rtol=5e-4)
    assert np.array_equal(np.isfinite(got), m)


def test_generate_device_on_chip():
    """Device-resident generate returns finite on-device f32 arrays matching
    the host path (which reads back through the tunnel)."""
    from isochrones_tpu import get_ichrone

    iso = get_ichrone("synthetic", n_feh=5, n_mass=16, n_eep=50, n_age=16)
    mass = jnp.asarray(
        np.random.default_rng(0).uniform(0.5, 1.4, 512), dtype=jnp.float32
    )
    eeps, values, mags = iso.generate_device(mass, 9.0, 0.0, bands=["J", "H"])
    assert isinstance(mags, jax.Array) and mags.dtype == jnp.float32
    mags_h = np.asarray(mags)
    assert np.isfinite(mags_h).mean() > 0.5
    df = iso.generate(np.asarray(mass), 9.0, 0.0, bands=["J", "H"])
    np.testing.assert_allclose(
        mags_h[:, 0], df["J_mag"].values.astype(np.float32), rtol=2e-5,
        equal_nan=True,
    )


def test_fused_lnpost_deterministic_on_chip():
    """The flagship fused lnpost is finite and bitwise-deterministic across
    repeated dispatches on the chip (catches nondeterministic f32 fusion or
    uninitialized-memory regressions the CPU tier can't see)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import entry

    fn, (batch,) = entry()
    a = np.asarray(fn(batch))
    b = np.asarray(fn(batch))
    assert np.isfinite(a).any()
    np.testing.assert_array_equal(a, b)
