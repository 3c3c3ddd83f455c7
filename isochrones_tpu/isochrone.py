"""Interpolator factory (reference: ``isochrones/isochrone.py:48-78``).

``get_ichrone("mist")`` builds interpolators from the real MIST grid pipeline
(requires downloaded/cached data); ``get_ichrone("synthetic")`` builds the
hermetic analytic grids (tests, benchmarks, demos). Both return cross-linked
isochrone/track interpolator pairs.
"""

from __future__ import annotations

from .models import EvolutionTrackInterpolator, IsochroneInterpolator

_synthetic_cache = {}


def _build_synthetic(bands=None, dtype=None, **kwargs):
    import numpy as np

    from .grids.synthetic import make_synthetic_grids

    key = (tuple(bands) if bands else None, str(dtype), tuple(sorted(kwargs.items())))
    if key not in _synthetic_cache:
        g = make_synthetic_grids(bands=bands or None, **kwargs) if bands else make_synthetic_grids(**kwargs)
        if dtype is not None:
            g = g.astype(dtype)
        _synthetic_cache[key] = g
    return _synthetic_cache[key]


def get_ichrone(models="mist", bands=None, tracks=False, basic=False, **kwargs):
    """Build a ModelGridInterpolator by name (reference isochrone.py:48-78).

    models : "mist" (real grids) or "synthetic" (hermetic analytic grids)
    tracks : return the evolution-track interpolator instead of isochrone
    """
    if isinstance(models, (IsochroneInterpolator, EvolutionTrackInterpolator)):
        return models

    if models == "synthetic":
        g = _build_synthetic(bands=bands, **kwargs)
        import jax.numpy as jnp

        eep_support = (
            g.track.knots[0],
            g.track.knots[1],
            jnp.asarray(g.age_arrays),
            jnp.asarray(g.lengths),
        )
        track = EvolutionTrackInterpolator(g.track, g.bc, bands=bands or list(g.bands), eep_support=eep_support)
        iso = IsochroneInterpolator(g.iso, g.bc, bands=bands or list(g.bands), track=track)
        track._iso = iso
        return track if tracks else iso

    if models == "mist":
        from .grids.mist import get_mist_interpolators

        iso, track = get_mist_interpolators(bands=bands, basic=basic, **kwargs)
        return track if tracks else iso

    raise ValueError(f"Unknown model grid: {models!r} (available: 'mist', 'synthetic')")
