"""Import-path compat: reference ``isochrones/mags.py`` (numba); the fused
XLA rebuilds live in :mod:`isochrones_tpu.ops.mags`."""

from .ops.mags import interp_mag, interp_mags

__all__ = ["interp_mag", "interp_mags"]
