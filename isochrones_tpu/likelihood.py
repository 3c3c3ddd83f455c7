"""Import-path compat: reference ``isochrones/likelihood.py`` (numba); the
XLA rebuilds live in :mod:`isochrones_tpu.ops.likelihood`."""

from .ops.likelihood import LOG_ONE_OVER_ROOT_2PI, gauss_lnprob, star_lnlike

__all__ = ["gauss_lnprob", "star_lnlike", "LOG_ONE_OVER_ROOT_2PI"]
