"""Import-path compat: reference ``isochrones/cluster_utils.py`` (numba
kernels); the XLA rebuilds live in :mod:`isochrones_tpu.ops.cluster`."""

from .ops.cluster import calc_lnlike_grid, integrate_over_eeps, logaddexp, logsumexp

__all__ = ["logaddexp", "logsumexp", "calc_lnlike_grid", "integrate_over_eeps"]
