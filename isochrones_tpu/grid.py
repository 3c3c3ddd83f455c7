"""Import-path compat: reference ``isochrones/grid.py``; the rebuild lives
in :mod:`isochrones_tpu.grids.base`."""

from .grids.base import Grid

__all__ = ["Grid"]
