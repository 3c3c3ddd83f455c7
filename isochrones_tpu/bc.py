"""Import-path compat: reference ``isochrones/bc.py``; the rebuild lives in
:mod:`isochrones_tpu.grids.base`."""

from .grids.base import BolometricCorrectionGrid

__all__ = ["BolometricCorrectionGrid"]
