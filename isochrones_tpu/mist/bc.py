"""Import-path compat: the reference's ``isochrones/mist/bc.py`` exposes
``MISTBolometricCorrectionGrid`` here; the rebuild lives in
:mod:`isochrones_tpu.grids.mist` (docs/bc.ipynb workflow)."""

from ..grids.mist import MISTBolometricCorrectionGrid

__all__ = ["MISTBolometricCorrectionGrid"]
