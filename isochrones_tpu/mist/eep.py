"""Import-path compat: the reference's ``isochrones/mist/eep.py`` max-EEP
truncation table; the rebuild lives in
:mod:`isochrones_tpu.grids.mist_eep`."""

from ..grids.mist_eep import default_max_eep, max_eep

__all__ = ["default_max_eep", "max_eep"]
