"""Import-path compat: the reference's ``isochrones/mist/utils.py``
re-exports the max-EEP helpers (same surface as ``mist/eep.py`` there)."""

from ..grids.mist_eep import default_max_eep, max_eep

__all__ = ["default_max_eep", "max_eep"]
