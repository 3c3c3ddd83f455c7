from .interpolator import (
    ModelGridInterpolator,
    EvolutionTrackInterpolator,
    IsochroneInterpolator,
)

# reference models.py module-level surface (grid base + cgs constants,
# astropy.constants there; our numpy cgs values in utils.py)
from ..grids.base import StellarModelGrid
from ..utils import G_CGS as G, MSUN_CGS as MSUN, RSUN_CGS as RSUN

__all__ = [
    "ModelGridInterpolator",
    "EvolutionTrackInterpolator",
    "IsochroneInterpolator",
    "StellarModelGrid",
    "G",
    "MSUN",
    "RSUN",
]
