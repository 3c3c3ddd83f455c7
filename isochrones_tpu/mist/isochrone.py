"""Import-path compat: the reference's ``isochrones/mist/isochrone.py``
interpolator bindings; the rebuild lives in the package ``__init__``."""

from . import (
    MIST_BasicEvolutionTrack,
    MIST_BasicIsochrone,
    MIST_EvolutionTrack,
    MIST_Isochrone,
)

__all__ = [
    "MIST_Isochrone",
    "MIST_BasicIsochrone",
    "MIST_EvolutionTrack",
    "MIST_BasicEvolutionTrack",
]
