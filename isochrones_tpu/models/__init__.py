from .interpolator import (
    ModelGridInterpolator,
    EvolutionTrackInterpolator,
    IsochroneInterpolator,
)

__all__ = [
    "ModelGridInterpolator",
    "EvolutionTrackInterpolator",
    "IsochroneInterpolator",
]
