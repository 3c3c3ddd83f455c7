"""Import-path compat: the reference's ``isochrones/mist/models.py`` grid
classes; the rebuild lives in :mod:`isochrones_tpu.grids.mist`."""

from ..grids.mist import (
    MISTBasicIsochroneGrid,
    MISTEvolutionTrackGrid,
    MISTIsochroneGrid,
    MISTModelGrid,
)

__all__ = [
    "MISTModelGrid",
    "MISTIsochroneGrid",
    "MISTBasicIsochroneGrid",
    "MISTEvolutionTrackGrid",
]
