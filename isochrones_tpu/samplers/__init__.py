"""On-device inference engines (L4) replacing the reference's external
samplers: emcee -> run_ensemble (+run_ensemble_batch for whole catalogs),
MultiNest -> run_nested (adaptive-walk NS), PolyChord -> run_polychord
(slice-sampling NS; an independent implementation that cross-checks
run_nested), and a from-scratch NUTS -> run_nuts."""

from .ensemble import EnsembleState, autocorr_time, run_ensemble, run_ensemble_batch
from .nested import CheckpointConfigError, NestedResult, run_nested
from .nuts import NutsResult, run_nuts
from .polychord import run_polychord

__all__ = [
    "EnsembleState", "run_ensemble", "run_ensemble_batch", "autocorr_time",
    "CheckpointConfigError", "NestedResult", "run_nested", "NutsResult",
    "run_nuts", "run_polychord",
]
