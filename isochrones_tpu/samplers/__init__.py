"""On-device inference engines (L4) replacing the reference's external
samplers: emcee -> run_ensemble, MultiNest/PolyChord -> run_nested."""

from .ensemble import EnsembleState, autocorr_time, run_ensemble
from .nested import NestedResult, run_nested

__all__ = ["EnsembleState", "run_ensemble", "autocorr_time", "NestedResult", "run_nested"]
