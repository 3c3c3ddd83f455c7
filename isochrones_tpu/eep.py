"""Import-path compat: reference ``isochrones/eep.py`` (EEP section-poly
fitting); the rebuild lives in :mod:`isochrones_tpu.eep_fit`."""

from .eep_fit import eep_fn, eep_fn_p0, eep_jac, fit_section_poly

__all__ = ["eep_fn", "eep_jac", "eep_fn_p0", "fit_section_poly"]
