"""Global configuration for isochrones-tpu.

Mirrors the role of the reference's ``isochrones/config.py:1-7`` (data-dir env
override), extended with TPU-specific knobs (default compute dtype).
"""

import os

ISOCHRONES = os.getenv("ISOCHRONES", os.path.expanduser(os.path.join("~", ".isochrones")))

#: Default on-device dtype for grid data / kernels. float32 is the native TPU
#: dtype; tests run float64 on CPU for high-precision parity.
DEFAULT_DTYPE = os.getenv("ISOCHRONES_TPU_DTYPE", "float32")

#: Set to "1" to disable any attempt at network downloads (e.g. hermetic CI).
OFFLINE = os.getenv("ISOCHRONES_TPU_OFFLINE", "0") == "1"

ON_RTD = os.getenv("READTHEDOCS", None) == "True"
