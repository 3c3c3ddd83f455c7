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


def enable_compile_cache(cache_dir=None):
    """Point JAX's persistent compilation cache at ``cache_dir`` (default:
    ``.jax_cache`` next to the repo root). Cold TPU compiles through the
    remote tunnel take minutes; warm reruns are seconds. Shared by
    bench.py, __graft_entry__.py, and tests/conftest.py."""
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
