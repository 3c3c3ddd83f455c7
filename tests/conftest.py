"""Test configuration: CPU backend with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh) and float64 enabled for high-precision parity
tests against the reference semantics.

Opt-in on-chip tier: ``ISOTPU_TEST_TPU=1 pytest -m tpu`` leaves the default
backend (the real TPU) and its native f32 in place, running only the
``tpu``-marked tests (compiled-pallas parity, device-resident generate) that
the CI tier can only exercise in interpret mode.

NOTE: jax may already be imported at interpreter startup in this environment
(site hook), so env vars alone are too late — we set the platform through
jax.config, which works as long as the backend hasn't been initialized yet.
"""

import os

TPU_TIER = os.environ.get("ISOTPU_TEST_TPU", "") == "1"

if not TPU_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if not TPU_TIER:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the test suite is compile-dominated on
# this 1-core host, and most programs are identical between runs. First run
# populates the cache; subsequent runs skip recompilation.
from isochrones_tpu.config import enable_compile_cache  # noqa: E402

enable_compile_cache()

if not TPU_TIER:
    assert jax.default_backend() == "cpu", f"tests must run on CPU, got {jax.default_backend()}"
