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


def pytest_sessionfinish(session, exitstatus):
    """On a PASSING on-chip tier run, stamp repo-root .tpu_tier_stamp.json
    (UTC time + HEAD). bench.py folds the stamp into its driver-parsed
    headline, so the driver record proves the tier ran for the shipped
    commit (VERDICT r4 ask #3: two consecutive rounds shipped a red tier
    with no evidence either way)."""
    if not (TPU_TIER and jax.default_backend() == "tpu" and exitstatus == 0):
        return
    if session.testscollected == 0:
        return
    import datetime
    import json
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], cwd=root,
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:
        head = "unknown"
    stamp = {
        "utc": datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds"),
        "head": head,
        "n_tests": session.testscollected,
    }
    with open(os.path.join(root, ".tpu_tier_stamp.json"), "w") as f:
        json.dump(stamp, f)
