"""Test configuration.

Tests run on CPU (8 virtual devices for sharding tests) with the portable XLA
compute path (MLLM_FORCE_XLA=1); Pallas-kernel-vs-reference tests are marked
`tpu` and only run when real TPU hardware is available (slow remote compiles),
e.g.:  pytest tests -m tpu
"""

import os

# Must be set before jax initializes any backend.
os.environ.setdefault("MLLM_FORCE_XLA", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
if "collective_call_terminate" not in os.environ.get("XLA_FLAGS", ""):
    # XLA CPU F-check-aborts the process if a collective participant is >40 s
    # late — reachable on few-core hosts running 8 forced devices (sharding
    # tests).  Relax the deadlines; correctness tests have pytest timeouts.
    os.environ["XLA_FLAGS"] = os.environ["XLA_FLAGS"] + (
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_timeout_seconds=600")

import jax  # noqa: E402
import pytest  # noqa: E402


def _has_tpu() -> bool:
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        return False


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware (slow remote compile)")
    # Pin default computations to CPU: the axon TPU backend registers itself
    # regardless of JAX_PLATFORMS, so tests explicitly prefer CPU devices.
    try:
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except Exception:
        pass


def pytest_collection_modifyitems(config, items):
    if config.getoption("-m", default=""):
        return  # explicit marker selection wins
    run_tpu = _has_tpu() and os.environ.get("MLLM_RUN_TPU_TESTS") == "1"
    skip = pytest.mark.skip(reason="TPU kernel tests: set MLLM_RUN_TPU_TESTS=1 (slow)")
    for item in items:
        if "tpu" in item.keywords and not run_tpu:
            item.add_marker(skip)
