"""Runtime platform helpers.

Kernel dispatch (Pallas vs plain XLA) keys off `on_tpu()`.  Tests set
MLLM_FORCE_XLA=1 (or run under a cpu default device) to pin the portable
path; MLLM_FORCE_PALLAS=1 pins the Pallas path (interpret mode off-TPU).
"""

from __future__ import annotations

import os

import jax


def on_tpu() -> bool:
    if os.environ.get("MLLM_FORCE_XLA") == "1":
        return False
    if os.environ.get("MLLM_FORCE_PALLAS") == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def cpu_devices(n: int | None = None):
    devs = jax.devices("cpu")
    return devs if n is None else devs[:n]
