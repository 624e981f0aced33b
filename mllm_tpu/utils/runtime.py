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


def default_cache_dir() -> str:
    """Repo-local cache dir: /tmp is wiped between sessions on the bench
    hosts, so a /tmp cache silently degrades every fresh run back to cold
    compiles (a flagship b32 build is a 300-800 s XLA compile).  The repo
    checkout is the one path that persists; override with
    MLLM_COMPILE_CACHE_DIR."""
    import os

    env = os.environ.get("MLLM_COMPILE_CACHE_DIR")
    if env:
        return env
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # pip-installed (site-packages, possibly read-only): use the user cache
    # dir instead of writing inside the package
    if os.path.basename(root) == "site-packages" or not os.access(root, os.W_OK):
        xdg = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
        return os.path.join(xdg, "mllm_tpu", "xla_compile")
    return os.path.join(root, ".cache", "xla_compile")


def enable_compilation_cache(path: str | None = None, force: bool = False):
    """Persistent XLA compilation cache — the TPU-native twin of the
    reference's qnn_context.bin compiled-graph cache (demo_qwen_npu.cpp:113).

    Opt-in via MLLM_COMPILE_CACHE=1 (or force=True): under remote-compile
    relays the cache can hold CPU executables built for a different host
    (machine-feature mismatch -> potential SIGILL), so it is not on by default.
    """
    import os

    import jax

    if not force and os.environ.get("MLLM_COMPILE_CACHE") != "1":
        return False
    if path is None:
        path = default_cache_dir()
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
