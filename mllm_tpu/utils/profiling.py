"""Profiling report — mirror of `Module::profiling`
(/root/reference/mllm/Module.cpp:25-61): load time, prefill speed, TTFT,
decode speed, printed in the same shape.  Plus a context manager to capture
jax profiler traces (the TPU-native DEBUGOPTIME equivalent)."""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class Profiler:
    load_s: float = 0.0
    prefill_tps: float = 0.0
    ttft_s: float = 0.0
    decode_tps: float = 0.0
    compile_s: float = 0.0

    def report(self, tag: str = ""):
        print("===========================================================")
        if tag:
            print(f"  {tag}")
        print(f"  Load time: {self.load_s:.3f} s")
        if self.compile_s:
            print(f"  Compile time (first call): {self.compile_s:.2f} s")
        print(f"  Prefill speed: {self.prefill_tps:.1f} tokens/s")
        print(f"  Time to first token: {self.ttft_s:.3f} s")
        print(f"  Decode speed: {self.decode_tps:.1f} tokens/s")
        print("===========================================================")


@contextlib.contextmanager
def timer():
    t0 = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        box["s"] = time.perf_counter() - t0


@contextlib.contextmanager
def jax_trace(logdir: str = "/tmp/mllm_tpu_trace"):
    """Capture a jax profiler trace viewable in tensorboard/xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
