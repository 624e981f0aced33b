"""Shared plumbing for the per-model demo CLIs.

Mirrors the reference demos' shape (/root/reference/examples/demo_*.cpp):
parse `-m/-l/-q`-style flags, load, stream tokens. Each demo_*.py stays a
thin wrapper the way each demo_*.cpp is."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp


def std_parser(description: str, image: bool = False, default_prompt: str = None):
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("-m", "--model", required=True, help="model directory")
    ap.add_argument("-l", "--limits", type=int, default=2048,
                    help="KV cache limit (reference cmdline 'limits')")
    ap.add_argument("-q", "--quant",
                    choices=["int8", "int8-a8", "int4", "int4-mixed"], default=None)
    if image:
        ap.add_argument("-i", "--image", required=True)
    if default_prompt is not None:
        ap.add_argument("--prompt", default=default_prompt)
        ap.add_argument("--max-new", type=int, default=128)
    return ap


def stream_fn(tok):
    def stream(t):
        sys.stdout.write(tok.detokenize(t))
        sys.stdout.flush()
        return True
    return stream


def vl_decode_loop(model, tok, logits, cache, max_new: int, **extra):
    """Greedy streaming decode for models whose __call__ is
    (input_ids, cache, **extra) -> (logits, cache); prefill already done."""
    stream = stream_fn(tok)
    tokv = int(np.argmax(np.asarray(logits[0, -1])))
    stream(tokv)
    n = 1
    t0 = time.perf_counter()
    for _ in range(max_new - 1):
        logits, cache = model(jnp.asarray([[tokv]], jnp.int32), cache)
        tokv = int(np.argmax(np.asarray(logits[0, -1])))
        if tokv == tok.eos_token_id:
            break
        stream(tokv)
        n += 1
    dt = time.perf_counter() - t0
    print(f"\n{n / dt:.1f} tok/s decode" if dt > 0 else "")
    return cache
