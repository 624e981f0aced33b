#!/usr/bin/env python
"""Speculative-decoding demo — counterpart of
/root/reference/examples/demo_qwen_sd.cpp (suffix-automaton drafting):

  python examples/demo_sd.py -m <model_dir> --prompt "..." [--max-draft 8]
Prints the generation plus draft-acceptance statistics.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-l", "--limits", type=int, default=2048)
    ap.add_argument("--prompt", default="Repeat after me: the cat sat on the mat. the cat sat on")
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--max-draft", type=int, default=8)
    args = ap.parse_args()

    from mllm_tpu.generation.speculative import speculative_generate
    from mllm_tpu.models.registry import auto_model

    model, tok, cfg = auto_model(args.model, dtype=jnp.bfloat16)
    ids = np.asarray(tok.encode(args.prompt, bos=True), np.int32)[None, :]
    cache = model.init_cache(1, args.limits, jnp.bfloat16)

    def stream(t):
        sys.stdout.write(tok.detokenize(t))
        sys.stdout.flush()

    t0 = time.perf_counter()
    out, cache, stats = speculative_generate(
        model, ids, cache, args.max_new, eos_token_id=tok.eos_token_id,
        max_draft=args.max_draft, callback=stream,
    )
    dt = time.perf_counter() - t0
    print()
    print(f"tokens: {stats.tokens}  verify-steps: {stats.steps}  "
          f"drafted: {stats.drafted}  accepted: {stats.accepted} "
          f"(acceptance {stats.acceptance:.1%})  {len(out)/dt:.1f} tok/s")


if __name__ == "__main__":
    main()
