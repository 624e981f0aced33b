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
    ap.add_argument("--compiled", action="store_true",
                    help="fully-compiled SD: on-device prompt-lookup drafting, "
                         "one dispatch for the whole generation")
    args = ap.parse_args()

    from mllm_tpu.generation.speculative import speculative_generate
    from mllm_tpu.models.registry import auto_model

    model, tok, cfg = auto_model(args.model, dtype=jnp.bfloat16)
    ids = np.asarray(tok.encode(args.prompt, bos=True), np.int32)[None, :]
    cache = model.init_cache(1, args.limits, jnp.bfloat16)

    if args.compiled:
        from mllm_tpu.generation.generate import pad_to_bucket
        from mllm_tpu.generation.speculative import speculative_generate_compiled

        padded = jnp.asarray(pad_to_bucket(ids, 128))
        t0 = time.perf_counter()
        toks, n, steps, drafted, accepted = speculative_generate_compiled(
            model, padded, cache, ids.shape[1], args.max_new,
            eos_token_id=tok.eos_token_id, max_draft=args.max_draft)
        out = list(np.asarray(toks)[: int(n)])
        dt = time.perf_counter() - t0
        print(tok.detokenize_all(out) if hasattr(tok, "detokenize_all")
              else "".join(tok.detokenize(t) for t in out))
        steps, drafted, accepted = int(steps), int(drafted), int(accepted)
        print(f"tokens: {len(out)}  verify-steps: {steps}  drafted: {drafted}  "
              f"accepted: {accepted} "
              f"(acceptance {accepted / max(drafted, 1):.1%})  "
              f"{len(out)/dt:.1f} tok/s (compile included)")
        return

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
