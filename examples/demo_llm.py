#!/usr/bin/env python
"""Generic chat demo — counterpart of the reference's demo_qwen / demo_llama
CLIs (/root/reference/examples/demo_qwen.cpp) with the same flag spirit:

  python examples/demo_llm.py -m <model_dir> [-l kv_limit] [-q int8|int4] \\
      [--prompt "..."] [--max-new 100] [--temperature 0.7 --top-k 40]

Model dir = HF-style directory (config.json + safetensors + tokenizer.json)
or a directory of .mllm files + tokenizer.json.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp


def main():
    from mllm_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True, help="model directory")
    ap.add_argument("-l", "--limits", type=int, default=2048, help="KV cache limit (cache_limit)")
    ap.add_argument("-q", "--quant", choices=["int8", "int4"], default=None)
    ap.add_argument("--prompt", default="Give me a short introduction to large language models.")
    ap.add_argument("--max-new", type=int, default=128)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--top-p", type=float, default=0.0)
    ap.add_argument("--no-chat-template", action="store_true")
    args = ap.parse_args()

    from mllm_tpu.generation.generate import generate
    from mllm_tpu.generation.sampling import SamplingConfig
    from mllm_tpu.models.registry import auto_model
    from mllm_tpu.utils.profiling import Profiler

    t0 = time.perf_counter()
    model, tok, cfg = auto_model(args.model, dtype=jnp.bfloat16, quant=args.quant)
    prof = Profiler(load_s=time.perf_counter() - t0)
    if tok is None:
        print("no tokenizer.json found in model dir", file=sys.stderr)
        sys.exit(1)

    from mllm_tpu.tokenizers.chat_templates import render

    text = args.prompt if args.no_chat_template else render(cfg.model_type, args.prompt)
    ids = np.asarray(tok.encode(text, bos=True), np.int32)[None, :]
    print(f"[{cfg.model_type}] prompt tokens: {ids.shape[1]}")

    cache = model.init_cache(1, args.limits, jnp.bfloat16)
    scfg = SamplingConfig(
        max_new_tokens=args.max_new,
        do_sample=args.temperature > 0,
        temperature=args.temperature or 1.0,
        top_k=args.top_k, top_p=args.top_p,
    )

    def stream(t):
        sys.stdout.write(tok.detokenize(t))
        sys.stdout.flush()
        return True

    res, cache = generate(model, ids, cache, scfg, callback=stream,
                          eos_token_id=tok.eos_token_id)
    print()
    prof.prefill_tps = res.prefill_tps
    prof.ttft_s = res.ttft_s
    prof.decode_tps = res.decode_tps
    prof.report(args.model)


if __name__ == "__main__":
    main()
