#!/usr/bin/env python
"""Qwen2-VL demo — counterpart of /root/reference/examples/demo_qwen2_vl.cpp:

  python examples/demo_qwen2_vl.py -m <model_dir> -i image.jpg \\
      [--prompt "Describe this image."] [--max-new 128] [-l 2048]
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
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-i", "--image", required=True)
    ap.add_argument("-l", "--limits", type=int, default=2048)
    ap.add_argument("-q", "--quant", choices=["int8", "int4"], default=None)
    ap.add_argument("--prompt", default="Describe this image.")
    ap.add_argument("--max-new", type=int, default=128)
    args = ap.parse_args()

    from mllm_tpu.core.param_loader import SafetensorsLoader
    from mllm_tpu.models.qwen2_vl import load_qwen2_vl, qwen2_vl_config_from_hf, vl_generate
    from mllm_tpu.processor.qwen2_vl import Qwen2VLProcessor
    from mllm_tpu.tokenizers.hf_json import auto_tokenizer
    from mllm_tpu.utils.profiling import Profiler

    t0 = time.perf_counter()
    cfg = qwen2_vl_config_from_hf(args.model)
    model = load_qwen2_vl(SafetensorsLoader(args.model), cfg, jnp.bfloat16, args.quant)
    tok = auto_tokenizer(args.model)
    prof = Profiler(load_s=time.perf_counter() - t0)

    proc = Qwen2VLProcessor(tok, image_token_id=cfg.image_token_id,
                            video_token_id=cfg.video_token_id)
    out = proc(proc.chat_text(args.prompt), images=args.image)
    print(f"prompt tokens: {out.input_ids.shape[1]}, image grid: {out.grid_thw}")

    cache = model.init_cache(1, args.limits, jnp.bfloat16)

    def stream(t):
        sys.stdout.write(tok.detokenize(t))
        sys.stdout.flush()

    t1 = time.perf_counter()
    tokens, cache = vl_generate(model, out, cache, args.max_new,
                                eos_token_id=tok.eos_token_id, callback=stream)
    dt = time.perf_counter() - t1
    print()
    prof.decode_tps = (len(tokens) - 1) / dt if dt > 0 else 0
    prof.report(args.model)


if __name__ == "__main__":
    main()
