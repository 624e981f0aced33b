#!/usr/bin/env python
"""Qwen2.5-VL demo — counterpart of
/root/reference/examples/demo_qwen2.5_vl.cpp (windowed vision attention
tower + M-RoPE LM):

  python examples/demo_qwen2_5_vl.py -m <model_dir> -i image.jpg \\
      [--prompt "Describe this image."]
"""

import sys
import time

from _demo_common import jnp, np, std_parser, stream_fn


def main():
    args = std_parser(__doc__, image=True,
                      default_prompt="Describe this image.").parse_args()

    from mllm_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from mllm_tpu.models.qwen2_5_vl import load_qwen2_5_vl, qwen2_5_vl_configs_from_hf
    from mllm_tpu.models.qwen2_vl import vl_generate
    from mllm_tpu.models.registry import open_loader
    from mllm_tpu.processor.qwen2_vl import Qwen2VLProcessor
    from mllm_tpu.tokenizers.hf_json import auto_tokenizer

    t0 = time.perf_counter()
    base, vcfg = qwen2_5_vl_configs_from_hf(args.model)
    model = load_qwen2_5_vl(open_loader(args.model), base, vcfg, jnp.bfloat16, args.quant)
    tok = auto_tokenizer(args.model)
    print(f"load: {time.perf_counter() - t0:.1f} s")

    proc = Qwen2VLProcessor(tok, image_token_id=base.image_token_id,
                            video_token_id=base.video_token_id)
    out = proc(proc.chat_text(args.prompt), images=args.image)
    print(f"prompt tokens: {out.input_ids.shape[1]}, image grid: {out.grid_thw}")

    cache = model.init_cache(1, args.limits, jnp.bfloat16)
    t1 = time.perf_counter()
    tokens, cache = vl_generate(model, out, cache, args.max_new,
                                eos_token_id=tok.eos_token_id,
                                callback=stream_fn(tok))
    dt = time.perf_counter() - t1
    print(f"\n{(len(tokens) - 1) / dt:.1f} tok/s" if dt > 0 else "")


if __name__ == "__main__":
    main()
