#!/usr/bin/env python
"""Phi-3-Vision demo — counterpart of /root/reference/examples/demo_phi3v.cpp
(<|image_1|> placeholder expansion + HD transform + streaming generate):

  python examples/demo_phi3v.py -m <phi3v_dir> -i cat.jpg \\
      [--prompt "What's in this image?"]
"""

import time

from _demo_common import jnp, np, std_parser, vl_decode_loop


def main():
    args = std_parser(__doc__, image=True,
                      default_prompt="What's in this image?").parse_args()

    from mllm_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from mllm_tpu.models.phi3v import load_phi3v, phi3v_config_from_hf
    from mllm_tpu.models.registry import open_loader
    from mllm_tpu.processor.image import ClipImageProcessor
    from mllm_tpu.tokenizers.hf_json import auto_tokenizer

    t0 = time.perf_counter()
    cfg = phi3v_config_from_hf(args.model)
    model = load_phi3v(open_loader(args.model), cfg, jnp.bfloat16, args.quant)
    tok = auto_tokenizer(args.model)
    print(f"load: {time.perf_counter() - t0:.1f} s")

    pixel = ClipImageProcessor(size=cfg.vision.image_size,
                               crop=cfg.vision.image_size)(args.image)

    # phi3v convention: negative ids mark image positions (one per image token)
    text = f"<|user|>\n{args.prompt}<|end|>\n<|assistant|>\n"
    n_img = model.num_image_tokens
    ids = [-1] * n_img + tok.encode(text)
    ids = np.asarray(ids, np.int32)[None, :]
    print(f"prompt tokens: {ids.shape[1]} ({n_img} image tokens)")

    cache = model.init_cache(1, args.limits, jnp.bfloat16)
    logits, cache = model(jnp.asarray(ids), cache, pixel_values=jnp.asarray(pixel))
    vl_decode_loop(model, tok, logits, cache, args.max_new)


if __name__ == "__main__":
    main()
