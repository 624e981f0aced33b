#!/usr/bin/env python
"""Fuyu-8B captioning demo — counterpart of
/root/reference/examples/demo_fuyu.cpp (FuyuProcessor patchify + |SPEAKER|
image splice + streaming generate):

  python examples/demo_fuyu.py -m <fuyu_dir> -i bus.png \\
      [--prompt "Generate a coco-style caption."]
"""

import time

from _demo_common import jnp, np, std_parser, vl_decode_loop


def main():
    args = std_parser(__doc__, image=True,
                      default_prompt="Generate a coco-style caption.\n").parse_args()

    from mllm_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    from mllm_tpu.models.fuyu import fuyu_config_from_hf, load_fuyu, patchify_image
    from mllm_tpu.models.registry import open_loader
    from mllm_tpu.processor.image import load_image
    from mllm_tpu.tokenizers.hf_json import auto_tokenizer

    t0 = time.perf_counter()
    cfg = fuyu_config_from_hf(args.model)
    model = load_fuyu(open_loader(args.model), cfg, jnp.bfloat16, args.quant)
    tok = auto_tokenizer(args.model)
    print(f"load: {time.perf_counter() - t0:.1f} s")

    img = load_image(args.image)  # [H, W, C] uint8
    chw = img.transpose(2, 0, 1).astype(np.float32) / 255.0 * 2 - 1
    patches = patchify_image(chw, cfg.patch_size)  # [P, C*ps*ps]

    # reference FuyuProcessor: image placeholders, then the text prompt
    ids = [cfg.image_token_id] * patches.shape[0] + tok.encode(args.prompt)
    ids = np.asarray(ids, np.int32)[None, :]
    print(f"prompt tokens: {ids.shape[1]} ({patches.shape[0]} image patches)")

    cache = model.init_cache(1, args.limits, jnp.bfloat16)
    logits, cache = model(jnp.asarray(ids), cache, image_patches=jnp.asarray(patches))
    vl_decode_loop(model, tok, logits, cache, args.max_new)


if __name__ == "__main__":
    main()
