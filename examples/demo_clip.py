#!/usr/bin/env python
"""CLIP image-text scoring demo — counterpart of
/root/reference/examples/demo_clip.cpp:

  python examples/demo_clip.py -m <clip_model_dir> -i image.jpg \\
      --texts "a photo of a cat" "a photo of a dog"
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-i", "--image", required=True)
    ap.add_argument("--texts", nargs="+",
                    default=["a photo of a cat", "a photo of a dog"])
    args = ap.parse_args()

    from mllm_tpu.core.param_loader import SafetensorsLoader
    from mllm_tpu.models.clip import clip_config_from_hf, load_clip
    from mllm_tpu.processor.image import ClipImageProcessor
    from mllm_tpu.tokenizers.hf_json import auto_tokenizer

    cfg = clip_config_from_hf(args.model)
    model = load_clip(SafetensorsLoader(args.model), cfg, jnp.float32)
    tok = auto_tokenizer(args.model)

    # CLIP text: <|startoftext|> tokens <|endoftext|>, padded to max length
    bos = tok.token_to_id.get("<|startoftext|>", 49406)
    eos = tok.token_to_id.get("<|endoftext|>", cfg.text.eos_token_id)
    seqs = []
    for t in args.texts:
        ids = [bos] + tok.encode(t.lower()) + [eos]
        seqs.append(ids)
    width = max(len(s) for s in seqs)
    ids = np.full((len(seqs), width), eos, np.int32)
    for i, s in enumerate(seqs):
        ids[i, : len(s)] = s

    import jax

    pixel = ClipImageProcessor(size=cfg.vision.image_size, crop=cfg.vision.image_size)(args.image)
    logits = model(jnp.asarray(ids), jnp.asarray(pixel))
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
    for t, p in zip(args.texts, probs):
        print(f"  {p:6.3f}  {t}")


if __name__ == "__main__":
    main()
