#!/usr/bin/env python
"""ImageBind tri-modal demo — counterpart of
/root/reference/examples/demo_imagebind.cpp: score images against texts and
audio clips in the shared embedding space.

  python examples/demo_imagebind.py -m <dir-with-weights-or-random> \\
      -i img.jpg --texts "a dog" "a car" --audio clip.wav
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", default="random", help="'random' or weights dir")
    ap.add_argument("-i", "--image", required=True)
    ap.add_argument("--texts", nargs="+", default=["a dog.", "a car", "a bird"])
    ap.add_argument("--audio", default=None)
    args = ap.parse_args()

    from mllm_tpu.models.imagebind import ImageBindConfig, ImageBindModel, patchify_video
    from mllm_tpu.processor.audio import ImageBindAudioProcessor
    from mllm_tpu.processor.image import ClipImageProcessor

    cfg = ImageBindConfig()
    if args.model == "random":
        print("(random weights demo — scores are meaningless, pipeline is real)")
        model = ImageBindModel.init(jax.random.PRNGKey(0), cfg, jnp.float32)
    else:
        raise SystemExit("checkpoint loading for ImageBind lands with the convertor")

    # vision: image -> 2 repeated frames -> 3D patches
    pix = ClipImageProcessor(size=cfg.img_hw, crop=cfg.img_hw)(args.image)  # [1,3,H,W]
    frames = np.repeat(pix[:, :, None], cfg.time_frames, axis=2)  # [1,3,T,H,W]
    patches = patchify_video(frames, cfg.patch, cfg.patch_time)

    # text: simple whitespace-hash tokenizer for the random demo
    ids = np.zeros((len(args.texts), 8), np.int32)
    eot = np.zeros(len(args.texts), np.int32)
    for i, t in enumerate(args.texts):
        toks = [abs(hash(w)) % (cfg.vocab_size - 2) for w in t.split()][:7]
        ids[i, : len(toks)] = toks
        ids[i, len(toks)] = cfg.vocab_size - 1
        eot[i] = len(toks)

    if args.audio:
        fb = ImageBindAudioProcessor()(args.audio)  # [3,1,128,204]
    else:
        fb = np.zeros((cfg.audio_clips, 1, cfg.audio_h, cfg.audio_w), np.float32)

    vt, va = model(jnp.asarray(ids), jnp.asarray(eot), jnp.asarray(patches), jnp.asarray(fb))
    print("vision x text:", np.asarray(vt)[0])
    print("vision x audio:", np.asarray(va)[0])


if __name__ == "__main__":
    main()
