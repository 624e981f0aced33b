#!/usr/bin/env python
"""ViT ImageNet classification demo — counterpart of
/root/reference/examples/demo_vit.cpp (ViTProcessor + argmax postProcess over
imagenet_id2label):

  python examples/demo_vit.py -m <vit_dir> -i cat.jpg [dog.jpg ...]
"""

import time

from _demo_common import jnp, np, std_parser


def main():
    ap = std_parser(__doc__)
    ap.add_argument("-i", "--images", nargs="+", required=True)
    ap.add_argument("--top-k", type=int, default=3)
    args = ap.parse_args()

    from mllm_tpu.models.registry import open_loader
    from mllm_tpu.models.vit import load_vit_classifier, vit_config_from_hf
    from mllm_tpu.processor.image import load_image, rescale_normalize, resize

    t0 = time.perf_counter()
    cfg, n_labels, id2label = vit_config_from_hf(args.model)
    model = load_vit_classifier(open_loader(args.model), cfg, n_labels,
                                jnp.float32, id2label)
    print(f"load: {time.perf_counter() - t0:.1f} s ({n_labels} labels)")

    # HF ViTImageProcessor: direct resize to 224x224, normalize mean/std 0.5
    def proc(path):
        x = resize(load_image(path), cfg.image_size, cfg.image_size, "bilinear")
        x = rescale_normalize(x, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
        return x.transpose(2, 0, 1)[None]

    pixel = np.concatenate([proc(p) for p in args.images], axis=0)
    for path, preds in zip(args.images, model.classify(jnp.asarray(pixel), args.top_k)):
        best = ", ".join(f"{lbl} ({p:.3f})" for lbl, p in preds)
        print(f"{path}: {best}")


if __name__ == "__main__":
    main()
