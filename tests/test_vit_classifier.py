"""ViTForImageClassification parity vs HF (reference models/vit/modeling_vit.hpp
+ demo_vit.cpp classification flow)."""

import numpy as np
import jax.numpy as jnp
import torch

from mllm_tpu.core.param_loader import SafetensorsLoader


def _tiny_hf_vit(tmp_path):
    import transformers

    torch.manual_seed(0)
    cfg = transformers.ViTConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
        num_labels=5, id2label={i: f"class_{i}" for i in range(5)},
        label2id={f"class_{i}": i for i in range(5)},
    )
    hf = transformers.ViTForImageClassification(cfg).eval()
    d = tmp_path / "vit"
    hf.save_pretrained(d)
    return hf, str(d)


def test_vit_classifier_parity(tmp_path):
    hf, d = _tiny_hf_vit(tmp_path)

    from mllm_tpu.models.vit import load_vit_classifier, vit_config_from_hf

    cfg, n_labels, id2label = vit_config_from_hf(d)
    assert n_labels == 5 and id2label[2] == "class_2"
    ours = load_vit_classifier(SafetensorsLoader(d), cfg, n_labels, jnp.float32, id2label)

    rng = np.random.default_rng(0)
    pixel = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(pixel)).logits.numpy()
    out = np.asarray(ours(jnp.asarray(pixel)))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    preds = ours.classify(jnp.asarray(pixel), top_k=2)
    assert len(preds) == 2 and len(preds[0]) == 2
    assert preds[0][0][0] == id2label[int(np.argmax(ref[0]))]


def test_vit_via_auto_model_any(tmp_path):
    _, d = _tiny_hf_vit(tmp_path)

    from mllm_tpu.models.registry import auto_model_any

    model, kind = auto_model_any(d, dtype=jnp.float32)
    assert kind == "vit"
    out = model(jnp.zeros((1, 3, 32, 32), jnp.float32))
    assert out.shape == (1, 5)
