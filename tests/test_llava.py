"""LLaVA parity vs transformers (tiny config): vision features, projector,
image splice, e2e logits."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

IMG_TOK = 63  # image_token_index in the tiny config


@pytest.fixture(scope="module")
def tiny_llava(tmp_path_factory):
    import transformers

    torch.manual_seed(0)
    cfg = transformers.LlavaConfig(
        text_config=dict(model_type="llama", vocab_size=128, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=128, rope_theta=10000.0),
        vision_config=dict(model_type="clip_vision_model", hidden_size=24,
                           intermediate_size=48, num_hidden_layers=3,
                           num_attention_heads=4, image_size=28, patch_size=14,
                           hidden_act="quick_gelu"),
        image_token_index=IMG_TOK,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    model = transformers.LlavaForConditionalGeneration(cfg).eval()
    d = tmp_path_factory.mktemp("llava")
    model.save_pretrained(d)
    return model, str(d)


def test_llava_e2e_logits(tiny_llava):
    from mllm_tpu.core.param_loader import SafetensorsLoader
    from mllm_tpu.models.llava import llava_config_from_hf, load_llava

    hf, d = tiny_llava
    cfg = llava_config_from_hf(d)
    ours = load_llava(SafetensorsLoader(d), cfg, jnp.float32)

    rng = np.random.default_rng(0)
    pixel = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    # 28/14 = 2x2 = 4 patches
    ids = np.array([[1, 5, IMG_TOK, IMG_TOK, IMG_TOK, IMG_TOK, 9, 11]], np.int64)

    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids),
                 pixel_values=torch.from_numpy(pixel)).logits.numpy()
    cache = ours.init_cache(1, 32, jnp.float32)
    logits, _ = ours(jnp.asarray(ids, jnp.int32), cache,
                     pixel_values=jnp.asarray(pixel), last_only=False)
    np.testing.assert_allclose(np.asarray(logits), out, rtol=2e-3, atol=2e-3)


def test_llava_greedy_decode(tiny_llava):
    from mllm_tpu.core.param_loader import SafetensorsLoader
    from mllm_tpu.models.llava import llava_config_from_hf, load_llava

    hf, d = tiny_llava
    cfg = llava_config_from_hf(d)
    ours = load_llava(SafetensorsLoader(d), cfg, jnp.float32)
    rng = np.random.default_rng(1)
    pixel = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    ids = np.array([[1, IMG_TOK, IMG_TOK, IMG_TOK, IMG_TOK, 7]], np.int64)
    with torch.no_grad():
        hf_out = hf.generate(
            inputs=torch.from_numpy(ids), pixel_values=torch.from_numpy(pixel),
            max_new_tokens=6, do_sample=False, eos_token_id=None, pad_token_id=0,
        )[0, ids.shape[1]:].numpy()
    cache = ours.init_cache(1, 32, jnp.float32)
    logits, cache = ours(jnp.asarray(ids, jnp.int32), cache,
                         pixel_values=jnp.asarray(pixel), last_only=True)
    toks = []
    for _ in range(6):
        t = int(np.argmax(np.asarray(logits)[0, 0]))
        toks.append(t)
        logits, cache = ours(jnp.asarray([[t]], jnp.int32), cache, last_only=True)
    np.testing.assert_array_equal(toks, hf_out)
