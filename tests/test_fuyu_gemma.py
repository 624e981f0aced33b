"""Fuyu (Persimmon LM + linear patch embed) and Gemma-1 parity vs transformers."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from mllm_tpu.core.param_loader import SafetensorsLoader

IMG_TOK = 60


def test_fuyu_parity(tmp_path):
    import transformers

    torch.manual_seed(0)
    cfg = transformers.FuyuConfig(
        text_config=dict(
            model_type="persimmon", vocab_size=128, hidden_size=32,
            intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=64, partial_rotary_factor=0.5,
            qk_layernorm=True, hidden_act="relu2", rope_theta=10000.0,
            tie_word_embeddings=False,
        ),
        hidden_size=32, patch_size=4, num_channels=3, image_token_id=IMG_TOK,
    )
    hf = transformers.FuyuForCausalLM(cfg).eval()
    d = tmp_path / "fuyu"
    hf.save_pretrained(d)

    from mllm_tpu.models.fuyu import fuyu_config_from_hf, load_fuyu, patchify_image

    fc = fuyu_config_from_hf(str(d))
    assert fc.text.qk_norm and fc.text.rope_partial == 0.5
    ours = load_fuyu(SafetensorsLoader(str(d)), fc, jnp.float32)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((3, 8, 8)).astype(np.float32)  # 2x2 patches of 4
    patches = patchify_image(img, 4)
    assert patches.shape == (4, 48)
    ids = np.array([[1, 5, IMG_TOK, IMG_TOK, IMG_TOK, IMG_TOK, 9]], np.int64)

    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(ids),
            image_patches=torch.from_numpy(patches[None, None]),
            image_patches_indices=torch.from_numpy(
                np.array([[-1, -1, 0, 1, 2, 3, -1]], np.int64)
            ),
        ).logits.numpy()
    cache = ours.init_cache(1, 16, jnp.float32)
    lg, _ = ours(jnp.asarray(ids, jnp.int32), cache,
                 image_patches=jnp.asarray(patches), last_only=False)
    np.testing.assert_allclose(np.asarray(lg), out, rtol=3e-3, atol=3e-3)


def test_gemma1_parity(tmp_path):
    import transformers

    torch.manual_seed(0)
    cfg = transformers.GemmaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=1, head_dim=8,
        max_position_embeddings=64, rope_theta=10000.0,
        hidden_act="gelu_pytorch_tanh",
    )
    hf = transformers.GemmaForCausalLM(cfg).eval()
    d = tmp_path / "gemma"
    hf.save_pretrained(d)

    from mllm_tpu.models.registry import auto_model

    ours, _, mcfg = auto_model(str(d), dtype=jnp.float32, with_tokenizer=False)
    assert mcfg.embedding_multiplier == pytest.approx(32**0.5)
    ids = np.array([[3, 17, 42, 99, 7]], np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    cache = ours.init_cache(1, 16, jnp.float32)
    lg, _ = ours(jnp.asarray(ids, jnp.int32), cache, last_only=False)
    np.testing.assert_allclose(np.asarray(lg), ref, rtol=2e-3, atol=2e-3)
