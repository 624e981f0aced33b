"""Synthetic-build paths used by bench.py (CLIP scoring, ImageBind tri-modal,
MoE-routed decode) — exercised at tiny geometry on CPU so a bench-only
breakage is caught by the suite, not the driver run."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


def test_clip_init_and_score():
    from mllm_tpu.models.clip import CLIPConfig, CLIPModel, CLIPTextConfig
    from mllm_tpu.models.vit import VisionConfig

    cfg = CLIPConfig(
        text=CLIPTextConfig(vocab_size=64, hidden_size=16, intermediate_size=32,
                            num_hidden_layers=2, num_attention_heads=2,
                            max_position_embeddings=12, eos_token_id=63),
        vision=VisionConfig(hidden_size=16, intermediate_size=32, num_hidden_layers=2,
                            num_attention_heads=2, image_size=32, patch_size=16),
        projection_dim=8,
    )
    model = jax.jit(lambda k: CLIPModel.init(k, cfg, jnp.float32))(jax.random.PRNGKey(0))
    ids = np.full((3, 12), 5, np.int32)
    ids[:, 6] = 63  # EOT
    pixel = np.random.default_rng(0).standard_normal((2, 3, 32, 32)).astype(np.float32)
    logits = model(jnp.asarray(ids), jnp.asarray(pixel))
    assert logits.shape == (2, 3)
    assert np.isfinite(np.asarray(logits)).all()


def test_moe_init_and_bench_builder():
    from bench import model_builder
    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.models.moe import MoEMLP

    cfg = TextConfig(
        vocab_size=64, hidden_size=16, intermediate_size=8,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, eos_token_id=-2,
        num_experts=4, num_experts_per_tok=2, moe_shared_expert_size=16,
    )
    mlp = MoEMLP.init(jax.random.PRNGKey(0), cfg, jnp.float32)
    y = mlp(jnp.ones((1, 3, 16), jnp.float32))
    assert y.shape == (1, 3, 16)
    assert mlp.shared_expert is not None

    # the bench's synthetic builder swaps the dense MLP stack for MoE
    from mllm_tpu.nn.layers import rope_inv_freq

    inv = jnp.asarray(rope_inv_freq(cfg.head_dim_, cfg.rope_theta, cfg.rope_partial))
    model = jax.jit(model_builder(cfg, None))(jax.random.PRNGKey(1), inv)
    assert isinstance(model.blocks.mods[0].mlp, MoEMLP)
    cache = model.init_cache(1, 16, jnp.float32)
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    logits, cache = model(ids, cache)
    assert logits.shape == (1, 1, 64)
    assert np.isfinite(np.asarray(logits)).all()


def test_moe_int8_bench_builder():
    """bench model_builder with quant='int8' on a MoE config produces
    QuantMoEMLP expert stacks (stacked, on-device quantization) and decodes."""
    from bench import model_builder
    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.models.moe import QuantMoEMLP
    from mllm_tpu.nn.layers import rope_inv_freq

    cfg = TextConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, eos_token_id=-2,
        num_experts=8, num_experts_per_tok=2,  # 8*64*128 = quantize min_size
    )
    inv = jnp.asarray(rope_inv_freq(cfg.head_dim_, cfg.rope_theta, cfg.rope_partial))
    mk = model_builder(cfg, "int8")
    m = jax.jit(mk)(jax.random.PRNGKey(0), inv)
    assert any(isinstance(b.mlp, QuantMoEMLP) for b in m.blocks.mods), \
        [type(b.mlp).__name__ for b in m.blocks.mods]
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 64, (1, 6)), jnp.int32)
    logits, _ = m(ids, m.init_cache(1, 32, jnp.bfloat16))
    assert np.isfinite(np.asarray(logits, np.float32)).all()
