"""Phi-3-Vision structural tests (no transformers oracle — remote code):
HD transform geometry, image splice at negative ids, incremental parity."""

import numpy as np
import jax.numpy as jnp

from mllm_tpu.core.param_loader import MllmWriter, ParamLoader
from mllm_tpu.models.phi3v import Phi3VConfig, load_phi3v, phi3v_config_from_hf
from mllm_tpu.models.vit import VisionConfig
from mllm_tpu.core.config import TextConfig


def _tiny_cfg():
    text = TextConfig(model_type="phi3", vocab_size=64, hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=4,
                      max_position_embeddings=512, rope_theta=10000.0,
                      attention_bias=False, tie_word_embeddings=True,
                      eos_token_id=-3)
    vis = VisionConfig(hidden_size=16, intermediate_size=32, num_hidden_layers=2,
                       num_attention_heads=4, image_size=56, patch_size=14,
                       hidden_act="quick_gelu")
    return Phi3VConfig(text=text, vision=vis, image_dim_out=16)


def _write_random(path, cfg: Phi3VConfig, seed=0):
    rng = np.random.default_rng(seed)
    w = MllmWriter(path)

    def add(name, *shape):
        w.add(name, (rng.standard_normal(shape) * 0.05).astype(np.float32))

    t, v = cfg.text, cfg.vision
    add("model.embed_tokens.weight", t.vocab_size, t.hidden_size)
    add("model.norm.weight", t.hidden_size)
    for i in range(t.num_hidden_layers):
        p = f"model.layers.{i}."
        hd = t.head_dim_
        add(p + "self_attn.qkv_proj.weight", 3 * t.num_attention_heads * hd, t.hidden_size)
        add(p + "self_attn.o_proj.weight", t.hidden_size, t.num_attention_heads * hd)
        add(p + "mlp.gate_up_proj.weight", 2 * t.intermediate_size, t.hidden_size)
        add(p + "mlp.down_proj.weight", t.hidden_size, t.intermediate_size)
        add(p + "input_layernorm.weight", t.hidden_size)
        add(p + "post_attention_layernorm.weight", t.hidden_size)
    pre = "model.vision_embed_tokens.img_processor.vision_model."
    add(pre + "embeddings.patch_embedding.weight", v.hidden_size, 3, v.patch_size, v.patch_size)
    add(pre + "embeddings.class_embedding", v.hidden_size)
    add(pre + "embeddings.position_embedding.weight", v.num_positions, v.hidden_size)
    add(pre + "pre_layrnorm.weight", v.hidden_size)
    add(pre + "pre_layrnorm.bias", v.hidden_size)
    for i in range(v.num_hidden_layers):
        p = f"{pre}encoder.layers.{i}."
        for nm, o, ii in [("self_attn.q_proj", v.hidden_size, v.hidden_size),
                          ("self_attn.k_proj", v.hidden_size, v.hidden_size),
                          ("self_attn.v_proj", v.hidden_size, v.hidden_size),
                          ("self_attn.out_proj", v.hidden_size, v.hidden_size),
                          ("mlp.fc1", v.intermediate_size, v.hidden_size),
                          ("mlp.fc2", v.hidden_size, v.intermediate_size)]:
            add(p + nm + ".weight", o, ii)
            add(p + nm + ".bias", o)
        for nm in ["layer_norm1", "layer_norm2"]:
            add(p + nm + ".weight", v.hidden_size)
            add(p + nm + ".bias", v.hidden_size)
    d4 = 4 * cfg.image_dim_out
    add("model.vision_embed_tokens.glb_GN", 1, 1, d4)
    add("model.vision_embed_tokens.sub_GN", 1, 1, 1, d4)
    add("model.vision_embed_tokens.img_projection.0.weight", t.hidden_size, d4)
    add("model.vision_embed_tokens.img_projection.0.bias", t.hidden_size)
    add("model.vision_embed_tokens.img_projection.2.weight", t.hidden_size, t.hidden_size)
    add("model.vision_embed_tokens.img_projection.2.bias", t.hidden_size)
    w.write()


def test_phi3v_structural(tmp_path):
    cfg = _tiny_cfg()
    p = tmp_path / "p3v.mllm"
    _write_random(p, cfg)
    model = load_phi3v(ParamLoader(p), cfg, jnp.float32)

    # 56/14 = 4x4 patches -> 2x2 blocks + sep column: 2*3 + 1 glb = 7 tokens
    assert model.num_image_tokens == 7
    rng = np.random.default_rng(1)
    pixel = jnp.asarray(rng.standard_normal((1, 3, 56, 56)).astype(np.float32))
    feats = model.image_embed.hd_feature(pixel)
    assert feats.shape == (1, 7, cfg.text.hidden_size)

    ids = np.array([[1, 5] + [-1] * 7 + [9]], np.int32)
    cache = model.init_cache(1, 32, jnp.float32)
    full, _ = model(jnp.asarray(ids), cache, pixel_values=pixel, last_only=False)
    assert np.isfinite(np.asarray(full)).all()

    # incremental == full (image in prefill)
    cache2 = model.init_cache(1, 32, jnp.float32)
    lg, cache2 = model(jnp.asarray(ids[:, :9]), cache2, pixel_values=pixel, last_only=False)
    outs = [np.asarray(lg)[0]]
    lg, cache2 = model(jnp.asarray(ids[:, 9:]), cache2, last_only=False)
    outs.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.asarray(full)[0], np.concatenate(outs, 0),
                               rtol=2e-4, atol=2e-5)
