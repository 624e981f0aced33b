"""DeepSeek-V3 (MLA + grouped sigmoid MoE) parity vs transformers."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from mllm_tpu.core.param_loader import SafetensorsLoader


@pytest.fixture(scope="module")
def tiny_ds(tmp_path_factory):
    import transformers

    torch.manual_seed(0)
    cfg = transformers.DeepseekV3Config(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=128,
        rope_theta=10000.0, tie_word_embeddings=False,
        q_lora_rank=16, kv_lora_rank=16, qk_nope_head_dim=8, qk_rope_head_dim=4,
        v_head_dim=8,
        n_routed_experts=8, num_experts_per_tok=2, n_group=2, topk_group=1,
        norm_topk_prob=True, routed_scaling_factor=1.5, n_shared_experts=1,
        first_k_dense_replace=1, moe_intermediate_size=16,
        rope_scaling=None, attention_bias=False,
    )
    # non-trivial correction bias to exercise the grouped router fully
    model = transformers.DeepseekV3ForCausalLM(cfg).eval()
    with torch.no_grad():
        for layer in model.model.layers[cfg.first_k_dense_replace:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
    d = tmp_path_factory.mktemp("ds")
    model.save_pretrained(d)
    return model, str(d)


def _ours(d):
    from mllm_tpu.models.deepseek import deepseek_config_from_hf, load_deepseek

    text, mla, moe_cfg = deepseek_config_from_hf(d)
    return load_deepseek(SafetensorsLoader(d), text, mla, moe_cfg, jnp.float32)


def test_deepseek_logits_parity(tiny_ds):
    hf, d = tiny_ds
    ours = _ours(d)
    ids = np.array([[3, 17, 42, 99, 7, 23, 55, 12]], np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    cache = ours.init_cache(1, 32, jnp.float32)
    lg, _ = ours(jnp.asarray(ids, jnp.int32), cache, last_only=False)
    np.testing.assert_allclose(np.asarray(lg), ref, rtol=3e-3, atol=3e-3)


def test_deepseek_greedy_parity(tiny_ds):
    from mllm_tpu.generation.generate import generate
    from mllm_tpu.generation.sampling import SamplingConfig

    hf, d = tiny_ds
    ours = _ours(d)
    ids = np.array([[3, 17, 42, 99, 7]], np.int64)
    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(ids), max_new_tokens=6, do_sample=False,
                             eos_token_id=None, pad_token_id=0)[0, ids.shape[1]:].numpy()
    cache = ours.init_cache(1, 32, jnp.float32)
    res, _ = generate(ours, ids.astype(np.int32), cache, SamplingConfig(max_new_tokens=6),
                      eos_token_id={-1}, bucket=8)
    np.testing.assert_array_equal(np.asarray(res.tokens), hf_out)


def test_minicpm3_structural(tmp_path):
    """MiniCPM3 (MLA + scalings): structural load + incremental parity with
    random weights (no transformers oracle — openbmb needs remote code)."""
    import numpy as np
    from mllm_tpu.core.param_loader import MllmWriter, ParamLoader
    from mllm_tpu.models.deepseek import load_deepseek, minicpm3_config_from_hf

    cfg_dict = dict(
        model_type="minicpm3", vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rope_theta=10000.0, tie_word_embeddings=True,
        q_lora_rank=16, kv_lora_rank=16, qk_nope_head_dim=8, qk_rope_head_dim=4,
        v_head_dim=8, scale_emb=2.0, scale_depth=1.4, dim_model_base=16,
        hidden_act="silu", rms_norm_eps=1e-6,
    )
    text, mla, moe_cfg = minicpm3_config_from_hf(cfg_dict)
    assert text.embedding_multiplier == 2.0
    assert abs(text.logit_divisor - 2.0) < 1e-6

    rng = np.random.default_rng(0)
    w = MllmWriter(tmp_path / "m3.mllm")

    def add(name, *shape):
        w.add(name, (rng.standard_normal(shape) * 0.05).astype(np.float32))

    d, h = 32, 4
    add("model.embed_tokens.weight", 64, d)
    add("model.norm.weight", d)
    for i in range(2):
        p = f"model.layers.{i}."
        add(p + "self_attn.q_a_proj.weight", 16, d)
        add(p + "self_attn.q_a_layernorm.weight", 16)
        add(p + "self_attn.q_b_proj.weight", h * 12, 16)
        add(p + "self_attn.kv_a_proj_with_mqa.weight", 16 + 4, d)
        add(p + "self_attn.kv_a_layernorm.weight", 16)
        add(p + "self_attn.kv_b_proj.weight", h * 16, 16)
        add(p + "self_attn.o_proj.weight", d, h * 8)
        add(p + "mlp.gate_proj.weight", 64, d)
        add(p + "mlp.up_proj.weight", 64, d)
        add(p + "mlp.down_proj.weight", d, 64)
        add(p + "input_layernorm.weight", d)
        add(p + "post_attention_layernorm.weight", d)
    w.write()
    model = load_deepseek(ParamLoader(tmp_path / "m3.mllm"), text, mla, moe_cfg, jnp.float32)

    ids = jnp.asarray(np.arange(1, 9)[None], jnp.int32)
    cache = model.init_cache(1, 32, jnp.float32)
    full, _ = model(ids, cache, last_only=False)
    assert np.isfinite(np.asarray(full)).all()
    cache2 = model.init_cache(1, 32, jnp.float32)
    lg, cache2 = model(ids[:, :5], cache2, last_only=False)
    outs = [np.asarray(lg)[0]]
    for i in range(5, 8):
        lg, cache2 = model(ids[:, i : i + 1], cache2, last_only=False)
        outs.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.asarray(full)[0], np.concatenate(outs, axis=0),
                               rtol=2e-4, atol=2e-5)
