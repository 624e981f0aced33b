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
