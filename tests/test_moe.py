"""MoE routing parity vs transformers (Mixtral + Qwen2-MoE tiny configs) —
covers the reference's MiniCPM-MoE/Ling routing capability (SURVEY §2.6)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from mllm_tpu.generation.generate import generate
from mllm_tpu.generation.sampling import SamplingConfig
from mllm_tpu.models.registry import auto_model


def _save_tiny_moe(tmp_path, kind):
    import transformers

    torch.manual_seed(0)
    if kind == "mixtral":
        cfg = transformers.MixtralConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
            num_local_experts=4, num_experts_per_tok=2, rope_theta=10000.0,
        )
        model = transformers.MixtralForCausalLM(cfg)
    else:
        cfg = transformers.Qwen2MoeConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
            num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
            shared_expert_intermediate_size=64, norm_topk_prob=False,
            decoder_sparse_step=1, mlp_only_layers=[], rope_theta=10000.0,
        )
        model = transformers.Qwen2MoeForCausalLM(cfg)
    model = model.eval()
    d = tmp_path / kind
    model.save_pretrained(d)
    return model, d


@pytest.mark.parametrize("kind", ["mixtral", "qwen2_moe"])
def test_moe_logits_and_greedy_parity(tmp_path, kind):
    hf, d = _save_tiny_moe(tmp_path, kind)
    ours, _, cfg = auto_model(str(d), dtype=jnp.float32, with_tokenizer=False)
    assert cfg.num_experts == 4

    ids = np.array([[3, 17, 42, 99, 7, 23, 56, 11]], np.int64)
    with torch.no_grad():
        hf_logits = hf(torch.from_numpy(ids)).logits.numpy()
    cache = ours.init_cache(1, 32, jnp.float32)
    our_logits, _ = ours(jnp.asarray(ids, jnp.int32), cache, last_only=False)
    np.testing.assert_allclose(np.asarray(our_logits), hf_logits, rtol=3e-3, atol=3e-3)

    with torch.no_grad():
        hf_out = hf.generate(torch.from_numpy(ids), max_new_tokens=6, do_sample=False,
                             eos_token_id=None, pad_token_id=0)[0, ids.shape[1]:].numpy()
    cache = ours.init_cache(1, 32, jnp.float32)
    res, _ = generate(ours, ids.astype(np.int32), cache, SamplingConfig(max_new_tokens=6),
                      eos_token_id={-1}, bucket=8)
    np.testing.assert_array_equal(np.asarray(res.tokens), hf_out)


def test_moe_decode_single_token(tmp_path):
    """Decode path (T=1) exercises ragged_dot with tiny group sizes."""
    hf, d = _save_tiny_moe(tmp_path, "mixtral")
    ours, _, cfg = auto_model(str(d), dtype=jnp.float32, with_tokenizer=False)
    cache = ours.init_cache(1, 16, jnp.float32)
    lg, cache = ours(jnp.asarray([[5, 7, 9]], jnp.int32), cache, last_only=True)
    lg2, cache = ours(jnp.asarray([[int(np.argmax(np.asarray(lg)))]], jnp.int32), cache)
    assert np.isfinite(np.asarray(lg2)).all()
