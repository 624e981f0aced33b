"""End-to-end checkpoint parity vs transformers (torch CPU) — the analogue of
the reference's token-for-token gate against its C++ CPU FP32 path
(SURVEY.md §4): save a tiny HF model, load it through our auto_model, compare
logits and greedy generations."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from mllm_tpu.generation.generate import generate
from mllm_tpu.generation.sampling import SamplingConfig
from mllm_tpu.models.registry import auto_model


def _save_tiny(tmp_path, kind: str):
    import transformers

    torch.manual_seed(0)
    if kind == "qwen2":
        cfg = transformers.Qwen2Config(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
            rope_theta=10000.0, tie_word_embeddings=False,
        )
        model = transformers.Qwen2ForCausalLM(cfg)
    elif kind == "llama":
        cfg = transformers.LlamaConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=128,
            rope_theta=10000.0, tie_word_embeddings=True, attention_bias=False,
        )
        model = transformers.LlamaForCausalLM(cfg)
    elif kind == "qwen3":
        cfg = transformers.Qwen3Config(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            max_position_embeddings=128, rope_theta=10000.0, tie_word_embeddings=False,
        )
        model = transformers.Qwen3ForCausalLM(cfg)
    elif kind == "gemma2":
        cfg = transformers.Gemma2Config(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8,
            max_position_embeddings=128, rope_theta=10000.0,
            sliding_window=16, query_pre_attn_scalar=8,
            final_logit_softcapping=30.0, attn_logit_softcapping=50.0,
        )
        model = transformers.Gemma2ForCausalLM(cfg)
    elif kind == "mistral":
        cfg = transformers.MistralConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
            rope_theta=10000.0, sliding_window=None,
        )
        model = transformers.MistralForCausalLM(cfg)
    model = model.eval()
    d = tmp_path / kind
    model.save_pretrained(d)
    return model, d


@pytest.mark.parametrize("kind", ["qwen2", "llama", "qwen3", "mistral", "gemma2"])
def test_logits_and_greedy_parity(tmp_path, kind):
    hf_model, d = _save_tiny(tmp_path, kind)
    ours, _, cfg = auto_model(str(d), dtype=jnp.float32, with_tokenizer=False)

    ids = np.array([[3, 17, 42, 99, 7, 23]], np.int64)
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()

    cache = ours.init_cache(1, 32, jnp.float32)
    our_logits, _ = ours(jnp.asarray(ids, jnp.int32), cache, last_only=False)
    np.testing.assert_allclose(
        np.asarray(our_logits), hf_logits, rtol=2e-3, atol=2e-3
    )

    # greedy token parity over 8 steps
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.from_numpy(ids), max_new_tokens=8, do_sample=False,
            eos_token_id=None, pad_token_id=0,
        )[0, ids.shape[1]:].numpy()
    cache = ours.init_cache(1, 32, jnp.float32)
    res, _ = generate(
        ours, ids.astype(np.int32), cache, SamplingConfig(max_new_tokens=8),
        eos_token_id={-1}, bucket=8,
    )
    np.testing.assert_array_equal(np.asarray(res.tokens), hf_out)


def test_int8_quantized_load_close(tmp_path):
    """Quantized load path: logits stay close to fp32 (reference quantizer
    round-trip gate, test/quantizer)."""
    hf_model, d = _save_tiny(tmp_path, "qwen2")
    ours, _, cfg = auto_model(str(d), dtype=jnp.float32, with_tokenizer=False, quant="int8")
    ids = np.array([[3, 17, 42, 99]], np.int64)
    with torch.no_grad():
        hf_logits = hf_model(torch.from_numpy(ids)).logits.numpy()
    cache = ours.init_cache(1, 16, jnp.float32)
    our_logits, _ = ours(jnp.asarray(ids, jnp.int32), cache, last_only=False)
    # int8 weights: expect close-but-not-exact
    err = np.max(np.abs(np.asarray(our_logits) - hf_logits)) / (np.max(np.abs(hf_logits)) + 1e-9)
    assert err < 0.05, err


def test_phi3_fused_qkv_parity(tmp_path):
    """Phi3: fused qkv_proj / gate_up_proj split at load."""
    import transformers

    torch.manual_seed(0)
    cfg = transformers.Phi3Config(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
        rope_theta=10000.0, tie_word_embeddings=False, pad_token_id=0,
    )
    hf = transformers.Phi3ForCausalLM(cfg).eval()
    d = tmp_path / "phi3"
    hf.save_pretrained(d)
    ours, _, mcfg = auto_model(str(d), dtype=jnp.float32, with_tokenizer=False)
    ids = np.array([[5, 17, 42, 99, 7, 23]], np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    cache = ours.init_cache(1, 16, jnp.float32)
    lg, _ = ours(jnp.asarray(ids, jnp.int32), cache, last_only=False)
    np.testing.assert_allclose(np.asarray(lg), ref, rtol=2e-3, atol=2e-3)
