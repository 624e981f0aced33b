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


def test_minicpm_dense_builds_and_parity(tmp_path):
    """MiniCPM dense (round-2 verdict missing #1): the model_type must
    dispatch through build_model, and the scale_depth/scale_emb/
    dim_model_base multipliers (reference
    models/minicpm/modeling_minicpm.hpp:62-65,126-128) must be applied.

    Oracle: minicpm(W) == llama(W') where W' absorbs the multipliers into
    the weights (embed*=scale_emb, o/down*=scale_depth/sqrt(L),
    lm_head/= hidden/dim_model_base) — the llama path is HF-parity-tested
    above, so agreement here pins the minicpm math."""
    import json as _json
    import math
    from safetensors.torch import save_file

    torch.manual_seed(0)
    L, D, FF, V, H = 2, 32, 64, 128, 4
    scale_depth, scale_emb, dim_model_base = 1.4, 12.0, 16.0
    names = {"model.embed_tokens.weight": (V, D), "model.norm.weight": (D,),
             "lm_head.weight": (V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        names.update({
            p + "self_attn.q_proj.weight": (D, D), p + "self_attn.k_proj.weight": (D, D),
            p + "self_attn.v_proj.weight": (D, D), p + "self_attn.o_proj.weight": (D, D),
            p + "mlp.gate_proj.weight": (FF, D), p + "mlp.up_proj.weight": (FF, D),
            p + "mlp.down_proj.weight": (D, FF),
            p + "input_layernorm.weight": (D,), p + "post_attention_layernorm.weight": (D,),
        })
    W = {k: torch.randn(*s) * 0.1 if len(s) > 1 else torch.ones(*s) + torch.randn(*s) * 0.02
         for k, s in names.items()}

    base_cfg = dict(vocab_size=V, hidden_size=D, intermediate_size=FF,
                    num_hidden_layers=L, num_attention_heads=H, num_key_value_heads=H,
                    max_position_embeddings=64, rope_theta=10000.0,
                    tie_word_embeddings=False, hidden_act="silu", rms_norm_eps=1e-5)

    d1 = tmp_path / "minicpm"; d1.mkdir()
    save_file(W, str(d1 / "model.safetensors"))
    (d1 / "config.json").write_text(_json.dumps(dict(
        base_cfg, model_type="minicpm", scale_depth=scale_depth,
        scale_emb=scale_emb, dim_model_base=dim_model_base)))

    rm = scale_depth / math.sqrt(L)
    W2 = dict(W)
    W2["model.embed_tokens.weight"] = W["model.embed_tokens.weight"] * scale_emb
    W2["lm_head.weight"] = W["lm_head.weight"] / (D / dim_model_base)
    for i in range(L):
        p = f"model.layers.{i}."
        W2[p + "self_attn.o_proj.weight"] = W[p + "self_attn.o_proj.weight"] * rm
        W2[p + "mlp.down_proj.weight"] = W[p + "mlp.down_proj.weight"] * rm
    d2 = tmp_path / "llama_oracle"; d2.mkdir()
    save_file(W2, str(d2 / "model.safetensors"))
    (d2 / "config.json").write_text(_json.dumps(dict(
        base_cfg, model_type="llama", attention_bias=False)))

    m1, _, c1 = auto_model(str(d1), dtype=jnp.float32, with_tokenizer=False)
    m2, _, _ = auto_model(str(d2), dtype=jnp.float32, with_tokenizer=False)
    assert c1.residual_multiplier == pytest.approx(rm)
    assert c1.logit_divisor == pytest.approx(D / dim_model_base)

    ids = np.array([[3, 17, 42, 99, 7, 23]], np.int64)
    lg1, _ = m1(jnp.asarray(ids, jnp.int32), m1.init_cache(1, 16, jnp.float32), last_only=False)
    lg2, _ = m2(jnp.asarray(ids, jnp.int32), m2.init_cache(1, 16, jnp.float32), last_only=False)
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2), rtol=1e-4, atol=1e-4)
