"""Parity for OPT, BERT, StableLM (reference families opt/bert/stablelm)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from mllm_tpu.core.param_loader import SafetensorsLoader


def test_opt_parity(tmp_path):
    import transformers

    torch.manual_seed(0)
    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        do_layer_norm_before=True, word_embed_proj_dim=32,
    )
    hf = transformers.OPTForCausalLM(cfg).eval()
    d = tmp_path / "opt"
    hf.save_pretrained(d)

    from mllm_tpu.models.opt import load_opt, opt_config_from_hf

    ours = load_opt(SafetensorsLoader(str(d)), opt_config_from_hf(str(d)))
    ids = np.array([[5, 17, 42, 99, 7]], np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    cache = ours.init_cache(1, 16, jnp.float32)
    lg, cache = ours(jnp.asarray(ids, jnp.int32), cache, last_only=False)
    np.testing.assert_allclose(np.asarray(lg), ref, rtol=2e-3, atol=2e-3)
    # incremental decode parity
    lg2, cache = ours(jnp.asarray([[3]], jnp.int32), cache, last_only=True)
    with torch.no_grad():
        ref2 = hf(torch.from_numpy(np.concatenate([ids, [[3]]], 1))).logits[:, -1:].numpy()
    np.testing.assert_allclose(np.asarray(lg2), ref2, rtol=2e-3, atol=2e-3)


def test_bert_parity(tmp_path):
    import transformers

    torch.manual_seed(0)
    cfg = transformers.BertConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=32, type_vocab_size=2,
    )
    hf = transformers.BertModel(cfg).eval()
    d = tmp_path / "bert"
    hf.save_pretrained(d)

    from mllm_tpu.models.bert import bert_config_from_hf, load_bert

    ours = load_bert(SafetensorsLoader(str(d)), bert_config_from_hf(str(d)))
    ids = np.array([[2, 5, 9, 11, 3, 0, 0]], np.int64)
    mask = np.array([[1, 1, 1, 1, 1, 0, 0]], np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    out = np.asarray(ours(jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
                          jnp.asarray(np.zeros_like(ids), jnp.int32)))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_stablelm_parity(tmp_path):
    import transformers

    torch.manual_seed(0)
    cfg = transformers.StableLmConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=64,
        partial_rotary_factor=0.25, use_qkv_bias=False, rope_theta=10000.0,
        layer_norm_eps=1e-5, tie_word_embeddings=False,
    )
    hf = transformers.StableLmForCausalLM(cfg).eval()
    d = tmp_path / "stablelm"
    hf.save_pretrained(d)

    from mllm_tpu.models.registry import auto_model

    ours, _, mcfg = auto_model(str(d), dtype=jnp.float32, with_tokenizer=False)
    assert mcfg.norm_type == "layernorm" and mcfg.rope_partial == 0.25
    ids = np.array([[5, 17, 42, 99, 7, 23]], np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    cache = ours.init_cache(1, 16, jnp.float32)
    lg, _ = ours(jnp.asarray(ids, jnp.int32), cache, last_only=False)
    np.testing.assert_allclose(np.asarray(lg), ref, rtol=2e-3, atol=2e-3)
