"""GGUF loader: round-trip through our writer, metadata config, tokenizer,
and end-to-end model load with quantized tensors."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from mllm_tpu.core import dtypes as dt
from mllm_tpu.core.gguf import (
    GGUFFile,
    GGUFLoader,
    GGUFWriter,
    _T_ARR,
    _T_F32,
    _T_STR,
    _T_U32,
    config_from_gguf,
    load_gguf_model,
    tokenizer_from_gguf,
)


def _write_tiny_llama_gguf(path, hf_model, cfg):
    w = GGUFWriter(path, "llama")
    w.add_kv("llama.embedding_length", _T_U32, cfg.hidden_size)
    w.add_kv("llama.block_count", _T_U32, cfg.num_hidden_layers)
    w.add_kv("llama.feed_forward_length", _T_U32, cfg.intermediate_size)
    w.add_kv("llama.attention.head_count", _T_U32, cfg.num_attention_heads)
    w.add_kv("llama.attention.head_count_kv", _T_U32, cfg.num_key_value_heads)
    w.add_kv("llama.context_length", _T_U32, cfg.max_position_embeddings)
    w.add_kv("llama.attention.layer_norm_rms_epsilon", _T_F32, cfg.rms_norm_eps)
    w.add_kv("llama.rope.freq_base", _T_F32, cfg.rope_theta)
    toks = [f"<t{i}>" for i in range(cfg.vocab_size)]
    w.add_kv("tokenizer.ggml.model", _T_STR, "llama")
    w.add_kv("tokenizer.ggml.tokens", _T_ARR, (_T_STR, toks))
    w.add_kv("tokenizer.ggml.scores", _T_ARR, (_T_F32, [0.0] * len(toks)))
    w.add_kv("tokenizer.ggml.bos_token_id", _T_U32, 1)
    w.add_kv("tokenizer.ggml.eos_token_id", _T_U32, 2)

    sd = {k: v.float().numpy() for k, v in hf_model.state_dict().items()}

    def t(hf_name, gguf_name, quant=None):
        a = sd[hf_name]
        if quant == "q8_0":
            w.add_tensor(gguf_name, dt.quant_q8_0(a.reshape(-1)).tobytes(), a.shape, 8)
        else:
            w.add_tensor(gguf_name, a)

    t("model.embed_tokens.weight", "token_embd.weight")
    t("model.norm.weight", "output_norm.weight")
    t("lm_head.weight", "output.weight")
    for i in range(cfg.num_hidden_layers):
        p = f"model.layers.{i}."
        g = f"blk.{i}."
        t(p + "self_attn.q_proj.weight", g + "attn_q.weight", "q8_0")
        t(p + "self_attn.k_proj.weight", g + "attn_k.weight", "q8_0")
        t(p + "self_attn.v_proj.weight", g + "attn_v.weight", "q8_0")
        t(p + "self_attn.o_proj.weight", g + "attn_output.weight", "q8_0")
        t(p + "mlp.gate_proj.weight", g + "ffn_gate.weight", "q8_0")
        t(p + "mlp.up_proj.weight", g + "ffn_up.weight", "q8_0")
        t(p + "mlp.down_proj.weight", g + "ffn_down.weight", "q8_0")
        t(p + "input_layernorm.weight", g + "attn_norm.weight")
        t(p + "post_attention_layernorm.weight", g + "ffn_norm.weight")
    w.write()


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    import transformers

    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        rope_theta=10000.0, tie_word_embeddings=False, attention_bias=False,
    )
    model = transformers.LlamaForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("gguf") / "tiny.gguf"
    _write_tiny_llama_gguf(path, model, cfg)
    return model, str(path), cfg


def test_gguf_parse_and_metadata(tiny_gguf):
    hf, path, hcfg = tiny_gguf
    f = GGUFFile(path)
    assert f.metadata["general.architecture"] == "llama"
    cfg = config_from_gguf(f)
    assert cfg.hidden_size == 32 and cfg.num_hidden_layers == 2
    assert cfg.num_key_value_heads == 2
    assert cfg.vocab_size == 96
    assert not cfg.tie_word_embeddings


def test_gguf_tensor_roundtrip(tiny_gguf):
    hf, path, hcfg = tiny_gguf
    f = GGUFFile(path)
    emb = f.tensor("token_embd.weight")
    np.testing.assert_allclose(
        emb, hf.model.embed_tokens.weight.detach().float().numpy(), rtol=1e-6
    )
    # loader resolves HF names
    ld = GGUFLoader(path)
    assert "model.layers.0.self_attn.q_proj.weight" in ld
    assert ld.dtype("model.layers.0.self_attn.q_proj.weight") == dt.DataType.Q8_0


def test_gguf_model_load_and_logits(tiny_gguf):
    hf, path, hcfg = tiny_gguf
    model, tok, cfg = load_gguf_model(path, dtype=jnp.float32)
    assert tok.bos_token_id == 1
    ids = np.array([[5, 17, 42, 9, 7]], np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    cache = model.init_cache(1, 16, jnp.float32)
    lg, _ = model(jnp.asarray(ids, jnp.int32), cache, last_only=False)
    # q8_0 weights: near-parity
    err = np.max(np.abs(np.asarray(lg) - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert err < 0.03, err
    # greedy argmax should match on most positions
    agree = (np.argmax(np.asarray(lg), -1) == np.argmax(ref, -1)).mean()
    assert agree >= 0.8
