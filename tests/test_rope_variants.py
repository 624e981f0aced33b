"""Long-context RoPE variants vs HF oracles: Phi3 LongRope (long/short
factors), YaRN, and the reference's int8-table IRoPE.

Reference: /root/reference/mllm/backends/cpu/op/CPUNTKRoPE.cpp (LongRope),
op/CPUIRoPE.cpp (int8 tables), Layer.hpp:639,1171.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch


def _hf_rope(cfg_cls, model_cls, cfg_kwargs, seq_len):
    """Build a tiny HF model, return (inv_freq-applied cos/sin, model)."""
    torch.manual_seed(0)
    cfg = cfg_cls(**cfg_kwargs)
    model = model_cls(cfg).eval()
    return model, cfg


def test_phi3_longrope_128k_logits_match_hf(tmp_path):
    """Phi3-128k-class config (longrope long_factor branch): logits parity."""
    import transformers

    rot_half = 8  # head_dim 16 -> 8 freqs
    long_f = [1.0 + 0.35 * i for i in range(rot_half)]
    short_f = [1.0 + 0.05 * i for i in range(rot_half)]
    kw = dict(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=131072, original_max_position_embeddings=4096,
        rope_theta=10000.0,
        rope_scaling={"type": "longrope", "long_factor": long_f, "short_factor": short_f},
        tie_word_embeddings=False, torch_dtype="float32",
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.Phi3ForCausalLM(transformers.Phi3Config(**kw)).eval()
    d = tmp_path / "phi3lr"
    hf.save_pretrained(d)

    from mllm_tpu.models.registry import auto_model

    model, _, cfg = auto_model(str(d), dtype=jnp.float32, with_tokenizer=False)
    assert cfg.rope_scaling_dict()["type"] == "longrope"

    # HF's longrope switches to long factors once seq exceeds the original
    # window; drive both with a >4096 sequence
    np.random.seed(0)
    ids = np.random.randint(0, 128, (1, 4100)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits[:, -8:, :].numpy()
    cache = model.init_cache(1, 4352, jnp.float32)
    logits, _ = model(jnp.asarray(ids, jnp.int32), cache, last_only=False)
    got = np.asarray(logits)[:, -8:, :]
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_phi3_longrope_short_branch_logits_match_hf(tmp_path):
    """Same config evaluated inside the original window (short factors)."""
    import transformers

    rot_half = 8
    long_f = [2.0] * rot_half
    short_f = [1.0 + 0.1 * i for i in range(rot_half)]
    kw = dict(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=4096, original_max_position_embeddings=4096,
        rope_theta=10000.0,
        rope_scaling={"type": "longrope", "long_factor": long_f, "short_factor": short_f},
        tie_word_embeddings=False, torch_dtype="float32",
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.Phi3ForCausalLM(transformers.Phi3Config(**kw)).eval()
    d = tmp_path / "phi3sr"
    hf.save_pretrained(d)

    from mllm_tpu.models.registry import auto_model

    model, _, cfg = auto_model(str(d), dtype=jnp.float32, with_tokenizer=False)
    ids = np.random.default_rng(0).integers(0, 128, (1, 64)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    cache = model.init_cache(1, 128, jnp.float32)
    logits, _ = model(jnp.asarray(ids, jnp.int32), cache, last_only=False)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_phi3_longrope_short_seq_on_128k_config_matches_hf(tmp_path):
    """The runtime-selection case (round-2 advisor finding): a 128k
    max_position config evaluated on a SHORT (< original window) sequence
    must use SHORT factors — HF/reference select by runtime seq_len
    (modeling_rope_utils.longrope_frequency_update; CPUNTKRoPE.cpp:49-52),
    not by table size."""
    import transformers

    rot_half = 8
    long_f = [1.0 + 0.35 * i for i in range(rot_half)]
    short_f = [1.0 + 0.05 * i for i in range(rot_half)]
    kw = dict(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=131072, original_max_position_embeddings=4096,
        rope_theta=10000.0,
        rope_scaling={"type": "longrope", "long_factor": long_f, "short_factor": short_f},
        tie_word_embeddings=False, torch_dtype="float32",
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = transformers.Phi3ForCausalLM(transformers.Phi3Config(**kw)).eval()
    d = tmp_path / "phi3lr_short"
    hf.save_pretrained(d)

    from mllm_tpu.models.registry import auto_model
    from mllm_tpu.nn.layers import LongRopeEmbedding

    model, _, cfg = auto_model(str(d), dtype=jnp.float32, with_tokenizer=False)
    assert isinstance(model.rope, LongRopeEmbedding)  # dual-table variant

    ids = np.random.default_rng(1).integers(0, 128, (1, 48)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits.numpy()
    cache = model.init_cache(1, 64, jnp.float32)
    logits, _ = model(jnp.asarray(ids, jnp.int32), cache, last_only=False)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_yarn_logits_match_hf(tmp_path):
    """LLaMA + YaRN rope_scaling: logits parity vs transformers."""
    import transformers

    kw = dict(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=1024, rope_theta=10000.0,
        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 256},
        tie_word_embeddings=False, attention_bias=False, mlp_bias=False,
        torch_dtype="float32",
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(transformers.LlamaConfig(**kw)).eval()
    d = tmp_path / "yarn"
    hf.save_pretrained(d)

    from mllm_tpu.models.registry import auto_model

    model, _, cfg = auto_model(str(d), dtype=jnp.float32, with_tokenizer=False)
    ids = np.random.default_rng(0).integers(0, 128, (1, 300)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).logits[:, -8:, :].numpy()
    cache = model.init_cache(1, 512, jnp.float32)
    logits, _ = model(jnp.asarray(ids, jnp.int32), cache, last_only=False)
    np.testing.assert_allclose(np.asarray(logits)[:, -8:, :], ref, rtol=2e-3, atol=2e-3)


def test_irope_int8_tables():
    """IRoPE: tables quantized with the reference rule round(sin*127) and the
    applied rotation stays within int8 quantization error of exact RoPE."""
    from mllm_tpu.nn.layers import IRotaryEmbedding, RotaryEmbedding

    hd, mp = 32, 128
    exact = RotaryEmbedding.make(hd, mp, 10000.0)
    q = IRotaryEmbedding.make(hd, mp, 10000.0)
    # quantization rule matches op/CPUIRoPE.cpp (sin/abs_max * 127, max==1)
    np.testing.assert_array_equal(
        np.asarray(q.sin_q), np.round(np.clip(np.asarray(exact.sin), -1, 1) * 127).astype(np.int8))

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 2, hd)), jnp.float32)
    pos = jnp.arange(16)[None, :]
    out_exact = np.asarray(exact(x, pos))
    out_q = np.asarray(q(x, pos))
    err = np.abs(out_exact - out_q).max()
    assert err < 2.5 / 127  # |x|~3sigma * quant step bound
    assert not np.allclose(out_exact, out_q)  # actually quantized


def test_rope_int8_config_flag():
    """cfg.rope_int8 routes CausalLM to the int8-table rope (PhoneLM path)."""
    import jax

    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.models.transformer import CausalLM
    from mllm_tpu.nn.layers import IRotaryEmbedding

    cfg = TextConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=1, num_attention_heads=2,
                     num_key_value_heads=2, max_position_embeddings=64,
                     rope_int8=True, eos_token_id=1)
    m = CausalLM.init(jax.random.PRNGKey(0), cfg)
    assert isinstance(m.rope, IRotaryEmbedding)
    cache = m.init_cache(1, 32, jnp.float32)
    logits, _ = m(jnp.asarray([[1, 2, 3]], jnp.int32), cache)
    assert np.isfinite(np.asarray(logits)).all()
