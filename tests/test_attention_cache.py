"""Attention + KV-cache semantics: sdpa vs torch, GQA, sliding window,
incremental decode parity, speculative rollback."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from mllm_tpu.kv.cache import KVCache
from mllm_tpu.nn.attention import sdpa


def _np_attn(q, k, v, causal_offset=None, valid=None, window=None):
    """Oracle via torch sdpa with explicit mask. q:[B,Sq,H,D], k/v:[B,H,Skv,D]."""
    B, Sq, H, D = q.shape
    Skv = k.shape[2]
    qt = torch.from_numpy(q).permute(0, 2, 1, 3)  # B H Sq D
    kt = torch.from_numpy(k)
    vt = torch.from_numpy(v)
    mask = torch.zeros(Sq, Skv)
    kpos = torch.arange(Skv)[None, :]
    ok = torch.ones(Sq, Skv, dtype=torch.bool)
    if causal_offset is not None:
        qpos = causal_offset + torch.arange(Sq)[:, None]
        ok &= kpos <= qpos
        if window is not None:
            ok &= kpos > qpos - window
    if valid is not None:
        ok &= kpos < valid
    mask = torch.where(ok, 0.0, float("-inf"))
    out = torch.nn.functional.scaled_dot_product_attention(qt, kt, vt, attn_mask=mask)
    return out.permute(0, 2, 1, 3).numpy()


def test_sdpa_vs_torch_causal():
    rng = np.random.default_rng(0)
    B, Sq, H, D, Skv = 2, 5, 4, 16, 9
    q = rng.standard_normal((B, Sq, H, D)).astype(np.float32)
    k = rng.standard_normal((B, H, Skv, D)).astype(np.float32)
    v = rng.standard_normal((B, H, Skv, D)).astype(np.float32)
    ours = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           q_offset=4, kv_valid_len=9, causal=True))
    ref = _np_attn(q, k, v, causal_offset=4, valid=9)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_sdpa_gqa_and_window():
    rng = np.random.default_rng(1)
    B, Sq, H, HKV, D, Skv = 1, 6, 8, 2, 16, 12
    q = rng.standard_normal((B, Sq, H, D)).astype(np.float32)
    k = rng.standard_normal((B, HKV, Skv, D)).astype(np.float32)
    v = rng.standard_normal((B, HKV, Skv, D)).astype(np.float32)
    ours = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           q_offset=6, kv_valid_len=12, causal=True, window=4))
    k_rep = np.repeat(k, H // HKV, axis=1)
    v_rep = np.repeat(v, H // HKV, axis=1)
    ref = _np_attn(q, k_rep, v_rep, causal_offset=6, valid=12, window=4)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_cache_append_and_layout():
    cache = KVCache.init(2, 1, 8, 2, 4, jnp.float32)
    k_new = jnp.arange(1 * 3 * 2 * 4, dtype=jnp.float32).reshape(1, 3, 2, 4)
    cache = cache.update_layer(0, k_new, k_new * 2)
    cache = cache.advance(3)
    k0, v0 = cache.layer(0)
    assert k0.shape == (1, 2, 8, 4)
    # [B,S,H,D] -> [B,H,S,D]
    np.testing.assert_array_equal(np.asarray(k0[0, :, :3]), np.asarray(k_new[0]).transpose(1, 0, 2))
    assert int(cache.pos) == 3
    # second append lands at pos 3
    k2 = jnp.ones((1, 1, 2, 4)) * 7
    cache = cache.update_layer(0, k2, k2).advance(1)
    np.testing.assert_array_equal(np.asarray(cache.layer(0)[0][0, :, 3]), np.full((2, 4), 7.0))


def test_rollback_accept():
    cache = KVCache.init(1, 1, 16, 1, 4, jnp.float32)
    # "prefill" 4 tokens: values = position index
    base = jnp.arange(4, dtype=jnp.float32)[None, :, None, None] * jnp.ones((1, 4, 1, 4))
    cache = cache.update_layer(0, base, base).advance(4)
    # append 4 draft tokens at pos 4..7 with values 10+i
    draft = (10 + jnp.arange(4, dtype=jnp.float32))[None, :, None, None] * jnp.ones((1, 4, 1, 4))
    cache = cache.update_layer(0, draft, draft)
    # accept drafts 0 and 2
    cache = cache.rollback_accept(4, jnp.asarray([0, 2, 0, 0], jnp.int32), 2)
    assert int(cache.pos) == 6
    k0 = np.asarray(cache.layer(0)[0])[0, 0]  # [S, D]
    assert k0[4, 0] == 10.0
    assert k0[5, 0] == 12.0


def test_incremental_matches_full():
    """Prefill+decode over the cache == one full forward (reference
    token-parity gate, SURVEY.md §4)."""
    import jax.random as jr
    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.models.transformer import CausalLM

    cfg = TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
        eos_token_id=63, rope_theta=10000.0,
    )
    model = CausalLM.init(jr.PRNGKey(0), cfg)
    ids = jnp.asarray(np.arange(1, 11)[None], jnp.int32)  # 10 tokens

    # full forward
    cache_a = model.init_cache(1, 32, jnp.float32)
    logits_full, _ = model(ids, cache_a, last_only=False)

    # prefill 6 then decode 4
    cache_b = model.init_cache(1, 32, jnp.float32)
    lg6, cache_b = model(ids[:, :6], cache_b, last_only=False)
    outs = [np.asarray(lg6)[0]]
    for i in range(6, 10):
        lg, cache_b = model(ids[:, i : i + 1], cache_b, last_only=False)
        outs.append(np.asarray(lg)[0])
    inc = np.concatenate(outs, axis=0)
    np.testing.assert_allclose(np.asarray(logits_full)[0], inc, rtol=2e-3, atol=2e-4)


def test_quant_kv_cache_close_to_fp():
    """int8 KV cache: logits stay close to the fp32 cache path."""
    import jax.random as jr
    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.kv.cache import QuantKVCache
    from mllm_tpu.models.transformer import CausalLM

    cfg = TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
        eos_token_id=63, rope_theta=10000.0,
    )
    model = CausalLM.init(jr.PRNGKey(0), cfg)
    ids = jnp.asarray(np.arange(1, 11)[None], jnp.int32)

    cache_fp = model.init_cache(1, 32, jnp.float32)
    ref, cache_fp = model(ids, cache_fp, last_only=False)

    cache_q = QuantKVCache.init(2, 1, 32, 2, 8)
    out, cache_q = model(ids, cache_q, last_only=False)
    rel = np.max(np.abs(np.asarray(out) - np.asarray(ref))) / (np.max(np.abs(np.asarray(ref))) + 1e-9)
    assert rel < 0.05, rel
    assert int(cache_q.pos) == 10
    # incremental decode continues fine
    out2, cache_q = model(jnp.asarray([[5]], jnp.int32), cache_q, last_only=True)
    assert np.isfinite(np.asarray(out2)).all()


def test_stacked_scan_matches_unrolled():
    """model.stack(): scanned layers must equal the unrolled python loop."""
    import jax.random as jr
    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.models.transformer import CausalLM

    cfg = TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
        eos_token_id=63, rope_theta=10000.0,
    )
    model = CausalLM.init(jr.PRNGKey(2), cfg)
    stacked = model.stack()
    ids = jnp.asarray(np.arange(1, 9)[None], jnp.int32)

    cache_a = model.init_cache(1, 16, jnp.float32)
    ref, cache_a = model(ids, cache_a, last_only=False)
    cache_b = model.init_cache(1, 16, jnp.float32)
    out, cache_b = stacked(ids, cache_b, last_only=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(cache_b.k), np.asarray(cache_a.k), rtol=1e-5, atol=1e-6)

    # decode step parity too
    ref2, cache_a = model(jnp.asarray([[3]], jnp.int32), cache_a)
    out2, cache_b = stacked(jnp.asarray([[3]], jnp.int32), cache_b)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=2e-4, atol=2e-5)

    # cacheless (training) path
    l_ref = model.loss(ids, ids)
    l_out = stacked.loss(ids, ids)
    np.testing.assert_allclose(float(l_out), float(l_ref), rtol=1e-5)


def test_quant_rollback_accept():
    """QuantKVCache composes with tree speculative decoding (ADVICE r1)."""
    from mllm_tpu.kv.cache import QuantKVCache

    cache = QuantKVCache.init(1, 1, 16, 1, 4)
    base = jnp.arange(1, 5, dtype=jnp.float32)[None, :, None, None] * jnp.ones((1, 4, 1, 4))
    cache = cache.update_layer(0, base, base).advance(4)
    draft = (10 + jnp.arange(4, dtype=jnp.float32))[None, :, None, None] * jnp.ones((1, 4, 1, 4))
    cache = cache.update_layer(0, draft, draft)
    cache = cache.rollback_accept(4, jnp.asarray([0, 2, 0, 0], jnp.int32), 2)
    assert int(cache.pos) == 6
    k0 = np.asarray(cache.layer(0)[0])[0, 0]  # dequantized [S, D]
    np.testing.assert_allclose(k0[4, 0], 10.0, rtol=2e-2)
    np.testing.assert_allclose(k0[5, 0], 12.0, rtol=2e-2)


def test_decode_attention_partial_final_block_interpret():
    """max_len not a multiple of block_k: the final DMA block is clamped
    in-bounds and overlapped rows re-masked (ADVICE r1, medium)."""
    from mllm_tpu.nn.attention import sdpa
    from mllm_tpu.ops.decode_attention import decode_attention

    B, H, HKV, D, SKV = 2, 4, 2, 128, 384  # 384 = 256 + partial 128
    q = jax.random.normal(jax.random.PRNGKey(3), (B, 1, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (B, HKV, SKV, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(5), (B, HKV, SKV, D), jnp.float32)
    for valid in (300, 384):
        ref = sdpa(q, k, v, q_offset=valid - 1, kv_valid_len=valid, causal=False)
        out = decode_attention(q, k, v, kv_valid_len=valid, block_k=256, interpret=True)
        assert float(jnp.max(jnp.abs(ref - out))) < 1e-2


def test_decode_attention_quant_interpret():
    """Fused int8-KV decode kernel vs sdpa on the dequantized cache."""
    from mllm_tpu.kv.cache import QuantKVCache
    from mllm_tpu.nn.attention import sdpa
    from mllm_tpu.ops.decode_attention import decode_attention_quant

    B, H, HKV, D, SKV = 2, 4, 2, 128, 384
    q = jax.random.normal(jax.random.PRNGKey(0), (B, 1, H, D), jnp.float32)
    kf = jax.random.normal(jax.random.PRNGKey(1), (B, SKV, HKV, D), jnp.float32)
    vf = jax.random.normal(jax.random.PRNGKey(2), (B, SKV, HKV, D), jnp.float32)
    cache = QuantKVCache.init(1, B, SKV, HKV, D)
    cache = cache.update_layer(0, kf, vf).advance(SKV)
    kd, vd = cache.layer(0)  # dequantized [B, H, S, D]
    for valid in (300, 384):
        ref = sdpa(q, kd.astype(jnp.float32), vd.astype(jnp.float32),
                   q_offset=valid - 1, kv_valid_len=valid, causal=False)
        out = decode_attention_quant(
            q, cache.k[0], cache.v[0], cache.k_scale[0], cache.v_scale[0],
            kv_valid_len=valid, block_k=256, interpret=True)
        assert float(jnp.max(jnp.abs(ref - out))) < 2e-2


def test_generate_with_int8_kv_cache():
    """End-to-end generate over QuantKVCache tracks the bf16-KV output."""
    import jax.random as jr
    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.generation.generate import generate
    from mllm_tpu.generation.sampling import SamplingConfig
    from mllm_tpu.models.transformer import CausalLM

    cfg = TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        eos_token_id=127,
    )
    model = CausalLM.init(jr.PRNGKey(0), cfg)
    ids = np.arange(1, 9, dtype=np.int32)[None]
    scfg = SamplingConfig(max_new_tokens=8, temperature=0.0)

    res_a, _ = generate(model, ids, model.init_cache(1, 192, jnp.float32), scfg)
    res_b, _ = generate(model, ids, model.init_cache(1, 192, kv_dtype="int8"), scfg)
    # int8 KV is lossy; with random weights logits gaps are tiny — require the
    # first few greedy tokens to agree
    assert res_a.tokens[:4] == res_b.tokens[:4]


def test_quant4_kv_cache_roundtrip_and_model():
    """int4 KV cache: pack/dequant roundtrip within 4-bit error; model
    logits stay usable vs the fp32 cache path."""
    import jax.random as jr
    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.kv.cache import Quant4KVCache
    from mllm_tpu.models.transformer import CausalLM

    # roundtrip: per-vector 4-bit quantization error bound (scale/2 per elem)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 8, 16), jnp.float32)
    q, s = Quant4KVCache._quantize(x)
    back = np.asarray(Quant4KVCache._dequant(q, s), np.float32)
    err = np.abs(back - np.asarray(x))
    bound = np.asarray(s)[..., None] * 0.51 + 1e-6
    assert (err <= bound).all(), float(err.max())

    cfg = TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
        eos_token_id=63, rope_theta=10000.0,
    )
    model = CausalLM.init(jr.PRNGKey(0), cfg)
    ids = jnp.asarray(np.arange(1, 11)[None], jnp.int32)
    cache_fp = model.init_cache(1, 32, jnp.float32)
    ref, _ = model(ids, cache_fp, last_only=False)
    cache_q = model.init_cache(1, 32, kv_dtype="int4")
    assert isinstance(cache_q, Quant4KVCache)
    out, cache_q = model(ids, cache_q, last_only=False)
    rel = np.max(np.abs(np.asarray(out) - np.asarray(ref))) / (np.max(np.abs(np.asarray(ref))) + 1e-9)
    assert rel < 0.25, rel  # 4-bit KV is lossy; must stay in the ballpark
    assert int(cache_q.pos) == 10
    out2, cache_q = model(jnp.asarray([[5]], jnp.int32), cache_q, last_only=True)
    assert np.isfinite(np.asarray(out2)).all()


def test_decode_attention_quant4_interpret():
    """Fused int4-KV decode kernel vs sdpa on the dequantized cache."""
    from mllm_tpu.kv.cache import Quant4KVCache
    from mllm_tpu.nn.attention import sdpa
    from mllm_tpu.ops.decode_attention import decode_attention_quant

    B, H, HKV, D, SKV = 2, 4, 2, 128, 384
    q = jax.random.normal(jax.random.PRNGKey(0), (B, 1, H, D), jnp.float32)
    kf = jax.random.normal(jax.random.PRNGKey(1), (B, SKV, HKV, D), jnp.float32)
    vf = jax.random.normal(jax.random.PRNGKey(2), (B, SKV, HKV, D), jnp.float32)
    cache = Quant4KVCache.init(1, B, SKV, HKV, D)
    cache = cache.update_layer(0, kf, vf).advance(SKV)
    kd, vd = cache.layer(0)  # dequantized [B, H, S, D]
    for valid in (300, 384):
        ref = sdpa(q, kd.astype(jnp.float32), vd.astype(jnp.float32),
                   q_offset=valid - 1, kv_valid_len=valid, causal=False)
        out = decode_attention_quant(
            q, cache.k[0], cache.v[0], cache.k_scale[0], cache.v_scale[0],
            kv_valid_len=valid, block_k=256, interpret=True)
        assert float(jnp.max(jnp.abs(ref - out))) < 2e-2


def test_flash_attention_quant4_interpret():
    """int4-KV flash prefill kernel vs dequant-then-flash oracle."""
    from mllm_tpu.kv.cache import Quant4KVCache
    from mllm_tpu.nn.attention import sdpa
    from mllm_tpu.ops.flash_attention import flash_attention_quant

    B, H, HKV, D, SQ, SKV = 1, 4, 2, 128, 128, 256
    q = jax.random.normal(jax.random.PRNGKey(0), (B, SQ, H, D), jnp.float32)
    kf = jax.random.normal(jax.random.PRNGKey(1), (B, SKV, HKV, D), jnp.float32)
    vf = jax.random.normal(jax.random.PRNGKey(2), (B, SKV, HKV, D), jnp.float32)
    cache = Quant4KVCache.init(1, B, SKV, HKV, D)
    cache = cache.update_layer(0, kf, vf).advance(SKV)
    kd, vd = cache.layer(0)
    q_off = SKV - SQ
    ref = sdpa(q, kd.astype(jnp.float32), vd.astype(jnp.float32),
               q_offset=q_off, kv_valid_len=SKV, causal=True)
    out = flash_attention_quant(
        q, cache.k[0], cache.v[0], cache.k_scale[0], cache.v_scale[0],
        q_offset=q_off, kv_valid_len=SKV, causal=True, interpret=True)
    assert float(jnp.max(jnp.abs(ref - out))) < 2e-2


def test_generate_with_int4_kv_cache():
    """End-to-end generate over Quant4KVCache tracks the bf16-KV output."""
    import jax.random as jr
    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.generation.generate import generate
    from mllm_tpu.generation.sampling import SamplingConfig
    from mllm_tpu.models.transformer import CausalLM

    cfg = TextConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        eos_token_id=127,
    )
    model = CausalLM.init(jr.PRNGKey(0), cfg)
    ids = np.arange(1, 9, dtype=np.int32)[None]
    scfg = SamplingConfig(max_new_tokens=8, temperature=0.0)

    res_a, _ = generate(model, ids, model.init_cache(1, 192, jnp.float32), scfg)
    res_b, _ = generate(model, ids, model.init_cache(1, 192, kv_dtype="int4"), scfg)
    assert res_a.tokens[:3] == res_b.tokens[:3]


def test_quant4_rollback_accept():
    """Quant4KVCache composes with tree speculative decoding (packed bytes
    and their scales move together)."""
    from mllm_tpu.kv.cache import Quant4KVCache

    cache = Quant4KVCache.init(1, 1, 16, 1, 4)
    base = jnp.arange(1, 5, dtype=jnp.float32)[None, :, None, None] * jnp.ones((1, 4, 1, 4))
    cache = cache.update_layer(0, base, base).advance(4)
    draft = (10 + jnp.arange(4, dtype=jnp.float32))[None, :, None, None] * jnp.ones((1, 4, 1, 4))
    cache = cache.update_layer(0, draft, draft)
    cache = cache.rollback_accept(4, jnp.asarray([0, 2, 0, 0], jnp.int32), 2)
    assert int(cache.pos) == 6
    k0 = np.asarray(cache.layer(0)[0], np.float32)[0, 0]  # dequantized [S, D]
    np.testing.assert_allclose(k0[4, 0], 10.0, rtol=8e-2)
    np.testing.assert_allclose(k0[5, 0], 12.0, rtol=8e-2)
