"""Continuous-batching engine: greedy token-exactness vs the single-stream
path, slot reuse, and interleaved admission."""

import numpy as np
import jax
import jax.numpy as jnp

from mllm_tpu.core.config import TextConfig
from mllm_tpu.generation.engine import ContinuousEngine, collect
from mllm_tpu.generation.generate import generate
from mllm_tpu.generation.sampling import SamplingConfig
from mllm_tpu.models.transformer import CausalLM


def _tiny():
    cfg = TextConfig(
        vocab_size=97, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        eos_token_id=-9,  # never sampled: fixed-length outputs
    )
    return CausalLM.init(jax.random.PRNGKey(3), cfg), cfg


def _single_stream(model, ids, n):
    cache = model.init_cache(1, 64, jnp.float32)
    res, _ = generate(model, ids[None, :], cache, SamplingConfig(max_new_tokens=n),
                      bucket=16)
    return res.tokens


def test_engine_matches_single_stream_interleaved():
    model, cfg = _tiny()
    eng = ContinuousEngine(model, slots=4, max_len=64, prompt_bucket=16,
                           kv_dtype=jnp.float32, start_thread=False)
    prompts = [
        np.arange(5, dtype=np.int32) % 97,
        (np.arange(9, dtype=np.int32) * 3) % 97,
        (np.arange(3, dtype=np.int32) + 40) % 97,
    ]
    want = [_single_stream(model, p, 6) for p in prompts]

    # submit at different times: two up front, one mid-decode
    q0 = eng.submit(prompts[0], 6)
    q1 = eng.submit(prompts[1], 6)
    eng.step()  # admits both, first decode
    eng.step()
    q2 = eng.submit(prompts[2], 6)  # joins while 0/1 are mid-flight
    for _ in range(12):
        eng.step()
    got = [collect(q, timeout=5) for q in (q0, q1, q2)]
    assert got[0] == want[0]
    assert got[1] == want[1]
    assert got[2] == want[2]


def test_engine_slot_reuse():
    model, cfg = _tiny()
    eng = ContinuousEngine(model, slots=2, max_len=64, prompt_bucket=16,
                           kv_dtype=jnp.float32, start_thread=False)
    # 4 requests through 2 slots: the last two must wait for free slots
    qs = [eng.submit((np.arange(4, dtype=np.int32) + i) % 97, 4) for i in range(4)]
    for _ in range(30):
        eng.step()
    outs = [collect(q, timeout=5) for q in qs]
    assert all(len(o) == 4 for o in outs)
    # a reused slot must produce the same tokens as a fresh single-stream run
    for i, o in enumerate(outs):
        want = _single_stream(model, (np.arange(4, dtype=np.int32) + i) % 97, 4)
        assert o == want, f"request {i}: {o} != {want}"


def test_engine_background_thread():
    model, cfg = _tiny()
    eng = ContinuousEngine(model, slots=2, max_len=64, prompt_bucket=16,
                           kv_dtype=jnp.float32, start_thread=True)
    q = eng.submit(np.arange(6, dtype=np.int32) % 97, 5)
    out = collect(q, timeout=60)
    eng.stop()
    assert out == _single_stream(model, np.arange(6, dtype=np.int32) % 97, 5)


def test_engine_sampled_topk1_matches_greedy():
    """The compiled decode window samples per-slot on device
    (sample_tokens_batched).  top_k=1 sampling must reduce to argmax —
    pinning the batched top-k mask — while a greedy slot runs alongside
    with its own (temperature=0) params."""
    model, cfg = _tiny()
    eng = ContinuousEngine(model, slots=2, max_len=64, prompt_bucket=16,
                           kv_dtype=jnp.float32, start_thread=False,
                           decode_window=4)
    p = np.arange(5, dtype=np.int32) % 97
    want = _single_stream(model, p, 6)
    q0 = eng.submit(p, 6, SamplingConfig(max_new_tokens=6, do_sample=True,
                                         top_k=1, temperature=0.8))
    q1 = eng.submit(p, 6)  # greedy
    for _ in range(8):
        eng.step()
    got0 = collect(q0, timeout=5)
    got1 = collect(q1, timeout=5)
    assert got0 == want
    assert got1 == want


def test_engine_capacity_guard():
    """Prompts >= max_len are rejected; max_tokens is clamped to capacity
    (round-2 advisor finding: silent KV drop past max_len)."""
    import pytest

    model, cfg = _tiny()
    eng = ContinuousEngine(model, slots=2, max_len=32, prompt_bucket=16,
                           kv_dtype=jnp.float32, start_thread=False)
    with pytest.raises(ValueError):
        eng.submit(np.zeros(40, np.int32), 4)
    # 30-token prompt: max_tokens clamped to 2
    q = eng.submit(np.arange(30, dtype=np.int32) % 97, 64)
    for _ in range(12):
        eng.step()
    toks = collect(q, timeout=5)
    assert len(toks) == 2


def test_engine_pipelined_matches_single_stream():
    """pipeline=True (double-buffered windows) must stay token-exact,
    including slot reuse across the in-flight window (gen guard)."""
    model, cfg = _tiny()
    eng = ContinuousEngine(model, slots=2, max_len=64, prompt_bucket=16,
                           kv_dtype=jnp.float32, start_thread=False,
                           decode_window=4, pipeline=True)
    prompts = [
        np.arange(5, dtype=np.int32) % 97,
        (np.arange(9, dtype=np.int32) * 3) % 97,
        (np.arange(3, dtype=np.int32) + 40) % 97,
        (np.arange(7, dtype=np.int32) + 11) % 97,
    ]
    want = [_single_stream(model, p, 6) for p in prompts]
    qs = [eng.submit(p, 6) for p in prompts]  # 4 requests through 2 slots
    for _ in range(24):
        eng.step()
    got = [collect(q, timeout=5) for q in qs]
    assert got == want


def test_engine_quant_kv_matches_single_stream():
    """Serving over a quantized slot cache (int8 + int4): greedy outputs are
    token-exact vs the single-stream path over the same quant cache type
    (per-vector quantization is padding-invariant)."""
    import pytest

    model, cfg = _tiny()
    for kv in ("int8", "int4"):
        prompts = [
            np.arange(5, dtype=np.int32) % 97,
            (np.arange(9, dtype=np.int32) * 3) % 97,
        ]
        want = []
        for p in prompts:
            cache = model.init_cache(1, 64, kv_dtype=kv)
            res, _ = generate(model, p[None, :], cache,
                              SamplingConfig(max_new_tokens=6), bucket=16)
            want.append(res.tokens)
        eng = ContinuousEngine(model, slots=2, max_len=64, prompt_bucket=16,
                               kv_dtype=kv, start_thread=False)
        from mllm_tpu.kv.cache import SlotQuantKVCache

        assert isinstance(eng.cache, SlotQuantKVCache)
        qs = [eng.submit(p, 6) for p in prompts]
        for _ in range(12):
            eng.step()
        got = [collect(q, timeout=5) for q in qs]
        assert got[0] == want[0], (kv, got[0], want[0])
        assert got[1] == want[1], (kv, got[1], want[1])


def test_engine_prefix_cache_exact():
    """Automatic prefix caching: two requests sharing a bucket-aligned
    prefix (system prompt) produce token-identical greedy output to an
    engine without the cache, and the second admission reuses KV rows."""
    model, cfg = _tiny()
    rng = np.random.default_rng(6)
    system = rng.integers(0, 97, 20).astype(np.int32)  # > bucket (16)
    p_a = np.concatenate([system, rng.integers(0, 97, 4).astype(np.int32)])
    p_b = np.concatenate([system, rng.integers(0, 97, 5).astype(np.int32)])
    want_a = _single_stream(model, p_a, 6)
    want_b = _single_stream(model, p_b, 6)

    eng = ContinuousEngine(model, slots=2, max_len=64, prompt_bucket=16,
                           kv_dtype=jnp.float32, start_thread=False,
                           prefix_cache=4)
    qa = eng.submit(p_a, 6)
    for _ in range(10):
        eng.step()
    qb = eng.submit(p_b, 6)
    for _ in range(10):
        eng.step()
    assert collect(qa, timeout=5) == want_a
    assert collect(qb, timeout=5) == want_b
    assert eng.prefix_hits == 1
    assert eng.prefix_tokens_reused == 16  # bucket-aligned share of 20


def test_engine_prefix_cache_quant_kv():
    """Prefix reuse composes with the quantized serving cache (int8 slot
    cache -> quant small caches get sliced/padded/reinstalled)."""
    model, cfg = _tiny()
    rng = np.random.default_rng(8)
    system = rng.integers(0, 97, 18).astype(np.int32)
    p_a = np.concatenate([system, rng.integers(0, 97, 3).astype(np.int32)])
    p_b = np.concatenate([system, rng.integers(0, 97, 6).astype(np.int32)])

    def run(prefix_cache):
        eng = ContinuousEngine(model, slots=2, max_len=64, prompt_bucket=16,
                               kv_dtype="int8", start_thread=False,
                               prefix_cache=prefix_cache)
        qa = eng.submit(p_a, 6)
        for _ in range(10):
            eng.step()
        qb = eng.submit(p_b, 6)
        for _ in range(10):
            eng.step()
        return collect(qa, timeout=5), collect(qb, timeout=5), eng

    a0, b0, _ = run(0)
    a1, b1, eng = run(4)
    assert a1 == a0
    assert b1 == b0
    assert eng.prefix_hits == 1 and eng.prefix_tokens_reused == 16


def test_engine_stress_randomized_load():
    """Randomized serving load: 12 greedy requests with random lengths and
    budgets, submitted at random times over 3 slots with prefix caching on
    — every stream must be token-exact vs its single-stream run."""
    model, cfg = _tiny()
    rng = np.random.default_rng(13)
    shared = rng.integers(0, 97, 20).astype(np.int32)  # some share a prefix
    prompts, budgets = [], []
    for i in range(12):
        if i % 3 == 0:
            p = np.concatenate([shared, rng.integers(0, 97, rng.integers(1, 6))])
        else:
            p = rng.integers(0, 97, rng.integers(2, 30))
        prompts.append(p.astype(np.int32))
        budgets.append(int(rng.integers(1, 10)))
    want = [_single_stream(model, p, b) for p, b in zip(prompts, budgets)]

    eng = ContinuousEngine(model, slots=3, max_len=64, prompt_bucket=16,
                           kv_dtype=jnp.float32, start_thread=False,
                           prefix_cache=4, decode_window=4, pipeline=True)
    qs, nxt = [], 0
    for step in range(200):
        if nxt < len(prompts) and rng.random() < 0.5:
            qs.append(eng.submit(prompts[nxt], budgets[nxt]))
            nxt += 1
        eng.step()
        if nxt == len(prompts) and all(r is None for r in eng.req) \
                and eng._inflight is None and eng.pending.empty():
            break
    got = [collect(q, timeout=5) for q in qs]
    assert got == want
    assert eng.prefix_hits >= 2  # the shared-prefix group actually reused


def test_paged_kv_cache_exactness():
    """PagedKVCache (block tables over a shared pool) is token-exact vs the
    dense SlotKVCache under interleaved serving, including prefix caching
    and slot reuse through the block allocator."""
    model, cfg = _tiny()
    rng = np.random.default_rng(17)
    prompts = [rng.integers(0, 97, rng.integers(2, 30)).astype(np.int32)
               for _ in range(6)]
    budgets = [int(rng.integers(2, 8)) for _ in range(6)]
    want = [_single_stream(model, p, b) for p, b in zip(prompts, budgets)]

    eng = ContinuousEngine(model, slots=2, max_len=64, prompt_bucket=16,
                           kv_dtype=jnp.float32, start_thread=False,
                           paged=64, decode_window=4)
    from mllm_tpu.kv.cache import PagedKVCache

    assert isinstance(eng.cache, PagedKVCache)
    qs = [eng.submit(p, b) for p, b in zip(prompts, budgets)]
    for _ in range(80):
        eng.step()
    got = [collect(q, timeout=5) for q in qs]
    assert got == want


def test_paged_pool_exhaustion_requeues():
    """When the block pool is too small for all pending requests, admission
    requeues instead of corrupting; everything completes as slots retire
    and their blocks return to the pool."""
    model, cfg = _tiny()
    rng = np.random.default_rng(19)
    prompts = [rng.integers(0, 97, 5).astype(np.int32) for _ in range(4)]
    want = [_single_stream(model, p, 4) for p in prompts]
    from mllm_tpu.kv.cache import PagedKVCache

    # pool of 2 blocks: exactly ONE request in flight at a time
    eng = ContinuousEngine(model, slots=2, max_len=2 * PagedKVCache.BS,
                           prompt_bucket=16, kv_dtype=jnp.float32,
                           start_thread=False, paged=2, decode_window=4)
    qs = [eng.submit(p, 4) for p in prompts]
    for _ in range(120):
        eng.step()
        if all(r is None for r in eng.req) and eng.pending.empty() \
                and eng._inflight is None:
            break
    got = [collect(q, timeout=5) for q in qs]
    assert got == want
