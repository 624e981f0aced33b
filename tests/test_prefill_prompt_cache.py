"""Chunked prefill + prompt cache + elastic/sparse layers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mllm_tpu.core.config import TextConfig
from mllm_tpu.generation.prefill import PromptCache, chunked_prefill, prefill_with_prompt_cache
from mllm_tpu.models.transformer import CausalLM


@pytest.fixture(scope="module")
def model():
    cfg = TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        eos_token_id=-3, rope_theta=10000.0,
    )
    return CausalLM.init(jax.random.PRNGKey(5), cfg)


def _full_logits(model, ids):
    cache = model.init_cache(1, 128, jnp.float32)
    lg, cache = model(jnp.asarray(ids, jnp.int32), cache, last_only=True)
    return np.asarray(lg)[:, 0], cache


def test_chunked_prefill_matches_full(model):
    ids = np.random.default_rng(0).integers(0, 64, (1, 21)).astype(np.int32)
    ref, _ = _full_logits(model, ids)
    cache = model.init_cache(1, 128, jnp.float32)
    lg, cache = chunked_prefill(model, cache, ids, 21, chunk=8)
    np.testing.assert_allclose(np.asarray(lg), ref, rtol=2e-4, atol=2e-5)
    assert int(cache.pos) == 21
    # exact-multiple case
    ids16 = ids[:, :16]
    ref16, _ = _full_logits(model, ids16)
    cache = model.init_cache(1, 128, jnp.float32)
    lg16, cache = chunked_prefill(model, cache, ids16, 16, chunk=8)
    np.testing.assert_allclose(np.asarray(lg16), ref16, rtol=2e-4, atol=2e-5)


def test_prompt_cache_prefix_reuse(model):
    rng = np.random.default_rng(1)
    prefix = rng.integers(0, 64, 12).astype(np.int32)
    idsA = np.concatenate([prefix, rng.integers(0, 64, 5).astype(np.int32)])[None]
    idsB = np.concatenate([prefix, rng.integers(0, 64, 7).astype(np.int32)])[None]

    pc = PromptCache(max_entries=2)
    cache = model.init_cache(1, 128, jnp.float32)
    lgA, cacheA, matched = prefill_with_prompt_cache(model, cache, idsA, idsA.shape[1], pc, chunk=8)
    assert matched == 0 and len(pc) == 1
    refA, _ = _full_logits(model, idsA)
    np.testing.assert_allclose(np.asarray(lgA), refA, rtol=2e-4, atol=2e-5)

    # B shares the 12-token prefix? the cache stored the FULL idsA — so the
    # longest cached prefix of B is none unless prefixes match; store prefix too
    pc.store(prefix, _snapshot(model, prefix))
    cache = model.init_cache(1, 128, jnp.float32)
    lgB, cacheB, matchedB = prefill_with_prompt_cache(model, cache, idsB, idsB.shape[1], pc, chunk=8)
    assert matchedB == len(prefix)
    refB, _ = _full_logits(model, idsB)
    np.testing.assert_allclose(np.asarray(lgB), refB, rtol=2e-4, atol=2e-5)

    # full-hit path: same prompt again
    cache = model.init_cache(1, 128, jnp.float32)
    lgB2, _, matchedB2 = prefill_with_prompt_cache(model, cache, idsB, idsB.shape[1], pc, chunk=8)
    assert matchedB2 == idsB.shape[1]
    np.testing.assert_allclose(np.asarray(lgB2), refB, rtol=2e-4, atol=2e-5)


def _snapshot(model, prefix):
    cache = model.init_cache(1, 128, jnp.float32)
    _, cache = model(jnp.asarray(prefix[None], jnp.int32), cache, last_only=True)
    return cache


def test_prompt_cache_lru_eviction(model):
    pc = PromptCache(max_entries=2)
    c = model.init_cache(1, 16, jnp.float32)
    pc.store(np.array([1, 2]), c)
    pc.store(np.array([3, 4]), c)
    pc.store(np.array([5, 6]), c)
    assert len(pc) == 2
    hit, n = pc.lookup(np.array([1, 2, 9]))
    assert hit is None and n == 0  # oldest evicted


def test_elastic_linear():
    from mllm_tpu.nn.layers import ElasticLinear

    rng = np.random.default_rng(2)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    el = ElasticLinear(jnp.asarray(w), jnp.asarray(b))
    x = rng.standard_normal((2, 8)).astype(np.float32)
    full = np.asarray(el(jnp.asarray(x)))
    np.testing.assert_allclose(full, x @ w.T + b, rtol=1e-5)
    half = np.asarray(el(jnp.asarray(x), out_ratio=0.5))
    assert half.shape == (2, 8)
    np.testing.assert_allclose(half, (x @ w.T + b)[:, :8], rtol=1e-5)


def test_predictor_sparse_mlp():
    from mllm_tpu.nn.layers import Linear, PredictorSparseMLP

    rng = np.random.default_rng(3)
    d, ff, r = 8, 16, 4
    mk = lambda o, i: Linear(jnp.asarray(rng.standard_normal((o, i)).astype(np.float32)), None)
    mlp = PredictorSparseMLP(
        jnp.asarray(rng.standard_normal((r, d)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((ff, r)).astype(np.float32)),
        mk(ff, d), mk(ff, d), mk(d, ff), act="relu",
    )
    x = jnp.asarray(rng.standard_normal((3, d)).astype(np.float32))
    y = np.asarray(mlp(x))
    assert y.shape == (3, d) and np.isfinite(y).all()
    # masked-out neurons contribute zero: threshold=inf -> all masked -> zero out
    mlp_all_masked = mlp.replace(threshold=1e9)
    np.testing.assert_allclose(np.asarray(mlp_all_masked(x)), 0.0, atol=1e-6)
