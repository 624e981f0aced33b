"""Generation-state persistence: save/load round trip and resumed decode
token-identity (aux subsystem beyond the reference's weights-only story)."""

import numpy as np
import jax
import jax.numpy as jnp

from mllm_tpu.core.config import TextConfig
from mllm_tpu.generation.generate import _decode_step, _prefill
from mllm_tpu.generation.sampling import greedy
from mllm_tpu.kv.cache import QuantKVCache, SlotKVCache
from mllm_tpu.kv.persist import load_cache, save_cache
from mllm_tpu.models.transformer import CausalLM


def _tiny():
    cfg = TextConfig(vocab_size=96, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=128,
                     eos_token_id=-5)
    return CausalLM.init(jax.random.PRNGKey(5), cfg), cfg


def test_resume_is_token_identical(tmp_path):
    model, cfg = _tiny()
    ids = jnp.asarray(np.arange(8, dtype=np.int32)[None, :] % 96)

    # uninterrupted: prefill + 6 greedy tokens
    cache = model.init_cache(1, 32, jnp.bfloat16)
    logits, cache = _prefill(model, cache, ids, 8)
    toks = [int(greedy(logits)[0])]
    for _ in range(5):
        logits, cache = _decode_step(model, cache, jnp.asarray([toks[-1]], jnp.int32))
        toks.append(int(greedy(logits)[0]))

    # interrupted after 3 tokens, snapshot, restore, continue
    cache2 = model.init_cache(1, 32, jnp.bfloat16)
    logits, cache2 = _prefill(model, cache2, ids, 8)
    t2 = [int(greedy(logits)[0])]
    for _ in range(2):
        logits, cache2 = _decode_step(model, cache2, jnp.asarray([t2[-1]], jnp.int32))
        t2.append(int(greedy(logits)[0]))
    save_cache(tmp_path / "state.npz", cache2, extra={"tokens": np.asarray(t2)})

    restored, extras = load_cache(tmp_path / "state.npz", extra_keys=("tokens",))
    rt = [int(x) for x in extras["tokens"]]
    assert rt == t2
    assert restored.k.dtype == jnp.bfloat16
    for _ in range(3):
        logits, restored = _decode_step(model, restored, jnp.asarray([rt[-1]], jnp.int32))
        rt.append(int(greedy(logits)[0]))
    assert rt == toks


def test_roundtrip_quant_and_slot_caches(tmp_path):
    q = QuantKVCache.init(2, 1, 32, 2, 16)
    q = q.advance(7)
    save_cache(tmp_path / "q.npz", q)
    rq, _ = load_cache(tmp_path / "q.npz")
    assert isinstance(rq, QuantKVCache)
    assert int(rq.pos) == 7
    np.testing.assert_array_equal(np.asarray(rq.k_scale), np.asarray(q.k_scale))

    s = SlotKVCache.init(2, 4, 32, 2, 16)
    s = s.advance(jnp.asarray([1, 2, 3, 4], jnp.int32))
    save_cache(tmp_path / "s.npz", s)
    rs, _ = load_cache(tmp_path / "s.npz")
    assert isinstance(rs, SlotKVCache)
    np.testing.assert_array_equal(np.asarray(rs.pos), [1, 2, 3, 4])
