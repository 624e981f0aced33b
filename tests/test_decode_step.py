"""Whole-trunk decode megakernel (ops/decode_step.py) vs the int4 base model.

The kernel and the oracle share one set of quantized values
(MegaDecodeLM.from_float), so differences are purely kernel-math
(bf16 dot operands, f32 group partial sums) — tolerances are tight.
Runs the real kernel body in pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mllm_tpu.core.config import TextConfig
from mllm_tpu.models.megadecode import MegaDecodeLM
from mllm_tpu.models.transformer import CausalLM

CFG = TextConfig(
    vocab_size=512,
    hidden_size=512,
    intermediate_size=512,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=128,
    max_position_embeddings=256,
    attention_bias=True,
    tie_word_embeddings=True,
    model_type="qwen2",
)


@pytest.fixture(scope="module")
def mega():
    model = CausalLM.init(jax.random.PRNGKey(0), CFG).stack()
    return MegaDecodeLM.from_float(model, interpret=True)


def _prefill(model, ids, cache):
    logits, cache = model(ids, cache, last_only=True)
    return logits, cache


def test_single_decode_step_matches_base(mega):
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 512, (1, 9)))
    cache0 = mega.init_cache(1, 256)
    _, cache = _prefill(mega.base, ids, cache0)

    tok = jnp.asarray([[7]])
    logits_base, cache_b = mega.base(tok, cache, last_only=True)
    logits_mega, cache_m = mega(tok, cache, last_only=True)

    lb = np.asarray(logits_base[0, 0], np.float32)
    lm = np.asarray(logits_mega[0, 0], np.float32)
    # same quantized values; kernel uses bf16 dot operands -> small drift
    np.testing.assert_allclose(lm, lb, rtol=0.05, atol=0.05)
    assert int(np.argmax(lm)) == int(np.argmax(lb))

    # cache updated identically (roped K written at pos)
    kb = np.asarray(cache_b.k[:, 0, :, 9, :], np.float32)
    km = np.asarray(cache_m.k[:, 0, :, 9, :], np.float32)
    np.testing.assert_allclose(km, kb, rtol=0.05, atol=0.05)
    assert int(cache_m.pos) == int(cache_b.pos) == 10


def test_multi_step_greedy_parity(mega):
    ids = jnp.asarray(np.random.RandomState(1).randint(0, 512, (1, 5)))
    cache0 = mega.init_cache(1, 256)

    logits, cache_b = _prefill(mega.base, ids, cache0)
    _, cache_m = _prefill(mega.base, ids, mega.init_cache(1, 256))
    tok_b = tok_m = jnp.argmax(logits, axis=-1)

    toks_b, toks_m = [], []
    for _ in range(4):
        lb, cache_b = mega.base(tok_b, cache_b, last_only=True)
        lm, cache_m = mega(tok_m, cache_m, last_only=True)
        tok_b = jnp.argmax(lb[:, -1], axis=-1)[None]
        tok_m = jnp.argmax(lm[:, -1], axis=-1)[None]
        toks_b.append(int(tok_b[0, 0]) if tok_b.ndim == 2 else int(tok_b[0]))
        toks_m.append(int(tok_m[0, 0]) if tok_m.ndim == 2 else int(tok_m[0]))
    assert toks_b == toks_m


def test_empty_cache_first_token(mega):
    """pos=0: the online softmax sees only the current token."""
    cache = mega.init_cache(1, 256)
    tok = jnp.asarray([[3]])
    lb, _ = mega.base(tok, cache, last_only=True)
    lm, cm = mega(tok, cache, last_only=True)
    np.testing.assert_allclose(
        np.asarray(lm[0, 0]), np.asarray(lb[0, 0]), rtol=0.05, atol=0.05)
    assert int(cm.pos) == 1


def test_batched_decode_step_matches_base(mega):
    """b=3 slots, lockstep positions: batched kernel == base model."""
    b = 3
    rs = np.random.RandomState(2)
    ids = jnp.asarray(rs.randint(0, 512, (b, 7)))
    cache0 = mega.init_cache(b, 256)
    _, cache = _prefill(mega.base, ids, cache0)

    tok = jnp.asarray(rs.randint(0, 512, (b, 1)))
    logits_base, cache_b = mega.base(tok, cache, last_only=True)
    logits_mega, cache_m = mega(tok, cache, last_only=True)

    lb = np.asarray(logits_base[:, 0], np.float32)
    lm = np.asarray(logits_mega[:, 0], np.float32)
    np.testing.assert_allclose(lm, lb, rtol=0.05, atol=0.05)
    assert list(np.argmax(lm, -1)) == list(np.argmax(lb, -1))

    kb = np.asarray(cache_b.k[:, :, :, 7, :], np.float32)
    km = np.asarray(cache_m.k[:, :, :, 7, :], np.float32)
    np.testing.assert_allclose(km, kb, rtol=0.05, atol=0.05)
    vb = np.asarray(cache_b.v[:, :, :, 7, :], np.float32)
    vm = np.asarray(cache_m.v[:, :, :, 7, :], np.float32)
    np.testing.assert_allclose(vm, vb, rtol=0.05, atol=0.05)
    assert int(cache_m.pos) == int(cache_b.pos) == 8


def test_batched_multi_step_greedy_parity(mega):
    """b=2, several steps: greedy tokens identical kernel vs base."""
    b = 2
    rs = np.random.RandomState(3)
    ids = jnp.asarray(rs.randint(0, 512, (b, 5)))
    logits, cache_b = _prefill(mega.base, ids, mega.init_cache(b, 256))
    _, cache_m = _prefill(mega.base, ids, mega.init_cache(b, 256))
    tok_b = tok_m = jnp.argmax(logits, axis=-1)

    for _ in range(3):
        lb, cache_b = mega.base(tok_b, cache_b, last_only=True)
        lm, cache_m = mega(tok_m, cache_m, last_only=True)
        tok_b = jnp.argmax(lb[:, -1:], axis=-1)
        tok_m = jnp.argmax(lm[:, -1:], axis=-1)
        assert np.asarray(tok_b).tolist() == np.asarray(tok_m).tolist()


def test_batched_empty_cache_first_token(mega):
    b = 4
    cache = mega.init_cache(b, 256)
    tok = jnp.asarray(np.arange(b)[:, None] + 3)
    lb, _ = mega.base(tok, cache, last_only=True)
    lm, cm = mega(tok, cache, last_only=True)
    np.testing.assert_allclose(
        np.asarray(lm[:, 0], np.float32), np.asarray(lb[:, 0], np.float32),
        rtol=0.05, atol=0.05)
    assert int(cm.pos) == 1


def test_unsupported_configs_raise():
    bad = TextConfig(vocab_size=64, hidden_size=256, intermediate_size=256,
                     num_hidden_layers=1, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=64,
                     max_position_embeddings=64)
    model = CausalLM.init(jax.random.PRNGKey(0), bad).stack()
    with pytest.raises(ValueError, match="head_dim"):
        MegaDecodeLM.from_float(model)


def test_per_slot_megakernel_matches_base(mega):
    """SlotKVCache (continuous batching) decode: per-slot positions ride the
    batched megakernel and match the base model (the engine's decode window
    now streams the int4 trunk once per step instead of ~57 launches)."""
    from mllm_tpu.kv.cache import SlotKVCache

    b, plens = 3, [5, 9, 7]
    rs = np.random.RandomState(4)
    sc = SlotKVCache.init(CFG.num_hidden_layers, b, 256,
                          CFG.num_key_value_heads, 128, jnp.bfloat16)
    k, v = sc.k, sc.v
    for s, pl in enumerate(plens):
        ids = jnp.asarray(rs.randint(0, 512, (1, pl)))
        _, c1 = _prefill(mega.base, ids, mega.init_cache(1, 256))
        k = k.at[:, s, :, :pl, :].set(c1.k[:, 0, :, :pl, :])
        v = v.at[:, s, :, :pl, :].set(c1.v[:, 0, :, :pl, :])
    sc = SlotKVCache(k, v, jnp.asarray(np.asarray(plens, np.int32)))

    tok = jnp.asarray(rs.randint(0, 512, (b, 1)))
    lb, cb = mega.base(tok, sc, last_only=True)
    lm, cm = mega(tok, sc, last_only=True)
    assert type(cm) is SlotKVCache
    np.testing.assert_allclose(np.asarray(lm[:, 0], np.float32),
                               np.asarray(lb[:, 0], np.float32),
                               rtol=0.05, atol=0.05)
    assert (np.argmax(np.asarray(lm[:, 0], np.float32), -1).tolist()
            == np.argmax(np.asarray(lb[:, 0], np.float32), -1).tolist())
    for s, pl in enumerate(plens):
        np.testing.assert_allclose(
            np.asarray(cm.k[:, s, :, pl, :], np.float32),
            np.asarray(cb.k[:, s, :, pl, :], np.float32), rtol=0.05, atol=0.05)
        np.testing.assert_allclose(
            np.asarray(cm.v[:, s, :, pl, :], np.float32),
            np.asarray(cb.v[:, s, :, pl, :], np.float32), rtol=0.05, atol=0.05)
    assert np.asarray(cm.pos).tolist() == [p + 1 for p in plens]


def test_grouped_attention_multiblock_chain(mega):
    """b=4 (slot group gs=4) with VERY different per-slot lengths and
    block_k=128: exercises the cross-group DMA prefetch chain with nb > 1
    and the global-max block count's masking for short slots."""
    import jax.numpy as jnp

    from mllm_tpu.kv.cache import SlotKVCache
    from mllm_tpu.ops.decode_step import fused_decode_step_batched

    b, plens = 4, [5, 200, 130, 70]
    rs = np.random.RandomState(5)
    sc = SlotKVCache.init(CFG.num_hidden_layers, b, 256,
                          CFG.num_key_value_heads, 128, jnp.bfloat16)
    k, v = sc.k, sc.v
    for s, pl in enumerate(plens):
        ids = jnp.asarray(rs.randint(0, 512, (1, pl)))
        _, c1 = _prefill(mega.base, ids, mega.init_cache(1, 256))
        k = k.at[:, s, :, :pl, :].set(c1.k[:, 0, :, :pl, :])
        v = v.at[:, s, :, :pl, :].set(c1.v[:, 0, :, :pl, :])
    sc = SlotKVCache(k, v, jnp.asarray(np.asarray(plens, np.int32)))

    tok = jnp.asarray(rs.randint(0, 512, (b, 1)))
    lb, _ = mega.base(tok, sc, last_only=True)

    cfg = mega.cfg
    x = mega.base.embed_tokens(tok)
    pos_vec = jnp.asarray(np.asarray(plens, np.int32))
    sin = jnp.take(mega.base.rope.sin, pos_vec, axis=0)
    cos = jnp.take(mega.base.rope.cos, pos_vec, axis=0)
    y, k_new, v_new = fused_decode_step_batched(
        x[:, 0, :], pos_vec, sin, cos, mega.qkv_ops, mega.o_ops,
        mega.gate_ops, mega.up_ops, mega.down_ops, mega.norm1_w,
        mega.norm2_w, sc.k, sc.v,
        n_heads=cfg.num_attention_heads, n_kv_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim_, act=cfg.hidden_act, eps=cfg.rms_norm_eps,
        block_f=mega.block_f, group_a=mega.group_a,
        block_k=128, slot_group=4, interpret=True)
    hidden = mega.base.norm(y[:, None].astype(x.dtype))
    lm = mega.base.logits(hidden)
    np.testing.assert_allclose(np.asarray(lm[:, 0], np.float32),
                               np.asarray(lb[:, 0], np.float32),
                               rtol=0.05, atol=0.05)
    assert (np.argmax(np.asarray(lm[:, 0], np.float32), -1).tolist()
            == np.argmax(np.asarray(lb[:, 0], np.float32), -1).tolist())
