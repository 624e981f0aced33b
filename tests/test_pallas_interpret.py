"""Pallas kernels in interpreter mode — runs in the default (CPU) suite.

Closes the "green suite never executes a Pallas kernel" gap: the same kernel
bodies that run on the chip are executed here via pallas interpret mode
against the XLA/numpy oracles.  Hardware-compiled parity stays in
tests/test_tpu_kernels.py (MLLM_RUN_TPU_TESTS=1).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mllm_tpu.nn.attention import sdpa


def test_flash_attention_interpret_causal_window():
    from mllm_tpu.ops.flash_attention import flash_attention

    B, SQ, H, HKV, D, SKV = 1, 128, 4, 2, 64, 256
    q = jax.random.normal(jax.random.PRNGKey(0), (B, SQ, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, SKV, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, SKV, D), jnp.float32)
    ref = sdpa(q, k, v, q_offset=0, kv_valid_len=SQ, causal=True)
    out = flash_attention(q, k, v, q_offset=0, kv_valid_len=SQ, causal=True,
                          block_q=128, block_k=128, interpret=True)
    assert float(jnp.max(jnp.abs(ref - out))) < 2e-2

    # chunked-prefill offset + sliding window in one go
    ref2 = sdpa(q[:, :128], k, v, q_offset=128, kv_valid_len=SKV, causal=True, window=64)
    out2 = flash_attention(q[:, :128], k, v, q_offset=128, kv_valid_len=SKV,
                           causal=True, window=64, block_q=128, block_k=128,
                           interpret=True)
    assert float(jnp.max(jnp.abs(ref2 - out2))) < 2e-2


def test_decode_attention_interpret():
    from mllm_tpu.ops.decode_attention import decode_attention

    B, H, HKV, D, S = 2, 4, 2, 64, 512
    q = jax.random.normal(jax.random.PRNGKey(0), (B, 1, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    valid = 300
    ref = sdpa(q, k, v, q_offset=valid - 1, kv_valid_len=valid, causal=True)
    out = decode_attention(q, k, v, kv_valid_len=jnp.int32(valid), block_k=256,
                           interpret=True)
    assert float(jnp.max(jnp.abs(ref - out))) < 2e-2


def test_int8_matmul_interpret():
    from mllm_tpu.ops.quant_matmul import int8_matmul, repack_float_to_int8

    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 512), dtype=np.float32) * 0.05  # [N, K]
    x = jnp.asarray(rng.standard_normal((8, 512), dtype=np.float32))
    qv, sc = repack_float_to_int8(w)
    ref = int8_matmul(x, jnp.asarray(qv), jnp.asarray(sc))  # portable path
    out = int8_matmul(x.astype(jnp.bfloat16), jnp.asarray(qv), jnp.asarray(sc),
                      block_m=8, block_n=256, block_k=256, interpret=True)
    rel = float(jnp.max(jnp.abs(ref - out)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert rel < 2e-2


def test_int4_matmul_interpret_sym_and_asym():
    from mllm_tpu.ops.quant_matmul import (
        dequant_int4, int4_matmul, prepare_int4, repack_float_to_int4, repack_q4_k)
    from mllm_tpu.core import dtypes as dt

    rng = np.random.default_rng(1)
    N, K = 256, 1024
    w = rng.standard_normal((N, K), dtype=np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((8, K), dtype=np.float32))

    p, s = repack_float_to_int4(w, 32)
    ref = x @ dequant_int4(jnp.asarray(p), jnp.asarray(s), 32)
    pc, sc, zc = prepare_int4(p, s, 32)
    out = int4_matmul(x.astype(jnp.bfloat16), jnp.asarray(pc), jnp.asarray(sc), 32,
                      jnp.asarray(zc), block_m=8, block_n=256, interpret=True)
    rel = float(jnp.max(jnp.abs(ref - out)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert rel < 2e-2

    # asymmetric path through a real ggml Q4_K container
    raw = dt.quant_q4_k(w.reshape(-1)).reshape(N, -1)
    p4, s4, z4 = repack_q4_k(raw.reshape(-1), N, K)
    ref2 = x @ dequant_int4(jnp.asarray(p4), jnp.asarray(s4), 32, jnp.asarray(z4))
    pc4, sc4, zc4 = prepare_int4(p4, s4, 32, z4)
    out2 = int4_matmul(x.astype(jnp.bfloat16), jnp.asarray(pc4), jnp.asarray(sc4), 32,
                       jnp.asarray(zc4), block_m=8, block_n=256, interpret=True)
    rel2 = float(jnp.max(jnp.abs(ref2 - out2)) / (jnp.max(jnp.abs(ref2)) + 1e-9))
    assert rel2 < 2e-2

    # padded canonical shape (khalf with no 256-mult divisor) in kernel mode
    K2 = 1088  # khalf=544 -> padded to 768
    w2 = rng.standard_normal((N, K2), dtype=np.float32) * 0.05
    x2 = jnp.asarray(rng.standard_normal((8, K2), dtype=np.float32))
    p2, s2 = repack_float_to_int4(w2, 32)
    ref3 = x2 @ dequant_int4(jnp.asarray(p2), jnp.asarray(s2), 32)
    pc2, sc2, zc2 = prepare_int4(p2, s2, 32)
    out3 = int4_matmul(x2.astype(jnp.bfloat16), jnp.asarray(pc2), jnp.asarray(sc2), 32,
                       jnp.asarray(zc2), block_m=8, block_n=256, interpret=True)
    rel3 = float(jnp.max(jnp.abs(ref3 - out3)) / (jnp.max(jnp.abs(ref3)) + 1e-9))
    assert rel3 < 2e-2


def test_decode_attention_interpret_per_sequence_valid():
    """Per-slot valid lengths (continuous batching): each sequence early-exits
    and masks at its own length."""
    from mllm_tpu.ops.decode_attention import decode_attention

    B, H, HKV, D, S = 3, 4, 2, 64, 512
    q = jax.random.normal(jax.random.PRNGKey(0), (B, 1, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, S, D), jnp.float32)
    valids = jnp.asarray([64, 300, 512], jnp.int32)
    out = decode_attention(q, k, v, kv_valid_len=valids, block_k=256, interpret=True)
    for i, vl in enumerate([64, 300, 512]):
        ref = sdpa(q[i:i + 1], k[i:i + 1], v[i:i + 1], q_offset=vl - 1,
                   kv_valid_len=vl, causal=True)
        assert float(jnp.max(jnp.abs(ref - out[i:i + 1]))) < 2e-2, f"seq {i}"


def test_flash_attention_quant_interpret():
    """int8-KV flash prefill (Sage prefill counterpart): kernel output matches
    sdpa over the dequantized cache — the quantization error lives in the
    inputs, so with identical dequant the kernel must agree tightly."""
    from mllm_tpu.kv.cache import QuantKVCache
    from mllm_tpu.ops.flash_attention import flash_attention_quant

    B, SQ, H, HKV, D, SKV = 2, 128, 4, 2, 128, 256
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, SQ, H, D)).astype(np.float32))
    kf = rng.standard_normal((B, HKV, SKV, D)).astype(np.float32)
    vf = rng.standard_normal((B, HKV, SKV, D)).astype(np.float32)
    kq, ks = QuantKVCache._quantize(jnp.asarray(kf))
    vq, vs = QuantKVCache._quantize(jnp.asarray(vf))

    kd = kq.astype(jnp.float32) * ks[..., None]
    vd = vq.astype(jnp.float32) * vs[..., None]
    # chunk 2 of a chunked prefill: q_offset=128, full kv valid
    ref = sdpa(q, kd, vd, q_offset=128, kv_valid_len=SKV, causal=True)
    out = flash_attention_quant(
        q, kq, vq, ks, vs, q_offset=128, kv_valid_len=SKV, causal=True,
        block_q=128, block_k=128, interpret=True)
    assert float(jnp.max(jnp.abs(ref - out))) < 3e-2

    # ragged valid length (mid-prefill: only part of the cache valid)
    ref2 = sdpa(q, kd, vd, q_offset=64, kv_valid_len=192, causal=True)
    out2 = flash_attention_quant(
        q, kq, vq, ks, vs, q_offset=64, kv_valid_len=192, causal=True,
        block_q=128, block_k=128, interpret=True)
    assert float(jnp.max(jnp.abs(ref2 - out2))) < 3e-2


def test_decode_attention_paged_interpret():
    """Paged decode kernel: block-table indirection over a shuffled physical
    pool matches dense attention over the logically-contiguous K/V."""
    from mllm_tpu.ops.decode_attention import decode_attention_paged

    B, H, HKV, D, BS, MAXB, NB = 2, 4, 2, 128, 128, 4, 16
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    # logical K/V per slot, then scatter into a shuffled pool
    k_log = rng.standard_normal((B, HKV, MAXB * BS, D)).astype(np.float32)
    v_log = rng.standard_normal((B, HKV, MAXB * BS, D)).astype(np.float32)
    perm = rng.permutation(NB)
    table = np.full((B, MAXB), -1, np.int32)
    pool_k = np.zeros((NB, HKV, BS, D), np.float32)
    pool_v = np.zeros((NB, HKV, BS, D), np.float32)
    valid = np.asarray([300, 130], np.int32)
    pi = 0
    for b in range(B):
        for lb in range(-(-int(valid[b]) // BS)):
            phys = int(perm[pi]); pi += 1
            table[b, lb] = phys
            pool_k[phys] = k_log[b, :, lb * BS : (lb + 1) * BS]
            pool_v[phys] = v_log[b, :, lb * BS : (lb + 1) * BS]

    ref = sdpa(q, jnp.asarray(k_log), jnp.asarray(v_log),
               q_offset=jnp.asarray(valid) - 1, kv_valid_len=jnp.asarray(valid),
               causal=True)
    out = decode_attention_paged(q, jnp.asarray(pool_k), jnp.asarray(pool_v),
                                 jnp.asarray(table),
                                 kv_valid_len=jnp.asarray(valid), interpret=True)
    assert float(jnp.max(jnp.abs(ref - out))) < 2e-2


def test_int4_matmul_interpret_zeros_elided():
    """zeros_p=None (symmetric weights) must match the zeros-carrying call
    exactly — the kernel folds the -8*scale zero term into the scale term
    instead of streaming a separate f32 zeros array."""
    from mllm_tpu.ops.quant_matmul import (int4_matmul, prepare_int4,
                                           repack_float_to_int4)

    rng = np.random.default_rng(7)
    N, K = 256, 1088  # khalf=544 -> kernel pads to 768 (pad region s=0)
    w = rng.standard_normal((N, K), dtype=np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((8, K), dtype=np.float32)).astype(jnp.bfloat16)
    pc, sc, zc = prepare_int4(*repack_float_to_int4(w, 32), group=32)
    ref = int4_matmul(x, jnp.asarray(pc), jnp.asarray(sc), 32, jnp.asarray(zc),
                      block_m=8, block_n=256, interpret=True)
    out = int4_matmul(x, jnp.asarray(pc), jnp.asarray(sc), 32, None,
                      block_m=8, block_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # fallback (m > 32) with elided zeros
    xl = jnp.asarray(rng.standard_normal((40, K), dtype=np.float32)).astype(jnp.bfloat16)
    ref_l = int4_matmul(xl, jnp.asarray(pc), jnp.asarray(sc), 32, jnp.asarray(zc))
    out_l = int4_matmul(xl, jnp.asarray(pc), jnp.asarray(sc), 32, None)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(ref_l),
                               rtol=1e-5, atol=1e-5)
