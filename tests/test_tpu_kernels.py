"""Pallas kernels vs XLA oracle — require real TPU hardware.

Run with: MLLM_RUN_TPU_TESTS=1 pytest tests/test_tpu_kernels.py
(remote compiles take ~30 s per new kernel shape).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mllm_tpu.core import dtypes as dt
from mllm_tpu.nn.attention import sdpa

pytestmark = pytest.mark.tpu


@pytest.fixture(autouse=True)
def _on_tpu_device(monkeypatch):
    """Override the conftest CPU pin — these tests target the real chip."""
    monkeypatch.delenv("MLLM_FORCE_XLA", raising=False)
    tpu = [d for d in jax.devices() if d.platform == "tpu"]
    if not tpu:
        pytest.skip("no TPU device")
    prev = jax.config.jax_default_device
    jax.config.update("jax_default_device", tpu[0])
    yield
    jax.config.update("jax_default_device", prev)


def test_flash_attention_causal():
    from mllm_tpu.ops.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    B, SQ, H, HKV, D, SKV = 1, 256, 8, 2, 128, 512
    q = jax.random.normal(key, (B, SQ, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, SKV, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, SKV, D), jnp.float32)
    ref = sdpa(q, k, v, q_offset=0, kv_valid_len=256, causal=True)
    out = flash_attention(q, k, v, q_offset=0, kv_valid_len=256, causal=True)
    assert float(jnp.max(jnp.abs(ref - out))) < 2e-2

    # chunked prefill offset + sliding window
    ref2 = sdpa(q[:, :128], k, v, q_offset=128, kv_valid_len=256, causal=True, window=64)
    out2 = flash_attention(q[:, :128], k, v, q_offset=128, kv_valid_len=256, causal=True, window=64)
    assert float(jnp.max(jnp.abs(ref2 - out2))) < 2e-2


def test_decode_attention():
    from mllm_tpu.ops.decode_attention import decode_attention

    B, H, HKV, D, SKV = 1, 8, 2, 128, 512
    q = jax.random.normal(jax.random.PRNGKey(0), (B, 1, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, HKV, SKV, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, HKV, SKV, D), jnp.float32)
    ref = sdpa(q, k, v, q_offset=300, kv_valid_len=301, causal=False)
    out = decode_attention(q, k, v, kv_valid_len=301)
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-2


def test_int8_matmul_kernel():
    from mllm_tpu.ops.quant_matmul import int8_matmul, repack_float_to_int8

    M, K, N = 8, 1024, 512
    x = np.random.default_rng(0).standard_normal((M, K)).astype(np.float32)
    qt, sc = repack_float_to_int8(np.random.default_rng(1).standard_normal((N, K)).astype(np.float32))
    ref = x @ (qt.astype(np.float32) * sc[None, :])
    out = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(qt), jnp.asarray(sc)))
    rel = np.max(np.abs(ref - out)) / np.max(np.abs(ref))
    assert rel < 1e-2


def test_int4_matmul_kernel():
    from mllm_tpu.ops.quant_matmul import (
        int4_matmul, prepare_int4, repack_q4_0, repack_q4_k)

    M, K, N = 8, 1024, 512
    rng = np.random.default_rng(2)
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.standard_normal((N, K)).astype(np.float32)
    raw = dt.quant_q4_0(w)
    pc, sc, zc = prepare_int4(*repack_q4_0(raw.reshape(N, -1), N, K))
    wd = dt.dequant_q4_0(raw, N * K).reshape(N, K)
    out = np.asarray(int4_matmul(jnp.asarray(x), jnp.asarray(pc), jnp.asarray(sc), 32,
                                 jnp.asarray(zc)))
    rel = np.max(np.abs(x @ wd.T - out)) / np.max(np.abs(x @ wd.T))
    assert rel < 1e-2

    raw_k = dt.quant_q4_k(w)
    p4, s4, z4 = repack_q4_k(raw_k.reshape(N, -1), N, K)
    p4, s4, z4 = prepare_int4(p4, s4, 32, z4)
    wd_k = dt.dequant_q4_k(raw_k, N * K).reshape(N, K)
    out4k = np.asarray(int4_matmul(jnp.asarray(x), jnp.asarray(p4), jnp.asarray(s4), 32, jnp.asarray(z4)))
    rel = np.max(np.abs(x @ wd_k.T - out4k)) / np.max(np.abs(x @ wd_k.T))
    assert rel < 1e-2


def test_decode_attention_ragged_kv_start():
    from mllm_tpu.ops.decode_attention import decode_attention

    B, H, HKV, D, SKV = 2, 8, 2, 128, 512
    q = jax.random.normal(jax.random.PRNGKey(3), (B, 1, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (B, HKV, SKV, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(5), (B, HKV, SKV, D), jnp.float32)
    starts = jnp.asarray([0, 64], jnp.int32)
    ref = sdpa(q, k, v, q_offset=200, kv_valid_len=201, kv_start=starts, causal=False)
    out = decode_attention(q, k, v, kv_valid_len=201, kv_start=starts)
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-2


def test_flash_attention_ragged_kv_start():
    from mllm_tpu.ops.flash_attention import flash_attention

    B, SQ, H, HKV, D, SKV = 2, 128, 4, 2, 128, 256
    q = jax.random.normal(jax.random.PRNGKey(6), (B, SQ, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(7), (B, HKV, SKV, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(8), (B, HKV, SKV, D), jnp.float32)
    starts = jnp.asarray([0, 40], jnp.int32)
    ref = sdpa(q, k, v, q_offset=0, kv_valid_len=128, kv_start=starts, causal=True)
    out = flash_attention(q, k, v, q_offset=0, kv_valid_len=128, kv_start=starts, causal=True)
    # compare only non-pad rows (fully-masked pad rows have undefined output)
    assert float(jnp.max(jnp.abs(ref[0] - out[0]))) < 2e-2
    assert float(jnp.max(jnp.abs(ref[1, 40:128] - out[1, 40:128]))) < 2e-2


def test_padded_head_vision_attention():
    """attend_padded_head (ViT head dims like 80, odd seq lens) vs sdpa."""
    from mllm_tpu.nn.attention import attend_padded_head, sdpa

    B, S, H, D = 1, 1564, 16, 80  # qwen2-vl vision shape (odd seq, 80-dim heads)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, S, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, S, D), jnp.float32)
    ref = sdpa(q, k, v, causal=False)
    out = attend_padded_head(q, k, v, causal=False)
    assert out.shape == ref.shape
    assert float(jnp.max(jnp.abs(ref - out))) < 2e-2


def test_int4_matmul_kernel_qwen2_downproj_geometry():
    """K=8960 (khalf=4480): regression for the hi-nibble slab mis-index when
    block_j didn't divide khalf (ADVICE r1, high)."""
    from mllm_tpu.ops.quant_matmul import int4_matmul, repack_float_to_int4

    M, K, N = 8, 8960, 256
    rng = np.random.default_rng(3)
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.standard_normal((N, K)).astype(np.float32)
    packed, scales = repack_float_to_int4(w, 32)
    from mllm_tpu.ops.quant_matmul import dequant_int4, prepare_int4
    wd = np.asarray(dequant_int4(jnp.asarray(packed), jnp.asarray(scales), 32))
    ref = x @ wd
    pc, sc, zc = prepare_int4(packed, scales, 32)
    out = np.asarray(int4_matmul(jnp.asarray(x), jnp.asarray(pc), jnp.asarray(sc), 32,
                                 jnp.asarray(zc)))
    rel = np.max(np.abs(ref - out)) / np.max(np.abs(ref))
    assert rel < 1e-2


def test_decode_attention_partial_final_block_tpu():
    """s_max not a multiple of block_k on hardware (clamped final DMA)."""
    from mllm_tpu.ops.decode_attention import decode_attention

    B, H, HKV, D, SKV = 2, 8, 2, 128, 640
    q = jax.random.normal(jax.random.PRNGKey(3), (B, 1, H, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (B, HKV, SKV, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(5), (B, HKV, SKV, D), jnp.float32)
    ref = sdpa(q, k, v, q_offset=599, kv_valid_len=600, causal=False)
    out = decode_attention(q, k, v, kv_valid_len=600, block_k=512)
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-2


def test_decode_attention_quant_tpu():
    """Fused int8-KV decode kernel on hardware vs sdpa over dequantized KV."""
    from mllm_tpu.kv.cache import QuantKVCache
    from mllm_tpu.ops.decode_attention import decode_attention_quant

    B, H, HKV, D, SKV = 2, 8, 2, 128, 2048
    q = jax.random.normal(jax.random.PRNGKey(0), (B, 1, H, D), jnp.float32)
    kf = jax.random.normal(jax.random.PRNGKey(1), (B, SKV, HKV, D), jnp.float32)
    vf = jax.random.normal(jax.random.PRNGKey(2), (B, SKV, HKV, D), jnp.float32)
    cache = QuantKVCache.init(1, B, SKV, HKV, D)
    cache = cache.update_layer(0, kf, vf).advance(SKV)
    kd, vd = cache.layer(0)
    ref = sdpa(q, kd.astype(jnp.float32), vd.astype(jnp.float32),
               q_offset=1500, kv_valid_len=1501, causal=False)
    out = decode_attention_quant(
        q, cache.k[0], cache.v[0], cache.k_scale[0], cache.v_scale[0],
        kv_valid_len=1501)
    assert float(jnp.max(jnp.abs(ref - out))) < 2e-2


def test_flash_attention_quant_tpu():
    """int8-KV flash PREFILL kernel on hardware vs sdpa over dequantized KV
    (Sage prefill counterpart)."""
    from mllm_tpu.kv.cache import QuantKVCache
    from mllm_tpu.ops.flash_attention import flash_attention_quant

    B, SQ, H, HKV, D, SKV = 2, 256, 8, 2, 128, 1024
    q = jax.random.normal(jax.random.PRNGKey(0), (B, SQ, H, D), jnp.float32)
    kf = jax.random.normal(jax.random.PRNGKey(1), (B, SKV, HKV, D), jnp.float32)
    vf = jax.random.normal(jax.random.PRNGKey(2), (B, SKV, HKV, D), jnp.float32)
    cache = QuantKVCache.init(1, B, SKV, HKV, D)
    cache = cache.update_layer(0, kf, vf).advance(SKV)
    kd, vd = cache.layer(0)
    # mid-prefill chunk: q_offset 512, valid = 768
    ref = sdpa(q, kd.astype(jnp.float32), vd.astype(jnp.float32),
               q_offset=512, kv_valid_len=768, causal=True)
    out = flash_attention_quant(
        q, cache.k[0], cache.v[0], cache.k_scale[0], cache.v_scale[0],
        q_offset=512, kv_valid_len=768, causal=True)
    assert float(jnp.max(jnp.abs(ref - out))) < 2e-2
