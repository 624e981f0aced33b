"""Quantized matmul: repack correctness (vs ggml dequant oracle) and the
XLA fallback path.  Pallas-kernel numerics are covered in test_tpu_kernels."""

import numpy as np
import jax.numpy as jnp

from mllm_tpu.core import dtypes as dt
from mllm_tpu.ops.quant_matmul import (
    dequant_int4,
    dequant_int4_canonical,
    int4_matmul,
    int8_matmul,
    prepare_int4,
    repack_float_to_int4,
    repack_float_to_int8,
    repack_q4_0,
    repack_q4_k,
    repack_q8_0,
)


def _w(n, k, seed=0):
    return np.random.default_rng(seed).standard_normal((n, k)).astype(np.float32)


def test_repack_q4_0_lossless():
    N, K = 8, 256
    w = _w(N, K)
    raw = dt.quant_q4_0(w)
    ggml = dt.dequant_q4_0(raw, N * K).reshape(N, K)
    packed, scales = repack_q4_0(raw.reshape(N, -1), N, K)
    ours = np.asarray(dequant_int4(jnp.asarray(packed), jnp.asarray(scales), 32))  # [K, N]
    np.testing.assert_allclose(ours.T, ggml, rtol=1e-6, atol=1e-6)


def test_repack_q4_k_lossless():
    N, K = 4, 512
    w = _w(N, K, 1)
    raw = dt.quant_q4_k(w)
    ggml = dt.dequant_q4_k(raw, N * K).reshape(N, K)
    p, s, z = repack_q4_k(raw.reshape(N, -1), N, K)
    ours = np.asarray(dequant_int4(jnp.asarray(p), jnp.asarray(s), 32, jnp.asarray(z)))
    np.testing.assert_allclose(ours.T, ggml, rtol=1e-5, atol=1e-5)


def test_repack_q8_0_close():
    N, K = 8, 128
    w = _w(N, K, 2)
    raw = dt.quant_q8_0(w)
    ggml = dt.dequant_q8_0(raw, N * K).reshape(N, K)
    qt, sc = repack_q8_0(raw.reshape(N, -1), N, K)
    ours = qt.astype(np.float32) * sc[None, :]
    rms = np.sqrt(np.mean((ours.T - ggml) ** 2)) / np.sqrt(np.mean(ggml**2))
    assert rms < 0.01


def test_int8_matmul_fallback():
    M, K, N = 4, 64, 32
    x = _w(M, K, 3)
    qt, sc = repack_float_to_int8(_w(N, K, 4))
    out = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(qt), jnp.asarray(sc)))
    ref = x @ (qt.astype(np.float32) * sc[None, :])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_int4_matmul_fallback():
    M, K, N = 4, 128, 32
    x = _w(M, K, 5)
    p, s = repack_float_to_int4(_w(N, K, 6), 32)
    wd = np.asarray(dequant_int4(jnp.asarray(p), jnp.asarray(s), 32))
    pc, sc, zc = prepare_int4(p, s, 32)
    out = np.asarray(int4_matmul(jnp.asarray(x), jnp.asarray(pc), jnp.asarray(sc), 32,
                                 jnp.asarray(zc)))
    np.testing.assert_allclose(out, x @ wd, rtol=1e-4, atol=1e-4)


def test_prepare_int4_canonical_padding():
    """Canonical operands (ADVICE r1 follow-up): the padded layout must
    dequant to exactly the legacy layout for every khalf, including the
    flagship down_proj khalf=4480 that has no 256-multiple divisor."""
    for K in (256, 8960):
        N = 32
        p, s = repack_float_to_int4(_w(N, K, 6), 32)
        legacy = np.asarray(dequant_int4(jnp.asarray(p), jnp.asarray(s), 32))
        pc, sc, zc = prepare_int4(p, s, 32)
        assert pc.shape[0] % 256 == 0
        got = np.asarray(dequant_int4_canonical(
            jnp.asarray(pc), jnp.asarray(sc), jnp.asarray(zc), 32, K))
        np.testing.assert_allclose(got, legacy, rtol=1e-5, atol=1e-5)

    # Q4_K (affine) round trip through the canonical layout
    N, K = 4, 512
    w = _w(N, K, 1)
    raw = dt.quant_q4_k(w)
    ggml = dt.dequant_q4_k(raw, N * K).reshape(N, K)
    p, s, z = repack_q4_k(raw.reshape(N, -1), N, K)
    pc, sc, zc = prepare_int4(p, s, 32, z)
    got = np.asarray(dequant_int4_canonical(
        jnp.asarray(pc), jnp.asarray(sc), jnp.asarray(zc), 32, K))
    np.testing.assert_allclose(got.T, ggml, rtol=1e-5, atol=1e-5)
