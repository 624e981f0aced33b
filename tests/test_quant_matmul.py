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

# ---------------------------------------------------------------------------
# n-axis (native XLA s4) layout
# ---------------------------------------------------------------------------


def test_n_layout_lossless_q4_0():
    """canonical -> n-axis conversion dequants bit-identically (symmetric)."""
    from mllm_tpu.ops.quant_matmul import canonical_to_n_layout, dequant_int4_n

    N, K = 8, 256
    w = _w(N, K)
    raw = dt.quant_q4_0(w)
    ggml = dt.dequant_q4_0(raw, N * K).reshape(N, K)
    pc, sc, zc = prepare_int4(*repack_q4_0(raw.reshape(N, -1), N, K))
    pn, sg, zg = canonical_to_n_layout(pc, sc, zc, 32, K)
    assert pn.shape == (K, N // 2) and sg.shape == (K // 32, N)
    assert zg is None  # symmetric: the zshift stream is elided entirely
    got = np.asarray(dequant_int4_n(jnp.asarray(pn), jnp.asarray(sg), None, 32))
    np.testing.assert_allclose(got.T, ggml, rtol=1e-6, atol=1e-6)


def test_n_layout_lossless_q4_k():
    """Affine Q4_K maps losslessly onto qs*scale + zshift."""
    from mllm_tpu.ops.quant_matmul import canonical_to_n_layout, dequant_int4_n

    N, K = 4, 512
    w = _w(N, K, 1)
    raw = dt.quant_q4_k(w)
    ggml = dt.dequant_q4_k(raw, N * K).reshape(N, K)
    p, s, z = repack_q4_k(raw.reshape(N, -1), N, K)
    pc, sc, zc = prepare_int4(p, s, 32, z)
    pn, sg, zg = canonical_to_n_layout(pc, sc, zc, 32, K)
    got = np.asarray(dequant_int4_n(jnp.asarray(pn), jnp.asarray(sg), jnp.asarray(zg), 32))
    np.testing.assert_allclose(got.T, ggml, rtol=1e-5, atol=1e-5)


def test_int4_xla_matmul_decode_and_prefill():
    """Both branches (group-partial m<=32, dequant-dot m>32) match the
    dequant oracle; bitcast nibble order round-trips through pack_int4_n."""
    from mllm_tpu.ops.quant_matmul import (
        canonical_to_n_layout, dequant_int4_n, int4_xla_matmul,
    )

    K, N = 128, 64
    p, s = repack_float_to_int4(_w(N, K, 6), 32)
    pc, sc, zc = prepare_int4(p, s, 32)
    pn, sg, zg = canonical_to_n_layout(pc, sc, zc, 32, K)
    zj = None if zg is None else jnp.asarray(zg)
    wd = np.asarray(dequant_int4_n(jnp.asarray(pn), jnp.asarray(sg), zj, 32))
    for M in (1, 8, 48):  # decode + prefill branches
        x = _w(M, K, 7 + M)
        xb = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
        out = np.asarray(int4_xla_matmul(jnp.asarray(x), jnp.asarray(pn),
                                         jnp.asarray(sg), zj, 32))
        wb = np.asarray(jnp.asarray(wd).astype(jnp.bfloat16).astype(jnp.float32))
        if M <= 32:
            # planar two-dot branch: weights enter the dot as
            # bf16(nibble) * bf16(scale) — one more rounding than the
            # bf16(dequant) oracle.  Accumulated over K terms the absolute
            # error scales with the output magnitude (~30 here), so the
            # atol covers near-zero outputs where rtol is meaningless.
            np.testing.assert_allclose(out, xb @ wb, rtol=1e-2, atol=0.1)
        else:
            np.testing.assert_allclose(out, xb @ wb, rtol=1e-3, atol=1e-3)


def test_quantize_model_int4_xla(monkeypatch):
    """MLLM_INT4_IMPL=xla swaps every eligible Linear for Int4LinearXLA and
    the quantized model's logits stay close to float."""
    import jax

    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.models.transformer import CausalLM
    from mllm_tpu.nn.layers import Int4LinearXLA
    from mllm_tpu.ops.quantize_model import quantize_model

    monkeypatch.setenv("MLLM_INT4_IMPL", "xla")
    cfg = TextConfig(vocab_size=256, hidden_size=128, intermediate_size=256,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=64,
                     eos_token_id=-2)
    model = CausalLM.init(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    qmodel = quantize_model(model, "int4", min_size=1)
    kinds = [type(l).__name__ for l in jax.tree.leaves(
        qmodel, is_leaf=lambda x: isinstance(x, Int4LinearXLA)) if isinstance(l, Int4LinearXLA)]
    assert kinds, "no Int4LinearXLA created"
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (1, 8)), jnp.int32)
    lf = model(ids, None, last_only=False)[0]
    lq = qmodel(ids, None, last_only=False)[0]
    # int4 is lossy; just require same argmax on most positions
    agree = float(jnp.mean((jnp.argmax(lf, -1) == jnp.argmax(lq, -1)).astype(jnp.float32)))
    assert agree >= 0.5, agree


def test_quantize_model_int4_xla_on_device(monkeypatch):
    """on_device int4-xla quantization (the bench path) matches the host
    repack route exactly on the same weights."""
    import jax

    from mllm_tpu.nn.layers import Linear
    from mllm_tpu.ops.quantize_model import _quant_linear

    monkeypatch.setenv("MLLM_INT4_IMPL", "xla")
    w = _w(64, 128, 9)
    lin = Linear(jnp.asarray(w), None)
    host = _quant_linear(lin, "int4", 1, on_device=False)
    dev = _quant_linear(lin, "int4", 1, on_device=True)
    np.testing.assert_array_equal(np.asarray(host.packed_n), np.asarray(dev.packed_n))
    np.testing.assert_allclose(np.asarray(host.scales_g), np.asarray(dev.scales_g),
                               rtol=1e-6, atol=1e-6)
    assert host.zshift_g is None and dev.zshift_g is None  # symmetric: elided
    x = jnp.asarray(_w(2, 128, 10))
    np.testing.assert_allclose(np.asarray(host(x)), np.asarray(dev(x)), rtol=1e-5, atol=1e-5)


def test_int4_embed_head(monkeypatch):
    """Tied-embedding int4 lm_head: logits close to the float head and the
    host/device quantization routes agree."""
    import jax

    from mllm_tpu.nn.layers import Embedding
    from mllm_tpu.ops.quantize_model import Int4EmbedHead, _q4n_device

    monkeypatch.setenv("MLLM_INT4_IMPL", "xla")
    V, D = 128, 64
    emb = Embedding(jnp.asarray(_w(V, D, 11)))
    pn_d, sg_d = _q4n_device(emb.weight)
    head = Int4EmbedHead(emb, pn_d, sg_d)
    x = jnp.asarray(_w(2, D, 12))
    got = np.asarray(head.as_lm_head(x))
    ref = np.asarray(x) @ np.asarray(emb.weight).T
    # int4 is lossy: require high cosine similarity per row
    for r_got, r_ref in zip(got, ref):
        cos = np.dot(r_got, r_ref) / (np.linalg.norm(r_got) * np.linalg.norm(r_ref))
        assert cos > 0.99, cos
    # quantize_model wires it in for tied-embedding int4-xla models
    from mllm_tpu.core.config import TextConfig
    from mllm_tpu.models.transformer import CausalLM
    from mllm_tpu.ops.quantize_model import quantize_model

    cfg = TextConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                     num_hidden_layers=1, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=32,
                     tie_word_embeddings=True, eos_token_id=-2)
    m = CausalLM.init(jax.random.PRNGKey(2), cfg, dtype=jnp.float32)
    q = quantize_model(m, "int4", min_size=1)
    assert isinstance(q.embed_tokens, Int4EmbedHead)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 128, (1, 6)), jnp.int32)
    logits, _ = q(ids, q.init_cache(1, 16, jnp.float32))
    assert np.isfinite(np.asarray(logits)).all()


def test_int8_matmul_a8_accuracy():
    """W8A8 path matches the f32 dot within W8A8 tolerance (ADVICE r4)."""
    from mllm_tpu.ops.quant_matmul import int8_matmul_a8, repack_float_to_int8

    M, K, N = 32, 128, 64
    x = _w(M, K, 5) * 0.5
    w = _w(N, K, 6)
    qt, sc = repack_float_to_int8(w)
    ref = x @ (qt.astype(np.float32) * sc[None, :])  # dequantized-weight oracle
    got = np.asarray(int8_matmul_a8(jnp.asarray(x), jnp.asarray(qt), jnp.asarray(sc)))
    rms = np.sqrt(np.mean((got - ref) ** 2)) / np.sqrt(np.mean(ref**2))
    assert rms < 0.01  # activation-quant error only


def test_int8_matmul_a8_zero_rows():
    from mllm_tpu.ops.quant_matmul import int8_matmul_a8, repack_float_to_int8

    K, N = 64, 32
    x = np.zeros((17, K), np.float32)
    qt, sc = repack_float_to_int8(_w(N, K, 7))
    got = np.asarray(int8_matmul_a8(jnp.asarray(x), jnp.asarray(qt), jnp.asarray(sc)))
    assert np.all(got == 0) and got.shape == (17, N)


def test_quant_linear_a8_dispatch(monkeypatch):
    """QuantLinearA8 keeps the weight-only dot at decode shapes — including
    batch >= 16 decode steps [B, 1, D] — and takes the A8 dot at prefill."""
    import mllm_tpu.ops.quant_matmul as qm
    from mllm_tpu.nn.layers import QuantLinearA8
    from mllm_tpu.ops.quant_matmul import repack_float_to_int8

    calls = []
    real_a8, real_w8 = qm.int8_matmul_a8, qm.int8_matmul
    monkeypatch.setattr(qm, "int8_matmul_a8",
                        lambda *a, **k: calls.append("a8") or real_a8(*a, **k))
    monkeypatch.setattr(qm, "int8_matmul",
                        lambda *a, **k: calls.append("w8") or real_w8(*a, **k))
    K, N = 64, 32
    qt, sc = repack_float_to_int8(_w(N, K, 8))
    lin = QuantLinearA8(jnp.asarray(qt), jnp.asarray(sc), None)

    lin(jnp.ones((2, 1, K)))       # decode b2
    lin(jnp.ones((32, 1, K)))      # decode b32: MUST stay weight-only
    lin(jnp.ones((1, 128, K)))     # prefill
    lin(jnp.ones((64, K)))         # 2-D token stack (vision tower): A8
    assert calls == ["w8", "w8", "a8", "a8"]
