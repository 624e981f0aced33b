"""Fused int4 MLP kernel: layout round-trip, fallback and interpret-mode
exactness, and model-level wiring through quantize_model."""

import numpy as np
import jax
import jax.numpy as jnp

from mllm_tpu.core.config import TextConfig
from mllm_tpu.ops import quant_matmul as qm
from mllm_tpu.ops.fused_mlp import (
    _dequant_down_blockplanar,
    fused_int4_mlp,
    pick_block_f,
    prepare_int4_ff,
)


def _mk_ops(rng, d, ff):
    wg = rng.standard_normal((ff, d), dtype=np.float32) * 0.05
    wu = rng.standard_normal((ff, d), dtype=np.float32) * 0.05
    wd = rng.standard_normal((d, ff), dtype=np.float32) * 0.05
    g_ops = tuple(jnp.asarray(a) for a in qm.prepare_int4(*qm.repack_float_to_int4(wg, 32)))
    u_ops = tuple(jnp.asarray(a) for a in qm.prepare_int4(*qm.repack_float_to_int4(wu, 32)))
    bf = pick_block_f(ff)
    d_ops = tuple(jnp.asarray(a) for a in
                  prepare_int4_ff(*qm.repack_float_to_int4(wd, 32), None, bf))
    return (wg, wu, wd), (g_ops, u_ops, d_ops), bf


def test_blockplanar_roundtrip():
    rng = np.random.default_rng(0)
    d, ff = 128, 512
    wd = rng.standard_normal((d, ff), dtype=np.float32) * 0.05
    p, s = qm.repack_float_to_int4(wd, 32)
    legacy = np.asarray(qm.dequant_int4(jnp.asarray(p), jnp.asarray(s), 32))  # [ff, d]
    bf = pick_block_f(ff)
    assert bf == 512
    dp, ds, dz = prepare_int4_ff(p, s, None, bf)
    got = np.asarray(_dequant_down_blockplanar(
        jnp.asarray(dp), jnp.asarray(ds), jnp.asarray(dz), 32, bf))
    np.testing.assert_allclose(got, legacy, rtol=1e-6, atol=1e-6)


def test_fused_mlp_fallback_matches_reference():
    rng = np.random.default_rng(1)
    d, ff, m = 64, 256, 4
    (wg, wu, wd), (g_ops, u_ops, d_ops), bf = _mk_ops(rng, d, ff)
    x = jnp.asarray(rng.standard_normal((m, d), dtype=np.float32))

    # reference through the legacy dequant of the SAME quantized values
    dq = lambda w: np.asarray(qm.dequant_int4(
        *[jnp.asarray(a) for a in qm.repack_float_to_int4(w, 32)], 32))
    h = np.asarray(jax.nn.silu(x @ dq(wg))) * np.asarray(x @ dq(wu))
    want = h @ dq(wd)

    got = np.asarray(fused_int4_mlp(x, g_ops, u_ops, d_ops, act="silu", block_f=bf))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_mlp_interpret_kernel_matches_fallback():
    rng = np.random.default_rng(2)
    d, ff, m = 64, 512, 8
    _, (g_ops, u_ops, d_ops), bf = _mk_ops(rng, d, ff)
    x = jnp.asarray(rng.standard_normal((m, d), dtype=np.float32))
    ref = np.asarray(fused_int4_mlp(x, g_ops, u_ops, d_ops, act="silu", block_f=bf))
    out = np.asarray(fused_int4_mlp(x.astype(jnp.bfloat16), g_ops, u_ops, d_ops,
                                    act="silu", block_f=bf, interpret=True))
    rel = np.abs(ref - out).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 2e-2


def test_quantize_model_creates_fused_mlp_and_matches_per_linear(monkeypatch):
    import mllm_tpu.ops.quantize_model as qmod
    from mllm_tpu.models.transformer import CausalLM
    from mllm_tpu.ops.quantize_model import FusedInt4MLP, fuse_projections, quantize_model

    monkeypatch.setattr(qmod, "INT4_MIN_PARAMS", 0)  # tiny test weights
    monkeypatch.setenv("MLLM_INT4_IMPL", "pallas")  # fused MLP is Pallas-path only

    cfg = TextConfig(vocab_size=64, hidden_size=64, intermediate_size=256,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=64,
                     eos_token_id=-5)
    m = CausalLM.init(jax.random.PRNGKey(2), cfg)
    q = quantize_model(m, "int4", min_size=1)
    assert isinstance(q.blocks.mods[0].mlp, FusedInt4MLP)

    # per-linear path: pre-fuse gate+up so the MLP is ineligible
    q_ref = quantize_model(fuse_projections(m), "int4", min_size=1)
    ids = np.arange(10, dtype=np.int32)[None, :] % 64

    def logits(mm):
        cache = mm.init_cache(1, 16, jnp.float32)
        out, _ = mm(ids, cache, last_only=False)
        return np.asarray(out)

    np.testing.assert_allclose(logits(q), logits(q_ref), rtol=1e-3, atol=1e-3)

    from mllm_tpu.generation.generate import generate
    from mllm_tpu.generation.sampling import SamplingConfig

    cache = q.init_cache(1, 32, jnp.float32)
    res, _ = generate(q, ids[:, :5], cache, SamplingConfig(max_new_tokens=4), bucket=8)
    assert len(res.tokens) == 4


def test_fused_mlp_symmetric_zeros_elided():
    """ops with zeros=None (the symmetric form quantize_model now emits) must
    match the zeros-carrying affine form bit-for-bit in both the fallback
    and the interpret-mode kernel: zeros == -8*scales identically, so the
    elided zero term is algebraically the same sum."""
    rng = np.random.default_rng(5)
    d, ff, m = 64, 512, 8
    _, (g_ops, u_ops, d_ops), bf = _mk_ops(rng, d, ff)
    sym = lambda ops: (ops[0], ops[1], None)
    x = jnp.asarray(rng.standard_normal((m, d), dtype=np.float32))

    ref = np.asarray(fused_int4_mlp(x, g_ops, u_ops, d_ops, act="silu", block_f=bf))
    got_fb = np.asarray(fused_int4_mlp(x, sym(g_ops), sym(u_ops), sym(d_ops),
                                       act="silu", block_f=bf))
    np.testing.assert_allclose(got_fb, ref, rtol=1e-5, atol=1e-5)

    ker_ref = np.asarray(fused_int4_mlp(x.astype(jnp.bfloat16), g_ops, u_ops,
                                        d_ops, act="silu", block_f=bf,
                                        interpret=True))
    ker_sym = np.asarray(fused_int4_mlp(x.astype(jnp.bfloat16), sym(g_ops),
                                        sym(u_ops), sym(d_ops), act="silu",
                                        block_f=bf, interpret=True))
    np.testing.assert_allclose(ker_sym, ker_ref, rtol=1e-5, atol=1e-5)
