"""Whole-trunk int4 decode megakernel: all L decoder layers in ONE Pallas
launch.

Why: the round-2/3 int4 decode path wins per-GEMV (group-partial kernel) but
loses at model level to int8 — ~57 Pallas launches per step (28 fused-MLP +
28 decode-attention + head) each break XLA's cross-op prefetch, and on a
relay-attached chip the launch gap rivals a small GEMV.  This kernel removes
the boundaries altogether: the grid is (L, 1 + ff/block_f) — step (l, 0)
runs layer l's attention (int4 qkv projection, RoPE as a [hd, hd] rotation
matrix, online-softmax over the HBM-resident KV cache via double-buffered
DMA, int4 o-projection, residual + norms), steps (l, 1..NF) run the gated
MLP one ff-slab at a time exactly like ops/fused_mlp.py.  Pallas revisiting
semantics fetch each weight block exactly once per step while the NEXT
grid step's blocks stream in the background, so the whole trunk is one
continuous weight stream at int4 bytes — the speed-of-light formulation for
single-stream decode (HBM-bound: ~0.7 GB/step at flagship size).

Replaces (performance-wise) the reference's per-op decode dispatch
(/root/reference/mllm/backends/cpu/compute/Matmul.cpp + FlashAttention2.hpp
driven op-by-op from Module::Forward) with a single fused device program.

Contract / gates (checked by models/megadecode.py):
  - single stream (B=1, S=1), dense bf16 KV cache [L, 1, Hkv, S, hd]
  - hd == 128 (lane width), d/2 and (h*hd)/2 multiples of `group`
  - RMSNorm, hf-style full-dim RoPE, symmetric int4 weights (float-sourced)
  - gated MLP with act in _ACT, no sliding window, no QK-norm, no softcap

Weight layouts:
  qkv/o/gate/up: planar excess-8 over their K axis — packed uint8
    [L, K/2, N] (row r: k=r lo nibble, k=r+K/2 hi), scales f32 [L, K/G, N]
    in natural k-group order (lo rows [0, K/2G), hi rows [K/2G, K/G)).
  down: block-planar over K=ff (ops/fused_mlp.prepare_int4_ff layout).
The new token's K/V never round-trip through HBM: the online softmax is
INITIALIZED with the current token (m0 = s_new, l0 = 1, acc0 = v_new), and
the roped k/v are returned as [L, Hkv, hd] outputs for a trivial XLA
dynamic_update_slice outside (14 KB/step) — no read-after-write hazard and
no unaligned single-row DMA into the cache.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _ACT

NEG_INF = -1e30


def _rms(x, w, eps):
    """RMSNorm in f32: x (1, d) f32, w (1, d) f32 -> (1, d) f32."""
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * w


def _gdot_sym(xb, p_ref, s_ref, group):
    """y (m, n) f32 = xb (m, K) bf16 @ dequant(planar excess-8 int4).

    p_ref: (1, K/2, n) VMEM ref (sliced per group — temporaries stay
    (G, n)-sized); s_ref: (1, K/G, n) VMEM ref.  The lo/hi nibbles of
    packed row slice [gG, (g+1)G) cover k-groups g and K/2G + g; scales
    apply to f32 partial sums, symmetric zeros folded into the scale term
    (ops/quant_matmul._int4_gb_kernel_sym math)."""
    _, khalf, n = p_ref.shape
    ngh = khalf // group
    m = xb.shape[0]
    s_all = s_ref[0]  # (K/G, n) f32 — small
    acc = jnp.zeros((m, n), jnp.float32)
    for g in range(ngh):
        sl = slice(g * group, (g + 1) * group)
        pg = p_ref[0, sl, :].astype(jnp.int32)
        lo = (pg & 0x0F).astype(jnp.bfloat16)
        hi = (pg >> 4).astype(jnp.bfloat16)
        xl = xb[:, sl]
        xh = xb[:, khalf + g * group : khalf + (g + 1) * group]
        p_lo = jax.lax.dot_general(xl, lo, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        p_hi = jax.lax.dot_general(xh, hi, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        xs_l = jnp.sum(xl, axis=1, keepdims=True).astype(jnp.float32)
        xs_h = jnp.sum(xh, axis=1, keepdims=True).astype(jnp.float32)
        acc = (acc + (p_lo - 8.0 * xs_l) * s_all[g : g + 1, :]
               + (p_hi - 8.0 * xs_h) * s_all[ngh + g : ngh + g + 1, :])
    return acc


def _down_dot_sym(hb, p_ref, s_ref, group):
    """Block-planar down slab: hb (m, F) bf16, p_ref (1, F/2, d) packed ref,
    s_ref (1, F/G, d) scales ref (lo rows then hi rows within the block)."""
    _, fh, n = p_ref.shape
    ngb = fh // group
    m = hb.shape[0]
    s_all = s_ref[0]
    acc = jnp.zeros((m, n), jnp.float32)
    for g in range(ngb):
        sl = slice(g * group, (g + 1) * group)
        pg = p_ref[0, sl, :].astype(jnp.int32)
        lo = (pg & 0x0F).astype(jnp.bfloat16)
        hi = (pg >> 4).astype(jnp.bfloat16)
        xl = hb[:, sl]
        xh = hb[:, fh + g * group : fh + (g + 1) * group]
        p_lo = jax.lax.dot_general(xl, lo, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        p_hi = jax.lax.dot_general(xh, hi, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        xs_l = jnp.sum(xl, axis=1, keepdims=True).astype(jnp.float32)
        xs_h = jnp.sum(xh, axis=1, keepdims=True).astype(jnp.float32)
        acc = (acc + (p_lo - 8.0 * xs_l) * s_all[g : g + 1, :]
               + (p_hi - 8.0 * xs_h) * s_all[ngb + g : ngb + g + 1, :])
    return acc


def _mega_kernel(
    scal_ref,   # SMEM (2,) int32: [pos, kv_start]
    x_ref,      # VMEM (1, d) f32 — input hidden (post-embed)
    rope_ref,   # VMEM (hd, hd) f32 — rotation matrix for this position
    qkvp_ref,   # VMEM (1, d/2, n_qkv) u8      idx (l, 0, 0)
    qkvs_ref,   # VMEM (1, d/G, n_qkv) f32
    qkvb_ref,   # VMEM (1, 1, n_qkv) f32 (zeros when the model has no bias)
    op_ref,     # VMEM (1, n_q/2, d) u8
    os_ref,     # VMEM (1, n_q/G, d) f32
    gp_ref,     # VMEM (1, d/2, BF) u8         idx (l, 0, max(j-1, 0))
    gs_ref,     # VMEM (1, d/G, BF) f32
    up_ref,     # VMEM (1, d/2, BF) u8
    us_ref,     # VMEM (1, d/G, BF) f32
    dp_ref,     # VMEM (1, BF/2, d) u8         idx (l, max(j-1, 0), 0)
    ds_ref,     # VMEM (1, BF/G, d) f32
    n1_ref,     # VMEM (1, 1, d) f32           idx (l, 0, 0)
    n2_ref,     # VMEM (1, 1, d) f32
    k_hbm,      # ANY (L, 1, Hkv, S, hd) — cache, read-only here
    v_hbm,      # ANY
    y_ref,      # out VMEM (1, d) f32 — final hidden (pre final-norm)
    knew_ref,   # out VMEM (1, Hkv, hd) f32  idx (l, 0, 0) — roped new K
    vnew_ref,   # out VMEM (1, Hkv, hd) f32
    x_res,      # scratch VMEM (1, d) f32 — residual stream
    xm,         # scratch VMEM (1, d) bf16 — normed MLP input
    acc,        # scratch VMEM (1, d) f32 — MLP down accumulator
    k_buf,      # scratch VMEM (2, Hkv, BK, hd) cache dtype
    v_buf,
    sems,       # DMA semaphores (2, 2)
    *,
    group_a: int,
    group_d: int,
    act,
    scale: float,
    eps: float,
    rm: float,
    h: int,
    hkv: int,
    hd: int,
    bk: int,
    s_max: int,
    nf: int,
):
    l = pl.program_id(0)
    j = pl.program_id(1)
    pos = scal_ref[0]
    kv_start = scal_ref[1]
    gq = h // hkv  # q heads per kv head
    n_q = h * hd

    @pl.when(jnp.logical_and(l == 0, j == 0))
    def _seed():
        x_res[:] = x_ref[:]

    @pl.when(j == 0)
    def _attention():
        x = x_res[:]  # (1, d) f32
        hin = _rms(x, n1_ref[0], eps).astype(jnp.bfloat16)
        qkv = _gdot_sym(hin, qkvp_ref, qkvs_ref, group_a) + qkvb_ref[0]
        rot = rope_ref[:]  # (hd, hd) f32

        # roped q per head (scale folded), roped k / raw v per kv head
        def rope_apply(row):  # (1, hd) f32 @ (hd, hd) f32
            return jax.lax.dot_general(row, rot, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

        q_rows = []
        for qi in range(h):
            q_rows.append(rope_apply(qkv[:, qi * hd : (qi + 1) * hd]) * scale)
        k_rows = []
        v_rows = []
        for hh in range(hkv):
            kh = rope_apply(qkv[:, n_q + hh * hd : n_q + (hh + 1) * hd])
            vh = qkv[:, n_q + hkv * hd + hh * hd : n_q + hkv * hd + (hh + 1) * hd]
            k_rows.append(kh)
            v_rows.append(vh)
        knew_ref[0] = jnp.concatenate(k_rows, axis=0)  # (hkv, hd)
        vnew_ref[0] = jnp.concatenate(v_rows, axis=0)

        # online softmax per q head, initialized with the CURRENT token
        # (always valid, never round-trips through the cache)
        m_st, l_st, a_st = [], [], []
        for qi in range(h):
            kh = k_rows[qi // gq]
            vh = v_rows[qi // gq]
            s0 = jnp.sum(q_rows[qi] * kh, axis=1, keepdims=True)  # (1, 1)
            m_st.append(s0)
            l_st.append(jnp.ones((1, 1), jnp.float32))
            a_st.append(vh)

        n_blocks = pl.cdiv(pos, bk)  # traced; 0 on an empty cache

        def _dma_start(blk):
            # clamped final block (decode_attention.py trick): min in
            # 128-row units so Mosaic proves tile-divisibility
            return jnp.minimum(blk * (bk // 128), (s_max - bk) // 128) * 128

        def k_dma(slot, blk):
            return pltpu.make_async_copy(
                k_hbm.at[l, 0, :, pl.ds(_dma_start(blk), bk), :],
                k_buf.at[slot], sems.at[0, slot])

        def v_dma(slot, blk):
            return pltpu.make_async_copy(
                v_hbm.at[l, 0, :, pl.ds(_dma_start(blk), bk), :],
                v_buf.at[slot], sems.at[1, slot])

        @pl.when(n_blocks > 0)
        def _first():
            k_dma(0, 0).start()
            v_dma(0, 0).start()

        def body(i, carry):
            ms, ls, accs = carry
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n_blocks)
            def _prefetch():
                k_dma(nxt, i + 1).start()
                v_dma(nxt, i + 1).start()

            k_dma(slot, i).wait()
            v_dma(slot, i).wait()

            k_pos = _dma_start(i) + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
            ok = jnp.logical_and(k_pos < pos, k_pos >= kv_start)
            ok = jnp.logical_and(ok, k_pos >= i * bk)  # clamped-tail re-mask

            ms2, ls2, accs2 = [], [], []
            for qi in range(h):
                hh = qi // gq
                kb = k_buf[slot, hh]  # (BK, hd)
                vb = v_buf[slot, hh]
                s = jax.lax.dot_general(
                    q_rows[qi].astype(kb.dtype), kb, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (1, BK)
                s = jnp.where(ok, s, NEG_INF)
                m_cur = jnp.max(s, axis=1, keepdims=True)
                m_new = jnp.maximum(ms[qi], m_cur)
                p = jnp.exp(s - m_new)
                alpha = jnp.exp(ms[qi] - m_new)
                ls2.append(ls[qi] * alpha + jnp.sum(p, axis=1, keepdims=True))
                accs2.append(accs[qi] * alpha + jax.lax.dot_general(
                    p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
                ms2.append(m_new)
            return ms2, ls2, accs2

        m_st, l_st, a_st = jax.lax.fori_loop(
            0, n_blocks, body, (m_st, l_st, a_st))

        outs = [a_st[qi] / l_st[qi] for qi in range(h)]  # (1, hd) each
        attn_flat = jnp.concatenate(outs, axis=1).astype(jnp.bfloat16)  # (1, n_q)
        o = _gdot_sym(attn_flat, op_ref, os_ref, group_a)  # (1, d) f32
        xr = x + (o if rm == 1.0 else o * rm)
        x_res[:] = xr
        xm[:] = _rms(xr, n2_ref[0], eps).astype(jnp.bfloat16)

    @pl.when(j > 0)
    def _mlp_slab():
        jj = j - 1

        @pl.when(jj == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        hin = xm[:]  # (1, d) bf16
        gate = _gdot_sym(hin, gp_ref, gs_ref, group_a)
        up = _gdot_sym(hin, up_ref, us_ref, group_a)
        hmid = (act(gate) * up).astype(jnp.bfloat16)  # (1, BF)
        acc[:] += _down_dot_sym(hmid, dp_ref, ds_ref, group_d)

        @pl.when(jj == nf - 1)
        def _finish_layer():
            a = acc[:]
            xo = x_res[:] + (a if rm == 1.0 else a * rm)
            x_res[:] = xo

            @pl.when(l == pl.num_programs(0) - 1)
            def _():
                y_ref[:] = xo


def fused_decode_step(
    x: jax.Array,        # [1, d] f32/bf16 — post-embedding hidden
    pos,                 # scalar int32 — tokens already in the cache
    rope_r: jax.Array,   # [hd, hd] f32 rotation matrix at this position
    qkv_ops,             # (packed [L, d/2, n_qkv] u8, scales [L, d/G, n_qkv] f32,
                         #  bias [L, 1, n_qkv] f32)
    o_ops,               # (packed [L, n_q/2, d], scales [L, n_q/G, d])
    gate_ops,            # (packed [L, d/2, ff], scales [L, d/G, ff])
    up_ops,
    down_ops,            # block-planar: (packed [L, ff/2, d], scales [L, ff/G, d])
    norm1_w,             # [L, 1, d] f32
    norm2_w,             # [L, 1, d] f32
    k_cache,             # [L, 1, Hkv, S, hd] bf16
    v_cache,
    *,
    n_heads: int,
    n_kv_heads: int,
    head_dim: int,
    act: str = "silu",
    eps: float = 1e-6,
    rm: float = 1.0,
    scale: float | None = None,
    group_a: int = 64,
    group_d: int = 32,
    block_f: int = 640,
    block_k: int = 512,
    kv_start=None,
    interpret: bool = False,
):
    """One full trunk decode step.  Returns (y [1, d] f32 pre-final-norm,
    k_new [L, Hkv, hd] f32 roped, v_new [L, Hkv, hd] f32); the caller
    dynamic_update_slice's k_new/v_new into the cache at `pos`.

    group_a (qkv/o/gate/up) defaults to 64: at m=1 the kernel is dot-ISSUE
    latency bound (~31k small group dots/step at G=32 on the flagship,
    ~43 ns each), and G=64 halves the column-projection dot count.  The
    down proj stays at group_d=32 because its per-slab scale block
    (block_f/G sublanes) must be a multiple of 8 (Mosaic) for every valid
    block_f.  AWQ/GPTQ commonly group at 128; 64 is finer."""
    L, khalf_d, n_qkv = qkv_ops[0].shape
    d = 2 * khalf_d
    ff = gate_ops[0].shape[2]
    h, hkv, hd = n_heads, n_kv_heads, head_dim
    n_q = h * hd
    s_max = k_cache.shape[3]
    assert x.shape == (1, d), x.shape
    assert hd == 128 and n_qkv == (h + 2 * hkv) * hd
    assert ff % block_f == 0 and s_max % 128 == 0
    # Mosaic block rule: every scale block's sublane dim must be a multiple
    # of 8 (or the full array dim)
    assert block_f % (8 * group_d) == 0, (block_f, group_d)
    assert khalf_d % group_a == 0 and (n_q // 2) % group_a == 0
    # scale BlockSpecs cover the full [K/G] sublane extent (Mosaic full-dim
    # exemption), so ng need not be a multiple of 8
    if scale is None:
        scale = hd**-0.5
    bk = min(block_k, s_max)
    nf = ff // block_f
    ng_d = d // group_a
    ng_q = n_q // group_a
    scal = jnp.stack([jnp.asarray(pos, jnp.int32),
                      jnp.asarray(0 if kv_start is None else kv_start, jnp.int32)])

    kernel = functools.partial(
        _mega_kernel, group_a=group_a, group_d=group_d, act=_ACT[act],
        scale=float(scale), eps=float(eps), rm=float(rm), h=h, hkv=hkv,
        hd=hd, bk=bk, s_max=s_max, nf=nf)

    lconst = lambda l, j: (l, 0, 0)
    gmap = lambda l, j: (l, 0, jnp.maximum(j - 1, 0))
    dmap = lambda l, j: (l, jnp.maximum(j - 1, 0), 0)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, d), lambda l, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hd, hd), lambda l, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, khalf_d, n_qkv), lconst, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng_d, n_qkv), lconst, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_qkv), lconst, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_q // 2, d), lconst, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng_q, d), lconst, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, khalf_d, block_f), gmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng_d, block_f), gmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, khalf_d, block_f), gmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng_d, block_f), gmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_f // 2, d), dmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_f // group_d, d), dmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), lconst, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), lconst, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    out_specs = [
        pl.BlockSpec((1, d), lambda l, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hkv, hd), lambda l, j: (l, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hkv, hd), lambda l, j: (l, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((1, d), jnp.float32),
        jax.ShapeDtypeStruct((L, hkv, hd), jnp.float32),
        jax.ShapeDtypeStruct((L, hkv, hd), jnp.float32),
    ]
    qkvb = qkv_ops[2]
    if qkvb is None:
        qkvb = jnp.zeros((L, 1, n_qkv), jnp.float32)

    y, k_new, v_new = pl.pallas_call(
        kernel,
        grid=(L, nf + 1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.bfloat16),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((2, hkv, bk, hd), k_cache.dtype),
            pltpu.VMEM((2, hkv, bk, hd), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(scal, x.astype(jnp.float32), rope_r.astype(jnp.float32),
      qkv_ops[0], qkv_ops[1], qkvb, o_ops[0], o_ops[1],
      gate_ops[0], gate_ops[1], up_ops[0], up_ops[1],
      down_ops[0], down_ops[1], norm1_w, norm2_w, k_cache, v_cache)
    return y, k_new, v_new


def _mega_kernel_b(
    scal_ref,   # SMEM (2, b) int32: [pos_i, kv_start_i] per slot
    x_ref,      # VMEM (b, d) f32 — input hiddens (post-embed)
    hswap_ref,  # VMEM (hd, hd) f32 — half-swap permutation P (x@P = [x2, x1])
    cos_ref,    # VMEM (b, hd) f32 — [cos, cos] at each slot's position
    sin_ref,    # VMEM (b, hd) f32 — [-sin, sin] at each slot's position
    qkvp_ref,   # VMEM (1, d/2, n_qkv) u8      idx (l, 0, 0)
    qkvs_ref,   # VMEM (1, d/G, n_qkv) f32
    qkvb_ref,   # VMEM (1, 1, n_qkv) f32
    op_ref,     # VMEM (1, n_q/2, d) u8
    os_ref,     # VMEM (1, n_q/G, d) f32
    gp_ref,     # VMEM (1, d/2, BF) u8         idx (l, 0, max(j-1-ngrp, 0))
    gs_ref,     # VMEM (1, d/G, BF) f32
    up_ref,     # VMEM (1, d/2, BF) u8
    us_ref,     # VMEM (1, d/G, BF) f32
    dp_ref,     # VMEM (1, BF/2, d) u8         idx (l, max(j-1-ngrp, 0), 0)
    ds_ref,     # VMEM (1, BF/G, d) f32
    n1_ref,     # VMEM (1, 1, d) f32           idx (l, 0, 0)
    n2_ref,     # VMEM (1, 1, d) f32
    k_hbm,      # ANY (L, B, Hkv, S, hd) — cache, read-only here
    v_hbm,      # ANY
    y_ref,      # out VMEM (b, d) f32 — final hiddens (pre final-norm)
    knew_ref,   # out VMEM (1, b, hkv, hd) f32  idx (l, 0, 0, 0) — roped new K
    vnew_ref,   # out VMEM (1, b, hkv, hd) f32
    x_res,      # scratch VMEM (b, d) f32 — residual stream
    xm,         # scratch VMEM (b, d) bf16 — normed MLP input
    acc,        # scratch VMEM (b, d) f32 — MLP down accumulator
    qrope,      # scratch VMEM (b, n_q) f32 — roped+scaled q rows
    attn_o,     # scratch VMEM (b, n_q) f32 — attention outputs per slot
    knew_s,     # scratch VMEM (b, hkv*hd) f32 — 2D copy for per-slot reads
    vnew_s,     # scratch VMEM (b, hkv*hd) f32
    k_buf,      # scratch VMEM (2, gs, Hkv, BK, hd) cache dtype
    v_buf,
    sems,       # DMA semaphores (2, 2)
    *,
    group_a: int,
    group_d: int,
    act,
    scale: float,
    eps: float,
    rm: float,
    b: int,
    gs: int,
    h: int,
    hkv: int,
    hd: int,
    bk: int,
    s_max: int,
    nf: int,
):
    """Batched variant of _mega_kernel: grid (L, 1 + b/gs + nf), b <= 32.

    j = 0            : norm1 + int4 qkv projection + RoPE for ALL b rows
                       (weights stream once, all rows ride the same fetch);
    j in [1, b/gs]   : online-softmax attention for slot GROUP j-1 — gs
                       slots per grid step, ONE (gs, Hkv, BK, hd) DMA per KV
                       block covering the whole group, and a prefetch CHAIN
                       over the layer's flat (group, block) fetch sequence
                       (fetch t+1 issued while computing fetch t, across
                       group/grid-step boundaries) so DMA latency is paid
                       once per layer, not once per slot.  Scores ride one
                       (gq, hd) x (hd, BK) dot per (slot, kv-head) — the
                       GQA group batches onto the MXU instead of gq scalar-
                       row dots.  The LAST group step also runs the int4
                       o-projection + residual + norm2 for all rows;
    j > b/gs         : gated-MLP ff-slabs at m = b (same math as _mega_kernel).

    The block count nb = cdiv(max_i pos_i, bk) is GLOBAL: short slots read
    (masked) blocks up to the longest slot's length.  Lockstep decode (the
    bench loop) wastes nothing; a mixed-length engine window pays bounded
    overfetch for fewer, larger DMAs.

    RoPE here is elementwise (x * [c,c] + (x @ P) * [-s,s] with P the
    half-swap permutation) rather than the m=1 kernel's per-position
    rotation matrix: every slot sits at its OWN position, so a single
    [hd, hd] rotation no longer exists, but the swap matrix P is
    position-independent and shared by all slots."""
    l = pl.program_id(0)
    j = pl.program_id(1)
    gq = h // hkv
    n_q = h * hd
    ngrp = b // gs

    # global block count (max over per-slot positions, scalar SMEM reads)
    maxpos = scal_ref[0, 0]
    for _si in range(1, b):
        maxpos = jnp.maximum(maxpos, scal_ref[0, _si])
    nb = pl.cdiv(maxpos, bk)
    total_fetches = ngrp * nb

    def _dma_start(blk):
        # clamped final block (decode_attention.py trick): min in 128-row
        # units so Mosaic proves tile-divisibility
        return jnp.minimum(blk * (bk // 128), (s_max - bk) // 128) * 128

    def _fetch(t):
        """Start the t-th KV fetch of this layer: group t//nb, block t%nb,
        into the parity-t buffers (one DMA covers all gs slots)."""
        g_t = jax.lax.div(t, nb)
        i_t = jax.lax.rem(t, nb)
        par = jax.lax.rem(t, 2)
        start = _dma_start(i_t)
        pltpu.make_async_copy(
            k_hbm.at[l, pl.ds(g_t * gs, gs), :, pl.ds(start, bk), :],
            k_buf.at[par], sems.at[0, par]).start()
        pltpu.make_async_copy(
            v_hbm.at[l, pl.ds(g_t * gs, gs), :, pl.ds(start, bk), :],
            v_buf.at[par], sems.at[1, par]).start()

    def _wait(t):
        par = jax.lax.rem(t, 2)
        g_t = jax.lax.div(t, nb)
        i_t = jax.lax.rem(t, nb)
        start = _dma_start(i_t)
        pltpu.make_async_copy(
            k_hbm.at[l, pl.ds(g_t * gs, gs), :, pl.ds(start, bk), :],
            k_buf.at[par], sems.at[0, par]).wait()
        pltpu.make_async_copy(
            v_hbm.at[l, pl.ds(g_t * gs, gs), :, pl.ds(start, bk), :],
            v_buf.at[par], sems.at[1, par]).wait()

    @pl.when(jnp.logical_and(l == 0, j == 0))
    def _seed():
        x_res[:] = x_ref[:]

    @pl.when(j == 0)
    def _qkv_rope():
        # head of the layer's KV prefetch chain rides under the qkv compute
        @pl.when(total_fetches > 0)
        def _head():
            _fetch(jnp.int32(0))

        x = x_res[:]  # (b, d) f32
        hin = _rms(x, n1_ref[0], eps).astype(jnp.bfloat16)
        qkv = _gdot_sym(hin, qkvp_ref, qkvs_ref, group_a) + qkvb_ref[0]
        P = hswap_ref[:]
        cosb = cos_ref[:]  # (b, hd)
        sinb = sin_ref[:]

        def rope_rows(rows):  # (b, hd) f32, per-slot position
            swapped = jax.lax.dot_general(rows, P, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
            return rows * cosb + swapped * sinb

        for qi in range(h):
            qh = rope_rows(qkv[:, qi * hd : (qi + 1) * hd]) * scale
            qrope[:, qi * hd : (qi + 1) * hd] = qh
        k_rows, v_rows = [], []
        for hh in range(hkv):
            kh = rope_rows(qkv[:, n_q + hh * hd : n_q + (hh + 1) * hd])
            vh = qkv[:, n_q + hkv * hd + hh * hd : n_q + hkv * hd + (hh + 1) * hd]
            knew_s[:, hh * hd : (hh + 1) * hd] = kh
            vnew_s[:, hh * hd : (hh + 1) * hd] = vh
            k_rows.append(kh)
            v_rows.append(vh)
        knew_ref[0] = jnp.stack(k_rows, axis=1)  # (b, hkv, hd)
        vnew_ref[0] = jnp.stack(v_rows, axis=1)

    @pl.when(jnp.logical_and(j > 0, j <= ngrp))
    def _attention_group():
        g = j - 1
        base_t = g * nb

        # per-slot q/k/v of the CURRENT token: Mosaic can't vector-load a
        # dynamic unaligned sublane row, so select with a one-hot
        # mask-reduce over the b sublanes.  The (gq, hd) per-kv-head q
        # matrices are built by sublane-CONCATENATING lane slices (a lane-
        # dim-splitting reshape is an unsupported Mosaic shape cast).
        q_mats, k_cur, v_cur, sels = [], [], [], []
        for si in range(gs):
            slot = g * gs + si
            sel = (jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0) == slot)
            sels.append(sel)
            selq = jnp.sum(jnp.where(sel, qrope[:], 0.0), axis=0, keepdims=True)
            selk = jnp.sum(jnp.where(sel, knew_s[:], 0.0), axis=0, keepdims=True)
            selv = jnp.sum(jnp.where(sel, vnew_s[:], 0.0), axis=0, keepdims=True)
            q_mats.append([jnp.concatenate(
                [selq[:, (hh * gq + t) * hd : (hh * gq + t + 1) * hd]
                 for t in range(gq)], axis=0) for hh in range(hkv)])  # (gq, hd)
            k_cur.append([selk[:, hh * hd : (hh + 1) * hd] for hh in range(hkv)])
            v_cur.append([selv[:, hh * hd : (hh + 1) * hd] for hh in range(hkv)])

        # online softmax per (slot, kv-head), q rows batched over the GQA
        # group; initialized with the CURRENT token (never in the cache)
        m_st, l_st, a_st = [], [], []
        for si in range(gs):
            for hh in range(hkv):
                qg = q_mats[si][hh]                               # (gq, hd)
                kh = k_cur[si][hh]                                # (1, hd)
                vh = v_cur[si][hh]
                s0 = jnp.sum(qg * kh, axis=1, keepdims=True)      # (gq, 1)
                m_st.append(s0)
                l_st.append(jnp.ones((gq, 1), jnp.float32))
                a_st.append(jnp.broadcast_to(vh, (gq, hd)) * jnp.ones((gq, 1), jnp.float32))

        def body(i, carry):
            ms, ls, accs = carry
            t = base_t + i
            par = jax.lax.rem(t, 2)

            @pl.when(t + 1 < total_fetches)
            def _prefetch_next():
                _fetch(t + 1)

            _wait(t)

            k_pos = _dma_start(i) + jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
            tail_ok = k_pos >= i * bk  # clamped-tail re-mask

            ms2, ls2, accs2 = [], [], []
            for si in range(gs):
                slot = g * gs + si
                pos = scal_ref[0, slot]
                kv_start = scal_ref[1, slot]
                ok = jnp.logical_and(k_pos < pos, k_pos >= kv_start)
                ok = jnp.logical_and(ok, tail_ok)
                for hh in range(hkv):
                    st = si * hkv + hh
                    kb = k_buf[par, si, hh]  # (BK, hd)
                    vb = v_buf[par, si, hh]
                    qg = q_mats[si][hh]
                    s = jax.lax.dot_general(
                        qg.astype(kb.dtype), kb, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (gq, BK)
                    s = jnp.where(ok, s, NEG_INF)
                    m_cur = jnp.max(s, axis=1, keepdims=True)
                    m_new = jnp.maximum(ms[st], m_cur)
                    p = jnp.exp(s - m_new)
                    alpha = jnp.exp(ms[st] - m_new)
                    ls2.append(ls[st] * alpha + jnp.sum(p, axis=1, keepdims=True))
                    accs2.append(accs[st] * alpha + jax.lax.dot_general(
                        p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                    ms2.append(m_new)
            return ms2, ls2, accs2

        m_st, l_st, a_st = jax.lax.fori_loop(0, nb, body, (m_st, l_st, a_st))

        for si in range(gs):
            # scatter the (gq, hd) outs back into this slot's attn_o lanes
            # head by head.  Row extraction rides a one-hot (1, gq) dot —
            # dots normalize vector layouts, where slicing/reshaping a
            # sublane-offset row is an unsupported Mosaic shape cast.
            for hh in range(hkv):
                o = a_st[si * hkv + hh] / l_st[si * hkv + hh]  # (gq, hd)
                for t in range(gq):
                    qi = hh * gq + t
                    eh = (jax.lax.broadcasted_iota(jnp.int32, (1, gq), 1)
                          == t).astype(jnp.float32)
                    row_t = jax.lax.dot_general(
                        eh, o, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (1, hd) clean
                    sl = slice(qi * hd, (qi + 1) * hd)
                    attn_o[:, sl] = jnp.where(
                        sels[si], jnp.broadcast_to(row_t, (b, hd)),
                        attn_o[:, sl])

        @pl.when(j == ngrp)
        def _oproj():
            o = _gdot_sym(attn_o[:].astype(jnp.bfloat16), op_ref, os_ref, group_a)
            xr = x_res[:] + (o if rm == 1.0 else o * rm)
            x_res[:] = xr
            xm[:] = _rms(xr, n2_ref[0], eps).astype(jnp.bfloat16)

    @pl.when(j > ngrp)
    def _mlp_slab():
        jj = j - 1 - ngrp

        @pl.when(jj == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        hin = xm[:]  # (b, d) bf16
        gate = _gdot_sym(hin, gp_ref, gs_ref, group_a)
        up = _gdot_sym(hin, up_ref, us_ref, group_a)
        hmid = (act(gate) * up).astype(jnp.bfloat16)  # (b, BF)
        acc[:] += _down_dot_sym(hmid, dp_ref, ds_ref, group_d)

        @pl.when(jj == nf - 1)
        def _finish_layer():
            a = acc[:]
            xo = x_res[:] + (a if rm == 1.0 else a * rm)
            x_res[:] = xo

            @pl.when(l == pl.num_programs(0) - 1)
            def _():
                y_ref[:] = xo


def fused_decode_step_batched(
    x: jax.Array,        # [b, d] f32/bf16 — post-embedding hiddens
    pos,                 # [b] int32 — tokens already in each slot's cache
    sin_rows: jax.Array,  # [b, hd/2] f32 at each slot's position
    cos_rows: jax.Array,  # [b, hd/2] f32
    qkv_ops, o_ops, gate_ops, up_ops, down_ops,
    norm1_w, norm2_w,
    k_cache,             # [L, B, Hkv, S, hd]
    v_cache,
    *,
    n_heads: int,
    n_kv_heads: int,
    head_dim: int,
    act: str = "silu",
    eps: float = 1e-6,
    rm: float = 1.0,
    scale: float | None = None,
    group_a: int = 64,
    group_d: int = 32,
    block_f: int = 640,
    block_k: int | None = None,
    slot_group: int | None = None,
    kv_start=None,       # [b] int32 or None
    interpret: bool = False,
):
    """Batched whole-trunk decode step (b <= 32 slots, one Pallas launch).

    Same weight operands/layouts as fused_decode_step; each slot attends
    to its OWN cache entry at its OWN position.  Returns (y [b, d] f32,
    k_new [L, b, Hkv, hd] f32 roped, v_new [L, b, Hkv, hd] f32); the caller
    scatters k_new/v_new into the cache at each slot's position.

    Why this exists (round-3 verdict #2): at b=8 the m=1 megakernel doesn't
    apply and int4 rode ~57 per-layer launches, losing to int8 (2,282 vs
    2,722 tok/s).  Here the whole int4 weight stream (~1.05 GB at flagship
    size) is fetched ONCE per step and serves all b rows, so the step cost
    approaches (weights + b * KV) / HBM-BW — the same speed-of-light
    formulation that made m=1 int4 win.

    slot_group (round-4 verdict #3, the b=32 extension): gs slots share one
    attention grid step and one KV DMA per block, so the attention phase is
    b/gs grid steps instead of b and its DMA chain is latency-exposed once
    per layer instead of once per slot.  Default: largest of 4/2/1 dividing
    b.  block_k defaults to 256 for grouped attention (VMEM: the paired
    k/v group buffers cost 2*2*gs*hkv*bk*hd*2 bytes next to ~10 MB of
    double-buffered weight blocks) and 512 for gs=1."""
    L, khalf_d, n_qkv = qkv_ops[0].shape
    d = 2 * khalf_d
    ff = gate_ops[0].shape[2]
    h, hkv, hd = n_heads, n_kv_heads, head_dim
    n_q = h * hd
    s_max = k_cache.shape[3]
    b = x.shape[0]
    # measured on v5e (flagship geometry, ctx 192): b=8 prefers gs=4
    # (6,112 tok/s vs 5,802 at gs=8); b=32 prefers gs=8 (15,656 vs 14,925
    # at gs=4) — bigger groups amortize more DMA latency once the
    # attention phase dominates the grid.  MLLM_MEGA_GS / MLLM_MEGA_BK env
    # knobs override for tuning (same precedent as MLLM_INT4_IMPL).
    import os as _os

    env_gs = int(_os.environ.get("MLLM_MEGA_GS", 0))
    env_bk = int(_os.environ.get("MLLM_MEGA_BK", 0))
    if env_bk and block_k is None:
        block_k = env_bk
    if env_gs and slot_group is None and b % env_gs == 0:
        slot_group = env_gs
    if slot_group:
        gs = slot_group
    elif b > 16 and b % 8 == 0:
        gs = 8
    else:
        gs = next(g for g in (4, 2, 1) if b % g == 0)
    if block_k is None:
        block_k = 256 if gs > 1 else 512
    ngrp = b // gs
    assert x.shape == (b, d), x.shape
    assert k_cache.shape[1] == b, (k_cache.shape, b)
    assert b <= 32 and b % gs == 0, (b, gs)
    assert hd == 128 and n_qkv == (h + 2 * hkv) * hd
    assert ff % block_f == 0 and s_max % 128 == 0
    assert block_f % (8 * group_d) == 0, (block_f, group_d)
    assert khalf_d % group_a == 0 and (n_q // 2) % group_a == 0
    # scale BlockSpecs cover the full [K/G] sublane extent (Mosaic full-dim
    # exemption), so ng need not be a multiple of 8
    if scale is None:
        scale = hd**-0.5
    bk = min(block_k, s_max)
    nf = ff // block_f
    ng_d = d // group_a
    ng_q = n_q // group_a
    pos = jnp.asarray(pos, jnp.int32).reshape(b)
    kvs = (jnp.zeros((b,), jnp.int32) if kv_start is None
           else jnp.asarray(kv_start, jnp.int32).reshape(b))
    scal = jnp.stack([pos, kvs])  # (2, b)

    # half-swap permutation P (x @ P = [x2, x1]) + per-slot cos/sin rows
    half = hd // 2
    i = jnp.arange(half)
    P = jnp.zeros((hd, hd), jnp.float32)
    P = P.at[i + half, i].set(1.0)
    P = P.at[i, i + half].set(1.0)
    c = cos_rows.astype(jnp.float32).reshape(b, half)
    s = sin_rows.astype(jnp.float32).reshape(b, half)
    cos_ext = jnp.concatenate([c, c], axis=1)       # (b, hd)
    sin_ext = jnp.concatenate([-s, s], axis=1)

    kernel = functools.partial(
        _mega_kernel_b, group_a=group_a, group_d=group_d, act=_ACT[act],
        scale=float(scale), eps=float(eps), rm=float(rm), b=b, gs=gs, h=h,
        hkv=hkv, hd=hd, bk=bk, s_max=s_max, nf=nf)

    lconst = lambda l, j: (l, 0, 0)
    full2 = lambda l, j: (0, 0)
    gmap = lambda l, j: (l, 0, jnp.maximum(j - 1 - ngrp, 0))
    dmap = lambda l, j: (l, jnp.maximum(j - 1 - ngrp, 0), 0)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((b, d), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((hd, hd), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((b, hd), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((b, hd), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, khalf_d, n_qkv), lconst, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng_d, n_qkv), lconst, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_qkv), lconst, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_q // 2, d), lconst, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng_q, d), lconst, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, khalf_d, block_f), gmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng_d, block_f), gmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, khalf_d, block_f), gmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ng_d, block_f), gmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_f // 2, d), dmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_f // group_d, d), dmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), lconst, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d), lconst, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    out_specs = [
        pl.BlockSpec((b, d), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, hkv, hd), lambda l, j: (l, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, b, hkv, hd), lambda l, j: (l, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, d), jnp.float32),
        jax.ShapeDtypeStruct((L, b, hkv, hd), jnp.float32),
        jax.ShapeDtypeStruct((L, b, hkv, hd), jnp.float32),
    ]
    qkvb = qkv_ops[2]
    if qkvb is None:
        qkvb = jnp.zeros((L, 1, n_qkv), jnp.float32)

    y, k_new, v_new = pl.pallas_call(
        kernel,
        grid=(L, 1 + ngrp + nf),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((b, d), jnp.float32),
            pltpu.VMEM((b, d), jnp.bfloat16),
            pltpu.VMEM((b, d), jnp.float32),
            pltpu.VMEM((b, n_q), jnp.float32),
            pltpu.VMEM((b, n_q), jnp.float32),
            pltpu.VMEM((b, hkv * hd), jnp.float32),
            pltpu.VMEM((b, hkv * hd), jnp.float32),
            pltpu.VMEM((2, gs, hkv, bk, hd), k_cache.dtype),
            pltpu.VMEM((2, gs, hkv, bk, hd), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        # b=32 needs ~18 MB of scoped VMEM (double-buffered weight blocks
        # ~10 MB + per-row scratch + grouped KV buffers); v5e has 128 MB
        # physical VMEM and the default 16 MB scoped limit is just a
        # compiler conservatism — raise it for the large-batch grids
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(scal, x.astype(jnp.float32), P, cos_ext, sin_ext,
      qkv_ops[0], qkv_ops[1], qkvb, o_ops[0], o_ops[1],
      gate_ops[0], gate_ops[1], up_ops[0], up_ops[1],
      down_ops[0], down_ops[1], norm1_w, norm2_w, k_cache, v_cache)
    return y, k_new, v_new


def rope_rotation_matrix(sin_row: jax.Array, cos_row: jax.Array, hd: int = 128):
    """hf-style (rotate_half) RoPE at one position as a [hd, hd] matrix R so
    that rope(x) == x @ R exactly (nn/layers.py apply_rotary 'hf' math):
      out[j]      = x[j] cos[j] - x[j+hd/2] sin[j]
      out[j+hd/2] = x[j+hd/2] cos[j] + x[j] sin[j]
    sin_row/cos_row: [hd/2] f32 at the current position."""
    half = hd // 2
    i = jnp.arange(half)
    c = cos_row.astype(jnp.float32)
    s = sin_row.astype(jnp.float32)
    R = jnp.zeros((hd, hd), jnp.float32)
    R = R.at[i, i].set(c)
    R = R.at[i + half, i].set(-s)
    R = R.at[i + half, i + half].set(c)
    R = R.at[i, i + half].set(s)
    return R
