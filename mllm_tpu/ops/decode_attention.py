"""Pallas TPU fused decode attention (single-token query over the KV cache).

This is the hot decode-path kernel: the TPU-native answer to the reference's
eager decode attention (GEMV + softmax over the ring cache) and its fp16-KV
FlashAttention decode path (/root/reference/mllm/backends/cpu/compute/
FlashAttention2.hpp, op/CPUKVCache.cpp).

Decode attention is HBM-bandwidth-bound.  Design:
  - K/V stay in HBM; the kernel streams them in double-buffered DMA chunks of
    `block_k` tokens and early-exits at the *actual* sequence length
    (`kv_valid_len`, a traced scalar) — so a 128-token context doesn't pay for
    a `max_len`-sized cache sweep, while everything stays a static shape for
    XLA (no recompiles as the sequence grows).
  - grid = (B, H_kv); each program handles one kv head's query group (GQA:
    the G = H/H_kv grouped queries ride along as matmul rows).
  - online softmax in f32; K/V can be bf16 or f32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def unpack4_planar(p):
    """uint8 (..., D/2) excess-8 nibble pairs -> bf16 (..., D).

    THE single definition of the int4-KV packing contract (Quant4KVCache
    packs with the inverse; kv/cache.py imports this for its dequant path so
    the two sides cannot drift).  Planar along the head_dim axis: byte j
    holds d=j (low nibble) and d=j+D/2 (high), so the unpack is a concat —
    order-preserving, no interleave.  Values are stored excess-8
    (q = v + 8, v in [-8, 7])."""
    p32 = p.astype(jnp.int32)
    lo = ((p32 & 0x0F) - 8).astype(jnp.bfloat16)
    hi = ((p32 >> 4) - 8).astype(jnp.bfloat16)
    return jnp.concatenate([lo, hi], axis=-1)


def _decode_kernel(
    scalars_ref,  # SMEM (2B,) int32: [kv_valid_0..B-1, kv_start_0..B-1]
    q_ref,  # VMEM (1, 1, G, D)
    k_hbm,  # HBM  (B, H_kv, S, D) — full cache, DMA'd manually
    v_hbm,  # HBM  (B, H_kv, S, D)
    o_ref,  # VMEM (1, 1, G, D)
    k_buf,  # scratch VMEM (2, BK, D)
    v_buf,  # scratch VMEM (2, BK, D)
    sems,  # DMA semaphores (2, 2)
    *,
    scale: float,
    window: Optional[int],
    bk: int,
    s_max: int,
    n_b: int,
):
    bb = pl.program_id(0)
    hh = pl.program_id(1)
    kv_valid = scalars_ref[bb]  # per-sequence valid length (slot scheduling)
    kv_start = scalars_ref[n_b + bb]  # per-sequence left-pad offset
    n_blocks = pl.cdiv(kv_valid, bk)  # traced trip count
    g, d = q_ref.shape[2], q_ref.shape[3]
    q = q_ref[0, 0] * scale  # (G, D) — fold scale into q

    def _dma_start(blk):
        # The final block may be partial (s_max not a multiple of bk, kv_valid
        # in the tail): clamp the slice start so the fixed-size copy never
        # reads past the cache; overlapped rows are re-masked below.
        # The min runs in 128-row units and multiplies after, so Mosaic can
        # prove the tile-divisibility of the dynamic start.
        return jnp.minimum(blk * (bk // 128), (s_max - bk) // 128) * 128

    def k_dma(slot, blk):
        return pltpu.make_async_copy(
            k_hbm.at[bb, hh, pl.ds(_dma_start(blk), bk), :], k_buf.at[slot], sems.at[0, slot]
        )

    def v_dma(slot, blk):
        return pltpu.make_async_copy(
            v_hbm.at[bb, hh, pl.ds(_dma_start(blk), bk), :], v_buf.at[slot], sems.at[1, slot]
        )

    k_dma(0, 0).start()
    v_dma(0, 0).start()

    def body(i, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blocks)
        def _prefetch():
            k_dma(nxt, i + 1).start()
            v_dma(nxt, i + 1).start()

        k_dma(slot, i).wait()
        v_dma(slot, i).wait()

        kb = k_buf[slot]  # (BK, D)
        vb = v_buf[slot]
        s = jax.lax.dot_general(
            q.astype(kb.dtype), kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G, BK)
        k_pos = _dma_start(i) + jax.lax.broadcasted_iota(jnp.int32, (g, bk), 1)
        ok = jnp.logical_and(k_pos < kv_valid, k_pos >= kv_start)
        # clamped final block: drop rows already attended by earlier blocks
        ok = jnp.logical_and(ok, k_pos >= i * bk)
        if window is not None:
            ok = jnp.logical_and(ok, k_pos > kv_valid - 1 - window)
        s = jnp.where(ok, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    m0 = jnp.full((g, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((g, 1), jnp.float32)
    acc0 = jnp.zeros((g, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _decode_quant_kernel(
    scalars_ref,  # SMEM (2B,) int32: [kv_valid_0..B-1, kv_start_0..]
    q_ref,  # VMEM (1, 1, G, D)
    k_hbm,  # HBM  (B, H_kv, S, D) int8
    v_hbm,  # HBM  (B, H_kv, S, D) int8
    ks_hbm,  # HBM (B, H_kv, 1, S) f32 — per-token K scales, seq on lanes
    vs_hbm,  # HBM (B, H_kv, 1, S) f32
    o_ref,  # VMEM (1, 1, G, D)
    k_buf,  # scratch VMEM (2, BK, D) int8
    v_buf,
    ks_buf,  # scratch VMEM (2, 1, BK) f32
    vs_buf,
    sems,  # DMA semaphores (4, 2)
    *,
    scale: float,
    window: Optional[int],
    bk: int,
    s_max: int,
    n_b: int,
    bits4: bool = False,
):
    """int8/int4-KV fused decode attention (SageAttention-KVQ8 counterpart,
    /root/reference/mllm/backends/cpu/compute/SageAttentionKVQ8.hpp; the
    int4 variant goes beyond the reference's q8 floor).

    The per-token K scale is folded into the score row and the V scale into
    the probability row — both on the tiny (G, BK) score matrix — so the only
    per-element work on the streamed data is the convert (int8) or the
    nibble unpack (int4, planar along head_dim).  HBM traffic is 1/2 (int8)
    or 1/4 (int4) of the bf16 kernel's (+scale vectors)."""
    bb = pl.program_id(0)
    hh = pl.program_id(1)
    kv_valid = scalars_ref[bb]
    kv_start = scalars_ref[n_b + bb]
    n_blocks = pl.cdiv(kv_valid, bk)
    g, d = q_ref.shape[2], q_ref.shape[3]
    q = (q_ref[0, 0] * scale).astype(jnp.bfloat16)  # (G, D)

    def _dma_start(blk):
        # min in 128-row units, multiplied after: provably tile-divisible
        return jnp.minimum(blk * (bk // 128), (s_max - bk) // 128) * 128

    def dmas(slot, blk):
        st = _dma_start(blk)
        return (
            pltpu.make_async_copy(k_hbm.at[bb, hh, pl.ds(st, bk), :], k_buf.at[slot], sems.at[0, slot]),
            pltpu.make_async_copy(v_hbm.at[bb, hh, pl.ds(st, bk), :], v_buf.at[slot], sems.at[1, slot]),
            pltpu.make_async_copy(ks_hbm.at[bb, hh, :, pl.ds(st, bk)], ks_buf.at[slot], sems.at[2, slot]),
            pltpu.make_async_copy(vs_hbm.at[bb, hh, :, pl.ds(st, bk)], vs_buf.at[slot], sems.at[3, slot]),
        )

    for c in dmas(0, 0):
        c.start()

    def body(i, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_blocks)
        def _prefetch():
            for c in dmas(nxt, i + 1):
                c.start()

        for c in dmas(slot, i):
            c.wait()

        kb = (unpack4_planar(k_buf[slot]) if bits4
              else k_buf[slot].astype(jnp.bfloat16))  # (BK, D)
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (G, BK)
        s = s * ks_buf[slot]  # fold per-token K scale into the score row

        k_pos = _dma_start(i) + jax.lax.broadcasted_iota(jnp.int32, (g, bk), 1)
        ok = jnp.logical_and(k_pos < kv_valid, k_pos >= kv_start)
        ok = jnp.logical_and(ok, k_pos >= i * bk)
        if window is not None:
            ok = jnp.logical_and(ok, k_pos > kv_valid - 1 - window)
        s = jnp.where(ok, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = (p * vs_buf[slot]).astype(jnp.bfloat16)  # fold V scale into probs
        vb = (unpack4_planar(v_buf[slot]) if bits4
              else v_buf[slot].astype(jnp.bfloat16))
        acc = acc * alpha + jax.lax.dot_general(
            pv, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    m0 = jnp.full((g, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((g, 1), jnp.float32)
    acc0 = jnp.zeros((g, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "window", "block_k", "interpret")
)
def decode_attention_quant(
    q: jax.Array,  # [B, 1, H, D]
    k: jax.Array,  # [B, H_kv, S, D] int8
    v: jax.Array,  # int8
    k_scale: jax.Array,  # [B, H_kv, S] f32
    v_scale: jax.Array,
    *,
    kv_valid_len=None,
    kv_start=None,
    scale: Optional[float] = None,
    window: Optional[int] = None,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    b, sq, h, d = q.shape
    assert sq == 1
    hkv, s_max = k.shape[1], k.shape[2]
    assert s_max % 128 == 0, "quant decode kernel needs max_len % 128 == 0"
    bits4 = k.dtype == jnp.uint8  # packed nibbles (planar along D): Quant4KVCache
    d_store = d // 2 if bits4 else d
    assert k.shape[3] == d_store, (k.shape, d, bits4)
    g = h // hkv
    if scale is None:
        scale = d**-0.5
    bk = min(block_k, s_max)
    if kv_valid_len is None:
        kv_valid_len = s_max
    if kv_start is None:
        kv_start = jnp.zeros((b,), jnp.int32)
    scalars = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(kv_valid_len, jnp.int32), (b,)),
        jnp.asarray(kv_start, jnp.int32).reshape(b),
    ])

    qg = q.reshape(b, hkv, g, d)
    # seq on the lane axis so scale slices DMA as (1, bk) 2-D tiles
    ks = k_scale.astype(jnp.float32)[:, :, None, :]  # [B, H, 1, S]
    vs = v_scale.astype(jnp.float32)[:, :, None, :]

    kernel = functools.partial(
        _decode_quant_kernel, scale=scale, window=window, bk=bk, s_max=s_max,
        n_b=b, bits4=bits4,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, g, d), lambda bb, hh: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda bb, hh: (bb, hh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bk, d_store), jnp.uint8 if bits4 else jnp.int8),
            pltpu.VMEM((2, bk, d_store), jnp.uint8 if bits4 else jnp.int8),
            pltpu.VMEM((2, 1, bk), jnp.float32),
            pltpu.VMEM((2, 1, bk), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 2)),
        ],
        interpret=interpret,
    )(scalars, qg, k, v, ks, vs)
    return out.reshape(b, 1, h, d)


@functools.partial(
    jax.jit, static_argnames=("scale", "window", "block_k", "interpret")
)
def decode_attention(
    q: jax.Array,  # [B, 1, H, D]
    k: jax.Array,  # [B, H_kv, S, D]
    v: jax.Array,
    *,
    kv_valid_len=None,
    kv_start=None,  # [B] first valid kv index per sequence (left-padding)
    scale: Optional[float] = None,
    window: Optional[int] = None,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    b, sq, h, d = q.shape
    assert sq == 1, "decode_attention is single-token; use flash_attention for prefill"
    hkv, s_max = k.shape[1], k.shape[2]
    assert s_max % 128 == 0, "decode kernel needs cache max_len % 128 == 0"
    g = h // hkv
    if scale is None:
        scale = d**-0.5
    bk = min(block_k, s_max)
    if kv_valid_len is None:
        kv_valid_len = s_max
    if kv_start is None:
        kv_start = jnp.zeros((b,), jnp.int32)
    scalars = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(kv_valid_len, jnp.int32), (b,)),
        jnp.asarray(kv_start, jnp.int32).reshape(b),
    ])

    qg = q.reshape(b, hkv, g, d)  # group-major query heads

    kernel = functools.partial(
        _decode_kernel, scale=scale, window=window, bk=bk, s_max=s_max, n_b=b
    )

    out = pl.pallas_call(
        kernel,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, g, d), lambda bb, hh: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda bb, hh: (bb, hh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bk, d), k.dtype),
            pltpu.VMEM((2, bk, d), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(scalars, qg, k, v)

    return out.reshape(b, 1, h, d)


def _decode_paged_kernel(
    scalars_ref,  # SMEM (B + B*MAXB,) int32: [kv_valid_0..B-1, table row-major]
    q_ref,  # VMEM (1, 1, G, D)
    k_hbm,  # HBM  (NB, H_kv, BS, D) — physical block pool
    v_hbm,  # HBM  (NB, H_kv, BS, D)
    o_ref,  # VMEM (1, 1, G, D)
    k_buf,  # scratch VMEM (2, BS, D)
    v_buf,
    sems,  # DMA semaphores (2, 2)
    *,
    scale: float,
    window: Optional[int],
    bs: int,
    maxb: int,
    n_b: int,
    n_blocks: int,
):
    """Paged decode attention: logical block i of sequence bb streams from
    physical pool block table[bb, i].  Same double-buffered DMA + online
    softmax as `_decode_kernel`; the only change is the indirection on the
    DMA source index (one SMEM lookup per block)."""
    bb = pl.program_id(0)
    hh = pl.program_id(1)
    kv_valid = scalars_ref[bb]
    n_log = pl.cdiv(kv_valid, bs)  # traced trip count (allocated prefix)
    g, d = q_ref.shape[2], q_ref.shape[3]
    q = q_ref[0, 0] * scale

    def _phys(blk):
        t = scalars_ref[n_b + bb * maxb + blk]
        return jnp.clip(t, 0, n_blocks - 1)  # unallocated never reached

    def k_dma(slot, blk):
        return pltpu.make_async_copy(
            k_hbm.at[_phys(blk), hh, :, :], k_buf.at[slot], sems.at[0, slot])

    def v_dma(slot, blk):
        return pltpu.make_async_copy(
            v_hbm.at[_phys(blk), hh, :, :], v_buf.at[slot], sems.at[1, slot])

    k_dma(0, 0).start()
    v_dma(0, 0).start()

    def body(i, carry):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < n_log)
        def _prefetch():
            k_dma(nxt, i + 1).start()
            v_dma(nxt, i + 1).start()

        k_dma(slot, i).wait()
        v_dma(slot, i).wait()

        kb = k_buf[slot]  # (BS, D)
        vb = v_buf[slot]
        s = jax.lax.dot_general(
            q.astype(kb.dtype), kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (G, BS)
        k_pos = i * bs + jax.lax.broadcasted_iota(jnp.int32, (g, bs), 1)
        ok = k_pos < kv_valid
        if window is not None:
            ok = jnp.logical_and(ok, k_pos > kv_valid - 1 - window)
        s = jnp.where(ok, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((g, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((g, 1), jnp.float32)
    acc0 = jnp.zeros((g, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_log, body, (m0, l0, acc0))
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def decode_attention_paged(
    q: jax.Array,  # [B, 1, H, D]
    k_pool: jax.Array,  # [NB, H_kv, BS, D]
    v_pool: jax.Array,
    table: jax.Array,  # [B, MAXB] int32 (-1 = unallocated)
    *,
    kv_valid_len=None,  # [B] per-slot valid lengths
    scale: Optional[float] = None,
    window: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """PagedAttention decode over the block pool (kv/cache.py PagedKVCache):
    HBM traffic is exactly the ALLOCATED prefix of each sequence — early
    exit at the valid length, indirection via the SMEM-resident table."""
    b, sq, h, d = q.shape
    assert sq == 1, "decode_attention_paged is single-token"
    nb, hkv, bs, _ = k_pool.shape
    maxb = table.shape[1]
    g = h // hkv
    if scale is None:
        scale = d**-0.5
    if kv_valid_len is None:
        kv_valid_len = jnp.full((b,), maxb * bs, jnp.int32)
    scalars = jnp.concatenate([
        jnp.broadcast_to(jnp.asarray(kv_valid_len, jnp.int32), (b,)),
        jnp.asarray(table, jnp.int32).reshape(b * maxb),
    ])

    qg = q.reshape(b, hkv, g, d)

    kernel = functools.partial(
        _decode_paged_kernel, scale=scale, window=window, bs=bs, maxb=maxb,
        n_b=b, n_blocks=nb)

    out = pl.pallas_call(
        kernel,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, g, d), lambda bb, hh: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda bb, hh: (bb, hh, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hkv, g, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, bs, d), k_pool.dtype),
            pltpu.VMEM((2, bs, d), v_pool.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(scalars, qg, k_pool, v_pool)

    return out.reshape(b, 1, h, d)
