"""Functional KV cache.

TPU-native equivalent of the reference's CPUKVCache preallocated ring buffer
(/root/reference/mllm/backends/cpu/op/CPUKVCache.cpp:48-130, zero-copy append
:253-276): a preallocated `[L, B, H_kv, max_len, D]` array, appended to with
`lax.dynamic_update_slice` inside jit.  With buffer donation the update is
in-place — the functional twin of the reference's shallow-copy append.

Layout rationale (TPU): keeping the sequence axis *inner* (per head) makes the
decode-attention kernel stream K/V contiguously from HBM at full bandwidth;
(head_dim) stays the 128-lane axis.

Static shapes: `max_len` plays the role of the reference's `cache_limit`; the
current length is a traced scalar (`pos`), so prefill/decode never recompile
as the sequence grows.

Also implements the speculative-decoding rollback (`updateVerifiedKVCache`,
CPUKVCache.cpp:137-146) functionally: accepted draft tokens are compacted to
the cache head with a gather + dynamic_update_slice.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..nn.module import Module


class KVCache(Module):
    """Per-model cache: stacked per-layer K/V plus current length.

    k, v: [L, B, H_kv, max_len, D]
    pos:  [] int32 — number of valid cached tokens (same for all layers).
    """

    def __init__(self, k: jax.Array, v: jax.Array, pos: jax.Array):
        self.k = k
        self.v = v
        self.pos = pos

    @staticmethod
    def init(n_layers: int, batch: int, max_len: int, n_kv_heads: int, head_dim: int,
             dtype=jnp.bfloat16) -> "KVCache":
        shape = (n_layers, batch, n_kv_heads, max_len, head_dim)
        return KVCache(
            jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros((), jnp.int32)
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def n_layers(self) -> int:
        return self.k.shape[0]

    def update_layer(self, layer: int, k_new: jax.Array, v_new: jax.Array) -> "KVCache":
        """Append k_new/v_new [B, S, H_kv, D] at position self.pos for `layer`.

        Does NOT advance pos (all layers append at the same offset; call
        `advance` once per step).
        """
        kn = jnp.transpose(k_new, (0, 2, 1, 3))[None]  # [1, B, H, S, D]
        vn = jnp.transpose(v_new, (0, 2, 1, 3))[None]
        z = jnp.zeros((), jnp.int32)
        start = (jnp.asarray(layer, jnp.int32), z, z, self.pos, z)
        k = jax.lax.dynamic_update_slice(self.k, kn.astype(self.k.dtype), start)
        v = jax.lax.dynamic_update_slice(self.v, vn.astype(self.v.dtype), start)
        return KVCache(k, v, self.pos)

    def layer(self, layer: int):
        """Full-length K/V for one layer: ([B, H_kv, max_len, D], same)."""
        return self.k[layer], self.v[layer]

    def advance(self, n) -> "KVCache":
        return KVCache(self.k, self.v, self.pos + jnp.asarray(n, jnp.int32))

    def with_pos(self, pos) -> "KVCache":
        """Same storage, write head at `pos` (cache-type-generic)."""
        return KVCache(self.k, self.v, jnp.asarray(pos, jnp.int32))

    def reset(self) -> "KVCache":
        """Reference `clear_kvcache` equivalent — just rewind the write head."""
        return KVCache(self.k, self.v, jnp.zeros((), jnp.int32))

    def dtype_bytes(self) -> int:
        return self.k.dtype.itemsize

    def rollback_accept(self, draft_start, accept_idx: jax.Array, n_accept) -> "KVCache":
        """Speculative-decoding verification: keep only accepted draft entries.

        draft_start: position where the draft tokens were appended (traced ok).
        accept_idx:  [n_draft] int32 — for i < n_accept, index (relative to
                     draft_start) of the i-th accepted token; rest ignored.
        n_accept:    traced scalar — number of accepted tokens.

        Compacts accepted K/V entries to [draft_start, draft_start+n_accept)
        and sets pos accordingly (mirrors CPUKVCache::updateVerifiedKVCache).
        """
        n_draft = accept_idx.shape[0]
        i = jnp.arange(n_draft)
        src = draft_start + jnp.where(i < n_accept, accept_idx, 0)
        gathered_k = jnp.take(self.k, src, axis=3)  # [L, B, H, n_draft, D]
        gathered_v = jnp.take(self.v, src, axis=3)
        z = jnp.zeros((), jnp.int32)
        start = (z, z, z, jnp.asarray(draft_start, jnp.int32), z)
        k = jax.lax.dynamic_update_slice(self.k, gathered_k.astype(self.k.dtype), start)
        v = jax.lax.dynamic_update_slice(self.v, gathered_v.astype(self.v.dtype), start)
        return KVCache(k, v, jnp.asarray(draft_start + n_accept, jnp.int32))


def _slot_append(buf: jax.Array, layer: int, upd: jax.Array, pos: jax.Array) -> jax.Array:
    """Per-slot decode append: write upd[b] at buf[layer, b, :, pos[b], ...].

    Unrolled dynamic_update_slices instead of one batched scatter: XLA aliases
    DUS in place, while a scatter with per-row start indices materializes a
    copy of the whole cache buffer (measured +1.7 ms/step on the flagship
    28-layer cache, and a 70x slower compile).  B is small and static in the
    serving engine so the unroll is cheap.  Out-of-range pos clamps to the
    last row (scatter dropped instead) — only reachable for finished slots
    decoding out the window tail, whose rows are never read back because
    attention masks at kv_valid_len=pos and the engine rejects prompts at
    capacity (engine.py submit guard).
    """
    b = upd.shape[0]
    li, z = jnp.int32(layer), jnp.int32(0)
    for s in range(b):
        u = upd[s].reshape((1, 1, upd.shape[1], 1) + upd.shape[2:])
        starts = (li, jnp.int32(s), z, pos[s]) + (z,) * (buf.ndim - 4)
        buf = jax.lax.dynamic_update_slice(buf, u.astype(buf.dtype), starts)
    return buf


class SlotKVCache(Module):
    """Continuous-batching cache: per-SLOT write heads (pos is [B]).

    The serving engine admits a new request into a free slot while other
    slots keep decoding — the TPU-native analogue of slot/iteration-level
    scheduling in production LLM servers (no reference counterpart; the
    reference's batch path is lockstep, Module.cpp:146-205).  Decode appends
    one token per slot at its own head via per-slot in-place slice updates
    (`_slot_append`); admission
    copies a freshly prefilled single-sequence cache into the slot.
    """

    def __init__(self, k: jax.Array, v: jax.Array, pos: jax.Array):
        self.k = k
        self.v = v
        self.pos = pos  # [B] int32 per-slot valid lengths

    @staticmethod
    def init(n_layers: int, batch: int, max_len: int, n_kv_heads: int, head_dim: int,
             dtype=jnp.bfloat16) -> "SlotKVCache":
        shape = (n_layers, batch, n_kv_heads, max_len, head_dim)
        return SlotKVCache(
            jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
            jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def n_layers(self) -> int:
        return self.k.shape[0]

    def update_layer(self, layer: int, k_new: jax.Array, v_new: jax.Array) -> "SlotKVCache":
        """Decode append: k_new/v_new [B, 1, H_kv, D] written at pos[b] per slot."""
        k = _slot_append(self.k, layer, k_new[:, 0], self.pos)
        v = _slot_append(self.v, layer, v_new[:, 0], self.pos)
        return SlotKVCache(k, v, self.pos)

    def layer(self, layer: int):
        return self.k[layer], self.v[layer]

    def advance(self, n) -> "SlotKVCache":
        return SlotKVCache(self.k, self.v, self.pos + jnp.asarray(n, jnp.int32))

    def admit(self, slot, small: "KVCache", true_len) -> "SlotKVCache":
        """Copy a freshly prefilled 1-sequence cache into `slot` (traced ok)."""
        z = jnp.zeros((), jnp.int32)
        start = (z, jnp.asarray(slot, jnp.int32), z, z, z)
        k = jax.lax.dynamic_update_slice(self.k, small.k.astype(self.k.dtype), start)
        v = jax.lax.dynamic_update_slice(self.v, small.v.astype(self.v.dtype), start)
        pos = self.pos.at[slot].set(jnp.asarray(true_len, jnp.int32))
        return SlotKVCache(k, v, pos)

    def make_prefill_cache(self, batch: int, bucket: int, n_layers: int,
                           n_kv_heads: int, head_dim: int) -> "KVCache":
        """Small admission-prefill cache of the matching storage type."""
        return KVCache.init(n_layers, batch, bucket, n_kv_heads, head_dim, self.k.dtype)

    def admit_batch(self, slot_ids, small: "KVCache", true_lens, bucket: int) -> "SlotKVCache":
        """Scatter-install A prefilled sequences (rows with slot_ids >= B drop).

        Single advanced index among slices keeps its axis position:
        [L, A, H_kv, bucket, D] both sides."""
        k = self.k.at[:, slot_ids, :, :bucket, :].set(
            small.k.astype(self.k.dtype), mode="drop")
        v = self.v.at[:, slot_ids, :, :bucket, :].set(
            small.v.astype(self.v.dtype), mode="drop")
        pos = self.pos.at[slot_ids].set(true_lens, mode="drop")
        return SlotKVCache(k, v, pos)


class QuantKVCache(Module):
    """int8 KV cache with per-(token, head) vector scales.

    Counterpart of the reference's q8_0 KV-cache dtype (KVCache_TYPE,
    /root/reference/mllm/Types.hpp:26-33, op/CPUKVCacheSage): halves cache
    memory vs bf16 (2x longer contexts per chip) at per-vector int8 fidelity.

    k, v:          int8 [L, B, H_kv, max_len, D]
    k_scale, v_scale: f32 [L, B, H_kv, max_len]
    pos:           [] int32
    """

    def __init__(self, k, v, k_scale, v_scale, pos):
        self.k = k
        self.v = v
        self.k_scale = k_scale
        self.v_scale = v_scale
        self.pos = pos

    @staticmethod
    def init(n_layers: int, batch: int, max_len: int, n_kv_heads: int, head_dim: int,
             dtype=None) -> "QuantKVCache":
        max_len = -(-max_len // 128) * 128  # fused decode kernel tile alignment
        shape = (n_layers, batch, n_kv_heads, max_len, head_dim)
        sshape = shape[:-1]
        return QuantKVCache(
            jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
            jnp.ones(sshape, jnp.float32), jnp.ones(sshape, jnp.float32),
            jnp.zeros((), jnp.int32),
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def n_layers(self) -> int:
        return self.k.shape[0]

    @staticmethod
    def _quantize(x):
        """[B, H, S, D] float -> (int8, scale [B, H, S])."""
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
        return q, scale

    def update_layer(self, layer: int, k_new: jax.Array, v_new: jax.Array) -> "QuantKVCache":
        kn = jnp.transpose(k_new, (0, 2, 1, 3))  # [B, H, S, D]
        vn = jnp.transpose(v_new, (0, 2, 1, 3))
        kq, ks = self._quantize(kn)
        vq, vs = self._quantize(vn)
        z = jnp.zeros((), jnp.int32)
        li = jnp.asarray(layer, jnp.int32)
        k = jax.lax.dynamic_update_slice(self.k, kq[None], (li, z, z, self.pos, z))
        v = jax.lax.dynamic_update_slice(self.v, vq[None], (li, z, z, self.pos, z))
        ksc = jax.lax.dynamic_update_slice(self.k_scale, ks[None], (li, z, z, self.pos))
        vsc = jax.lax.dynamic_update_slice(self.v_scale, vs[None], (li, z, z, self.pos))
        return QuantKVCache(k, v, ksc, vsc, self.pos)

    def layer(self, layer: int):
        """Dequantized K/V for one layer: ([B, H_kv, max_len, D] bf16, same)."""
        k = (self.k[layer].astype(jnp.bfloat16)
             * self.k_scale[layer][..., None].astype(jnp.bfloat16))
        v = (self.v[layer].astype(jnp.bfloat16)
             * self.v_scale[layer][..., None].astype(jnp.bfloat16))
        return k, v

    def advance(self, n) -> "QuantKVCache":
        return QuantKVCache(self.k, self.v, self.k_scale, self.v_scale,
                            self.pos + jnp.asarray(n, jnp.int32))

    def with_pos(self, pos) -> "QuantKVCache":
        return QuantKVCache(self.k, self.v, self.k_scale, self.v_scale,
                            jnp.asarray(pos, jnp.int32))

    def layer_quant(self, layer: int):
        """Raw int8 K/V + scales for the fused decode kernel:
        (k int8 [B,H,S,D], v int8, k_scale f32 [B,H,S], v_scale f32)."""
        return self.k[layer], self.v[layer], self.k_scale[layer], self.v_scale[layer]

    def reset(self) -> "QuantKVCache":
        return QuantKVCache(self.k, self.v, self.k_scale, self.v_scale,
                            jnp.zeros((), jnp.int32))

    def rollback_accept(self, draft_start, accept_idx: jax.Array, n_accept) -> "QuantKVCache":
        """Speculative-decoding verification over the int8 cache: compact the
        accepted draft K/V (and their per-vector scales) to the cache head.
        Same semantics as KVCache.rollback_accept."""
        n_draft = accept_idx.shape[0]
        i = jnp.arange(n_draft)
        src = draft_start + jnp.where(i < n_accept, accept_idx, 0)
        z = jnp.zeros((), jnp.int32)
        start = (z, z, z, jnp.asarray(draft_start, jnp.int32), z)
        sstart = start[:-1]
        k = jax.lax.dynamic_update_slice(self.k, jnp.take(self.k, src, axis=3), start)
        v = jax.lax.dynamic_update_slice(self.v, jnp.take(self.v, src, axis=3), start)
        ks = jax.lax.dynamic_update_slice(self.k_scale, jnp.take(self.k_scale, src, axis=3), sstart)
        vs = jax.lax.dynamic_update_slice(self.v_scale, jnp.take(self.v_scale, src, axis=3), sstart)
        return QuantKVCache(k, v, ks, vs, jnp.asarray(draft_start + n_accept, jnp.int32))


class Quant4KVCache(Module):
    """int4 KV cache with per-(token, head) vector scales — 4x bf16 context
    per chip.  Beyond the reference's q8 KV floor (Types.hpp:26-33); per
    the int4-KV-cache literature, per-vector 4-bit K/V keeps decode usable
    while quartering cache HBM and bandwidth.

    Packing is planar along head_dim: byte j of a vector holds d=j (low
    nibble) and d=j+D/2 (high), both excess-8 — the kernels' unpack is an
    order-preserving concat (ops/decode_attention.unpack4_planar).

    k, v:             uint8 [L, B, H_kv, max_len, D/2]
    k_scale, v_scale: f32   [L, B, H_kv, max_len]
    pos:              [] int32
    """

    def __init__(self, k, v, k_scale, v_scale, pos):
        self.k = k
        self.v = v
        self.k_scale = k_scale
        self.v_scale = v_scale
        self.pos = pos

    @staticmethod
    def init(n_layers: int, batch: int, max_len: int, n_kv_heads: int, head_dim: int,
             dtype=None) -> "Quant4KVCache":
        assert head_dim % 2 == 0
        max_len = -(-max_len // 128) * 128  # fused decode kernel tile alignment
        shape = (n_layers, batch, n_kv_heads, max_len, head_dim // 2)
        sshape = shape[:-1]
        # 0x88 packs excess-8 zeros (v=0 -> q=8) so untouched slots dequant to 0
        return Quant4KVCache(
            jnp.full(shape, 0x88, jnp.uint8), jnp.full(shape, 0x88, jnp.uint8),
            jnp.ones(sshape, jnp.float32), jnp.ones(sshape, jnp.float32),
            jnp.zeros((), jnp.int32),
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def n_layers(self) -> int:
        return self.k.shape[0]

    @staticmethod
    def _quantize(x):
        """[B, H, S, D] float -> (packed uint8 [B, H, S, D/2], scale [B, H, S])."""
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=-1)
        scale = jnp.where(amax > 0, amax / 7.0, 1.0)
        q = (jnp.clip(jnp.round(xf / scale[..., None]), -8, 7) + 8).astype(jnp.uint8)
        d = x.shape[-1]
        return q[..., : d // 2] | (q[..., d // 2 :] << 4), scale

    @staticmethod
    def _dequant(packed, scale):
        """(uint8 [..., S, D/2], f32 [..., S]) -> bf16 [..., S, D]."""
        from ..ops.decode_attention import unpack4_planar

        # single source of truth for the nibble layout: the kernel-side unpack
        return unpack4_planar(packed) * scale[..., None].astype(jnp.bfloat16)

    def update_layer(self, layer: int, k_new: jax.Array, v_new: jax.Array) -> "Quant4KVCache":
        kn = jnp.transpose(k_new, (0, 2, 1, 3))  # [B, H, S, D]
        vn = jnp.transpose(v_new, (0, 2, 1, 3))
        kq, ks = self._quantize(kn)
        vq, vs = self._quantize(vn)
        z = jnp.zeros((), jnp.int32)
        li = jnp.asarray(layer, jnp.int32)
        k = jax.lax.dynamic_update_slice(self.k, kq[None], (li, z, z, self.pos, z))
        v = jax.lax.dynamic_update_slice(self.v, vq[None], (li, z, z, self.pos, z))
        ksc = jax.lax.dynamic_update_slice(self.k_scale, ks[None], (li, z, z, self.pos))
        vsc = jax.lax.dynamic_update_slice(self.v_scale, vs[None], (li, z, z, self.pos))
        return Quant4KVCache(k, v, ksc, vsc, self.pos)

    def layer(self, layer: int):
        """Dequantized K/V for one layer: ([B, H_kv, max_len, D] bf16, same)."""
        return (self._dequant(self.k[layer], self.k_scale[layer]),
                self._dequant(self.v[layer], self.v_scale[layer]))

    def layer_quant(self, layer: int):
        """Raw packed K/V + scales for the fused kernels:
        (k uint8 [B,H,S,D/2], v uint8, k_scale f32 [B,H,S], v_scale f32)."""
        return self.k[layer], self.v[layer], self.k_scale[layer], self.v_scale[layer]

    def advance(self, n) -> "Quant4KVCache":
        return Quant4KVCache(self.k, self.v, self.k_scale, self.v_scale,
                             self.pos + jnp.asarray(n, jnp.int32))

    def with_pos(self, pos) -> "Quant4KVCache":
        return Quant4KVCache(self.k, self.v, self.k_scale, self.v_scale,
                             jnp.asarray(pos, jnp.int32))

    def reset(self) -> "Quant4KVCache":
        return Quant4KVCache(self.k, self.v, self.k_scale, self.v_scale,
                             jnp.zeros((), jnp.int32))

    def rollback_accept(self, draft_start, accept_idx: jax.Array, n_accept) -> "Quant4KVCache":
        """Speculative-decoding verification over the int4 cache (same
        semantics as KVCache.rollback_accept; packed bytes move as-is)."""
        n_draft = accept_idx.shape[0]
        i = jnp.arange(n_draft)
        src = draft_start + jnp.where(i < n_accept, accept_idx, 0)
        z = jnp.zeros((), jnp.int32)
        start = (z, z, z, jnp.asarray(draft_start, jnp.int32), z)
        sstart = start[:-1]
        k = jax.lax.dynamic_update_slice(self.k, jnp.take(self.k, src, axis=3), start)
        v = jax.lax.dynamic_update_slice(self.v, jnp.take(self.v, src, axis=3), start)
        ks = jax.lax.dynamic_update_slice(self.k_scale, jnp.take(self.k_scale, src, axis=3), sstart)
        vs = jax.lax.dynamic_update_slice(self.v_scale, jnp.take(self.v_scale, src, axis=3), sstart)
        return Quant4KVCache(k, v, ks, vs, jnp.asarray(draft_start + n_accept, jnp.int32))


class PagedKVCache(Module):
    """Paged (block-table) continuous-batching cache — vLLM-style
    PagedAttention realized TPU-natively.

    K/V live in a shared physical pool of BS-token blocks; each slot maps
    logical block i -> physical block via its table row.  HBM is allocated
    by DEMAND (ceil((prompt+budget)/BS) blocks per request, reserved at
    admission by the engine's free-list) instead of max_len x slots — short
    requests stop paying for the longest request's context.  Static shapes
    throughout: the pool, tables, and per-slot heads never change shape, so
    the decode program never recompiles.

    k, v:   [L, NB, H_kv, BS, D]   physical pool
    table:  [B, MAXB] int32        physical block per logical block (-1 free)
    pos:    [B] int32              per-slot write heads (token positions)

    BS = 128 matches the fused decode kernel's DMA chunk, so the paged
    kernel streams one block per grid step with the same double-buffered
    pipeline as the dense kernel (ops/decode_attention.py).  No reference
    counterpart (single-sequence ring cache, op/CPUKVCache.cpp).
    """

    BS = 128

    def __init__(self, k, v, table, pos):
        self.k = k
        self.v = v
        self.table = table
        self.pos = pos

    @staticmethod
    def init(n_layers: int, batch: int, max_len: int, n_kv_heads: int,
             head_dim: int, dtype=jnp.bfloat16, n_blocks: int = 0) -> "PagedKVCache":
        """max_len: per-slot LOGICAL capacity (table width = max_len/BS).
        n_blocks: physical pool size; default = half of batch*max_len/BS
        (the capacity win vs a dense SlotKVCache)."""
        bs = PagedKVCache.BS
        max_len = -(-max_len // bs) * bs
        maxb = max_len // bs
        if n_blocks <= 0:
            n_blocks = max(batch * maxb // 2, maxb)
        shape = (n_layers, n_blocks, n_kv_heads, bs, head_dim)
        return PagedKVCache(
            jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
            jnp.full((batch, maxb), -1, jnp.int32),
            jnp.zeros((batch,), jnp.int32))

    @property
    def max_len(self) -> int:
        return self.table.shape[1] * self.BS

    @property
    def n_layers(self) -> int:
        return self.k.shape[0]

    @property
    def n_blocks(self) -> int:
        return self.k.shape[1]

    def _phys(self, logical):
        """[B] physical block of each slot's `logical` block; unallocated ->
        n_blocks (dropped by scatter mode='drop')."""
        p = jnp.take_along_axis(self.table, logical[:, None], axis=1)[:, 0]
        return jnp.where(p < 0, self.n_blocks, p)

    def update_layer(self, layer: int, k_new: jax.Array, v_new: jax.Array) -> "PagedKVCache":
        """Decode append: k_new/v_new [B, 1, H_kv, D] at each slot's head."""
        phys = self._phys(self.pos // self.BS)
        row = self.pos % self.BS
        kn = k_new[:, 0].astype(self.k.dtype)  # [B, H, D]
        vn = v_new[:, 0].astype(self.v.dtype)
        k = self.k.at[layer, phys, :, row, :].set(kn, mode="drop")
        v = self.v.at[layer, phys, :, row, :].set(vn, mode="drop")
        return PagedKVCache(k, v, self.table, self.pos)

    def layer(self, layer: int):
        """Gathered dense view [B, H, MAXB*BS, D] (XLA fallback path; the
        TPU decode path streams blocks directly via the paged kernel)."""
        b, maxb = self.table.shape
        idx = jnp.clip(self.table, 0, self.n_blocks - 1)  # [B, MAXB]
        g = self.k[layer][idx]  # [B, MAXB, H, BS, D]
        gv = self.v[layer][idx]
        h, d = g.shape[2], g.shape[4]
        k = jnp.transpose(g, (0, 2, 1, 3, 4)).reshape(b, h, maxb * self.BS, d)
        v = jnp.transpose(gv, (0, 2, 1, 3, 4)).reshape(b, h, maxb * self.BS, d)
        return k, v

    def advance(self, n) -> "PagedKVCache":
        return PagedKVCache(self.k, self.v, self.table, self.pos + jnp.asarray(n, jnp.int32))

    def make_prefill_cache(self, batch: int, bucket: int, n_layers: int,
                           n_kv_heads: int, head_dim: int) -> "KVCache":
        return KVCache.init(n_layers, batch, bucket, n_kv_heads, head_dim, self.k.dtype)

    def admit(self, slot, small: "KVCache", true_len) -> "PagedKVCache":
        """Scatter a prefilled contiguous small cache into this slot's
        blocks (the engine reserved them in `table[slot]` before admit)."""
        l, _, h, bucket, d = small.k.shape
        if bucket % self.BS:  # admission buckets smaller than a block: pad up
            pad = -bucket % self.BS
            small = KVCache(jnp.pad(small.k, ((0, 0),) * 3 + ((0, pad), (0, 0))),
                            jnp.pad(small.v, ((0, 0),) * 3 + ((0, pad), (0, 0))),
                            small.pos)
            bucket += pad
        nbk = bucket // self.BS
        row = jax.lax.dynamic_slice_in_dim(self.table, slot, 1, axis=0)[0]  # [MAXB]
        phys = jnp.where(row[:nbk] < 0, self.n_blocks, row[:nbk])  # [nbk]
        ks = jnp.transpose(small.k[:, 0].reshape(l, h, nbk, self.BS, d),
                           (0, 2, 1, 3, 4))  # [L, nbk, H, BS, D]
        vs = jnp.transpose(small.v[:, 0].reshape(l, h, nbk, self.BS, d),
                           (0, 2, 1, 3, 4))
        k = self.k.at[:, phys].set(ks.astype(self.k.dtype), mode="drop")
        v = self.v.at[:, phys].set(vs.astype(self.v.dtype), mode="drop")
        pos = self.pos.at[slot].set(jnp.asarray(true_len, jnp.int32))
        return PagedKVCache(k, v, self.table, pos)

    def admit_batch(self, slot_ids, small: "KVCache", true_lens, bucket: int) -> "PagedKVCache":
        """Scatter-install A prefilled sequences into their slots' blocks."""
        l, a, h, _, d = small.k.shape
        if bucket % self.BS:
            pad = -bucket % self.BS
            small = KVCache(jnp.pad(small.k, ((0, 0),) * 3 + ((0, pad), (0, 0))),
                            jnp.pad(small.v, ((0, 0),) * 3 + ((0, pad), (0, 0))),
                            small.pos)
            bucket += pad
        nbk = bucket // self.BS
        rows = self.table.at[jnp.clip(slot_ids, 0, self.table.shape[0] - 1)].get()
        phys = jnp.where(rows[:, :nbk] < 0, self.n_blocks, rows[:, :nbk])  # [A, nbk]
        pad = slot_ids >= self.table.shape[0]
        phys = jnp.where(pad[:, None], self.n_blocks, phys)
        ks = jnp.transpose(small.k[:, :, :, :bucket].reshape(l, a, h, nbk, self.BS, d),
                           (0, 1, 3, 2, 4, 5))  # [L, A, nbk, H, BS, D]
        vs = jnp.transpose(small.v[:, :, :, :bucket].reshape(l, a, h, nbk, self.BS, d),
                           (0, 1, 3, 2, 4, 5))
        k = self.k.at[:, phys].set(ks.astype(self.k.dtype), mode="drop")
        v = self.v.at[:, phys].set(vs.astype(self.v.dtype), mode="drop")
        pos = self.pos.at[slot_ids].set(true_lens, mode="drop")
        return PagedKVCache(k, v, self.table, pos)

    def with_tables(self, table: np.ndarray) -> "PagedKVCache":
        """Host-side allocator update (eager, between programs)."""
        return PagedKVCache(self.k, self.v, jnp.asarray(table, jnp.int32), self.pos)


class SlotQuantKVCache(Module):
    """Continuous-batching cache with quantized K/V (int8 or int4 packed).

    SlotKVCache's per-slot write heads + Quant(4)KVCache's storage: the
    serving engine holds 2x (int8) / 4x (int4) the context per chip and
    decode streams through the fused quant attention kernel.  `bits` is
    static metadata (part of the jit cache key).

    k, v:             int8 [L,B,H,S,D] (bits=8) or uint8 [L,B,H,S,D/2] (bits=4)
    k_scale, v_scale: f32 [L,B,H,S]
    pos:              [B] int32 per-slot valid lengths
    """

    def __init__(self, k, v, k_scale, v_scale, pos, bits: int = 8):
        self.k = k
        self.v = v
        self.k_scale = k_scale
        self.v_scale = v_scale
        self.pos = pos
        self.bits = bits

    @staticmethod
    def init(n_layers: int, batch: int, max_len: int, n_kv_heads: int, head_dim: int,
             bits: int = 8) -> "SlotQuantKVCache":
        max_len = -(-max_len // 128) * 128
        d_store = head_dim // 2 if bits == 4 else head_dim
        shape = (n_layers, batch, n_kv_heads, max_len, d_store)

        def fill():  # distinct buffers: k/v must not alias (donation)
            return (jnp.full(shape, 0x88, jnp.uint8) if bits == 4
                    else jnp.zeros(shape, jnp.int8))

        return SlotQuantKVCache(
            fill(), fill(), jnp.ones(shape[:-1], jnp.float32),
            jnp.ones(shape[:-1], jnp.float32), jnp.zeros((batch,), jnp.int32), bits)

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    @property
    def n_layers(self) -> int:
        return self.k.shape[0]

    def _q(self, x):
        return (Quant4KVCache._quantize(x) if self.bits == 4
                else QuantKVCache._quantize(x))

    def update_layer(self, layer: int, k_new: jax.Array, v_new: jax.Array) -> "SlotQuantKVCache":
        """Decode append: k_new/v_new [B, 1, H_kv, D] at pos[b] per slot."""
        kq, ks = self._q(k_new[:, None, 0])  # [B, 1(H-pos), H, D] -> quantize over D
        vq, vs = self._q(v_new[:, None, 0])
        # _quantize expects [B, H, S, D]; we fed [B, 1, H, D] so the output is
        # [B, 1, H, D'] / [B, 1, H]: drop the singleton and scatter
        kq, ks = kq[:, 0], ks[:, 0]  # [B, H, D'], [B, H]
        vq, vs = vq[:, 0], vs[:, 0]
        k = _slot_append(self.k, layer, kq, self.pos)
        v = _slot_append(self.v, layer, vq, self.pos)
        ksc = _slot_append(self.k_scale, layer, ks, self.pos)
        vsc = _slot_append(self.v_scale, layer, vs, self.pos)
        return SlotQuantKVCache(k, v, ksc, vsc, self.pos, self.bits)

    def layer(self, layer: int):
        deq = Quant4KVCache._dequant if self.bits == 4 else None
        if deq is not None:
            return (deq(self.k[layer], self.k_scale[layer]),
                    deq(self.v[layer], self.v_scale[layer]))
        k = (self.k[layer].astype(jnp.bfloat16)
             * self.k_scale[layer][..., None].astype(jnp.bfloat16))
        v = (self.v[layer].astype(jnp.bfloat16)
             * self.v_scale[layer][..., None].astype(jnp.bfloat16))
        return k, v

    def layer_quant(self, layer: int):
        return self.k[layer], self.v[layer], self.k_scale[layer], self.v_scale[layer]

    def advance(self, n) -> "SlotQuantKVCache":
        return SlotQuantKVCache(self.k, self.v, self.k_scale, self.v_scale,
                                self.pos + jnp.asarray(n, jnp.int32), self.bits)

    def make_prefill_cache(self, batch: int, bucket: int, n_layers: int,
                           n_kv_heads: int, head_dim: int):
        """Small single/multi-sequence cache of the matching quant type for
        admission prefill (bucket must be a 128-multiple)."""
        cls = Quant4KVCache if self.bits == 4 else QuantKVCache
        return cls.init(n_layers, batch, bucket, n_kv_heads, head_dim)

    def admit(self, slot, small, true_len) -> "SlotQuantKVCache":
        """Copy a freshly prefilled quantized 1-sequence cache into `slot`."""
        z = jnp.zeros((), jnp.int32)
        start = (z, jnp.asarray(slot, jnp.int32), z, z, z)
        k = jax.lax.dynamic_update_slice(self.k, small.k, start)
        v = jax.lax.dynamic_update_slice(self.v, small.v, start)
        ks = jax.lax.dynamic_update_slice(self.k_scale, small.k_scale, start[:-1])
        vs = jax.lax.dynamic_update_slice(self.v_scale, small.v_scale, start[:-1])
        pos = self.pos.at[slot].set(jnp.asarray(true_len, jnp.int32))
        return SlotQuantKVCache(k, v, ks, vs, pos, self.bits)

    def admit_batch(self, slot_ids, small, true_lens, bucket: int) -> "SlotQuantKVCache":
        """Scatter-install A prefilled sequences (rows with slot_ids >= B drop)."""
        k = self.k.at[:, slot_ids, :, :bucket, :].set(small.k[:, :, :, :bucket, :], mode="drop")
        v = self.v.at[:, slot_ids, :, :bucket, :].set(small.v[:, :, :, :bucket, :], mode="drop")
        ks = self.k_scale.at[:, slot_ids, :, :bucket].set(
            small.k_scale[:, :, :, :bucket], mode="drop")
        vs = self.v_scale.at[:, slot_ids, :, :bucket].set(
            small.v_scale[:, :, :, :bucket], mode="drop")
        pos = self.pos.at[slot_ids].set(true_lens, mode="drop")
        return SlotQuantKVCache(k, v, ks, vs, pos, self.bits)
