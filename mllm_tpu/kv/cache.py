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

    def reset(self) -> "KVCache":
        """Reference `clear_kvcache` equivalent — just rewind the write head."""
        return KVCache(self.k, self.v, jnp.zeros((), jnp.int32))

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
