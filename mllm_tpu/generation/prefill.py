"""Chunked prefill + prompt (prefix) cache.

Chunked prefill is the TPU-native form of the reference's chunked-prefill
pipeline (/root/reference/mllm/Parallel.hpp:14-113, demo_qwen_npu_pipeline):
one compiled chunk-forward serves any prompt length — on TPU the XLA
scheduler already overlaps the chunk DMA/compute, replacing the reference's
2-thread OMP pipeline.

The prompt cache provides prefix reuse across requests (the north-star
"prompt cache" feature): KV states of previously-seen prompt prefixes are
kept (LRU) and decode/prefill resumes after the longest matching prefix.
"""

from __future__ import annotations

import functools
from collections import OrderedDict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kv.cache import KVCache


@functools.partial(jax.jit, donate_argnames=("cache",))
def _chunk_step(model, cache: KVCache, chunk_ids, last_idx):
    """Run one prompt chunk; logits are taken at position `last_idx` (traced)
    within the chunk, so the final (padded) chunk yields the true last token's
    logits directly — no tail-correction step or cache rewind needed."""
    hidden, cache = model.hidden_states(chunk_ids, cache)
    last = jax.lax.dynamic_slice_in_dim(hidden, last_idx, 1, axis=1)
    logits = model.logits(last)
    return logits[:, 0, :], cache


def chunked_prefill(model, cache: KVCache, input_ids: np.ndarray, true_len: int,
                    chunk: int = 256):
    """Prefill `input_ids[:, :true_len]` in fixed-size chunks.

    One compiled program per chunk size (not per prompt length). Returns
    (logits at the true last token, cache with pos == true_len).
    """
    ids = np.asarray(input_ids, np.int32)
    b, s = ids.shape
    start_pos = int(cache.pos)  # host copy BEFORE donation frees the buffer
    n_chunks = -(-true_len // chunk)
    padded_len = n_chunks * chunk
    if padded_len > s:
        ids = np.concatenate([ids, np.zeros((b, padded_len - s), np.int32)], axis=1)
    logits = None
    for c in range(n_chunks):
        piece = jnp.asarray(ids[:, c * chunk : (c + 1) * chunk])
        last_idx = min(true_len - 1 - c * chunk, chunk - 1)
        logits, cache = _chunk_step(model, cache, piece, jnp.asarray(last_idx, jnp.int32))
    # cache.pos advanced by n_chunks*chunk; rewind the padding slack
    cache = cache.with_pos(start_pos + true_len)
    return logits, cache


@functools.partial(jax.jit, donate_argnames=("cache",))
def _chunk_step_single(model, cache: KVCache, tok):
    logits, cache = model(tok, cache, last_only=True)
    return logits[:, 0, :] if logits.ndim == 3 else logits, cache


class PromptCache:
    """LRU prefix cache of KV states keyed by token prefixes.

    `lookup` returns the longest cached prefix of `ids` (a *copy* of its KV
    state so the cached entry stays reusable); `store` snapshots a prefix.
    """

    def __init__(self, max_entries: int = 4):
        self.max_entries = max_entries
        self._entries: OrderedDict[tuple, KVCache] = OrderedDict()

    def store(self, ids, cache: KVCache, length: Optional[int] = None):
        key = tuple(int(t) for t in np.asarray(ids).reshape(-1)[: length or None])
        if length is not None:
            key = key[:length]
        # deep copy: the caller will donate its cache buffers into decode steps
        # (tree.map keeps this generic over KVCache / QuantKVCache)
        self._entries[key] = jax.tree.map(jnp.copy, cache)
        self._entries.move_to_end(key)
        while len(self._entries) > self.max_entries:
            self._entries.popitem(last=False)

    def lookup_raw(self, ids) -> tuple[Optional[KVCache], int]:
        """Longest cached prefix WITHOUT copying (caller must not donate the
        returned pytree's buffers — slice or copy first)."""
        seq = tuple(int(t) for t in np.asarray(ids).reshape(-1))
        best_key = None
        for key in self._entries:
            if len(key) <= len(seq) and seq[: len(key)] == key:
                if best_key is None or len(key) > len(best_key):
                    best_key = key
        if best_key is None:
            return None, 0
        self._entries.move_to_end(best_key)
        return self._entries[best_key], len(best_key)

    def lookup(self, ids) -> tuple[Optional[KVCache], int]:
        c, matched = self.lookup_raw(ids)
        if c is None:
            return None, 0
        # copy so the cached entry survives donation by the caller
        return jax.tree.map(jnp.copy, c), matched

    def lookup_common(self, ids) -> tuple[Optional[KVCache], int]:
        """Entry with the longest token-level COMMON prefix with `ids` (the
        stored prompt need not be a full prefix of the new one — serving-
        style automatic prefix caching: 'system prompt + different question'
        matches through the shared system prompt).  No copy — callers must
        slice/copy before donating."""
        seq = tuple(int(t) for t in np.asarray(ids).reshape(-1))
        best_key, best_n = None, 0
        for key in self._entries:
            n = 0
            for a, b in zip(key, seq):
                if a != b:
                    break
                n += 1
            if n > best_n:
                best_key, best_n = key, n
        if best_key is None:
            return None, 0
        self._entries.move_to_end(best_key)
        return self._entries[best_key], best_n

    def lookup_prefix_rows(self, ids, m: int) -> Optional[KVCache]:
        """First `m` KV rows of the best common-prefix entry, as fresh
        buffers with pos == m (donation-safe) — the serving engine's
        prefix-reuse fetch.  Returns None if no entry shares >= m tokens."""
        c, common = self.lookup_common(ids)
        if c is None or common < m:
            return None

        def trunc(a):
            if getattr(a, "ndim", 0) < 4:
                return a
            return jax.lax.slice_in_dim(a, 0, min(m, a.shape[3]), axis=3)

        return jax.tree.map(trunc, c).with_pos(m)

    def __len__(self):
        return len(self._entries)


def prefill_with_prompt_cache(model, cache: KVCache, input_ids: np.ndarray,
                              true_len: int, pcache: PromptCache, chunk: int = 256,
                              store: bool = True):
    """Prefix-cache-aware prefill: reuse the longest cached prefix, prefill
    only the suffix, optionally store the full prompt state."""
    ids = np.asarray(input_ids, np.int32)
    hit, matched = pcache.lookup(ids[0, :true_len])
    if hit is not None and matched > 0:
        cache = hit
        if matched == true_len:  # full hit: recompute last-token logits
            cache = cache.with_pos(true_len - 1)
            logits, cache = _chunk_step_single(model, cache, jnp.asarray(ids[:, true_len - 1 : true_len]))
            return logits, cache, matched
        suffix = ids[:, matched:true_len]
        logits, cache = chunked_prefill(model, cache, suffix, true_len - matched, chunk)
    else:
        logits, cache = chunked_prefill(model, cache, ids, true_len, chunk)
        matched = 0
    if store:
        pcache.store(ids[0, :true_len], cache)
    return logits, cache, matched
