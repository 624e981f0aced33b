"""Generation loops.

TPU-native counterpart of `Module::generate` (/root/reference/mllm/Module.cpp:63-100):
two jitted programs — a bucketed prefill and a single-token decode step — share
the KV-cache pytree (mirroring the reference's two-model prefill/decode design,
SURVEY.md §2.3) with donated buffers so cache appends are in-place.

Two drivers:
  - `generate`          : streaming host loop with a per-token callback
                          (reference callback semantics, demo_qwen.cpp:80-86).
  - `generate_compiled` : fully on-device `lax.while_loop` (sampling included);
                          zero host syncs per token — this is the benchmark path.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kv.cache import KVCache
from .sampling import SamplingConfig, sample_token


def pad_to_bucket(ids: np.ndarray, multiple: int = 128, pad_id: int = 0) -> np.ndarray:
    """Pad prompt (at the end) to a bucketed length so prefill compiles once
    per bucket (the reference's QNN chunk-padding discipline, SURVEY.md §7)."""
    s = ids.shape[-1]
    target = max(multiple, -(-s // multiple) * multiple)
    if target == s:
        return ids
    pad = np.full(ids.shape[:-1] + (target - s,), pad_id, dtype=ids.dtype)
    return np.concatenate([ids, pad], axis=-1)


def _prefill_inner(model, cache: KVCache, input_ids, true_len: int):
    """Unjitted prefill body — composes into larger single programs (e.g.
    prefill + on-device sample in one dispatch)."""
    hidden, cache = model.hidden_states(input_ids, cache)
    last = hidden[:, true_len - 1 : true_len, :]
    logits = model.logits(last)
    cache = cache.with_pos(true_len)
    return logits[:, 0, :], cache


@functools.partial(jax.jit, static_argnames=("true_len",), donate_argnames=("cache",))
def _prefill(model, cache: KVCache, input_ids, true_len: int):
    """Run padded prompt; logits taken at the true last token; cache.pos set to
    true_len so decode overwrites the padding slack."""
    return _prefill_inner(model, cache, input_ids, true_len)


@functools.partial(jax.jit, donate_argnames=("cache",))
def _decode_step(model, cache: KVCache, token):
    logits, cache = model(token[:, None], cache, last_only=True)
    return logits[:, 0, :], cache


def _decode_step_inner(model, cache, token):
    logits, cache = model(token[:, None], cache, last_only=True)
    return logits[:, 0, :], cache


@dataclass
class GenerationResult:
    tokens: list[int]
    ttft_s: float = 0.0
    prefill_tps: float = 0.0
    decode_tps: float = 0.0


def generate(
    model,
    input_ids: np.ndarray,  # [B, S] int32
    cache: KVCache,
    cfg: SamplingConfig,
    *,
    eos_token_id=None,
    callback: Optional[Callable[[int], bool]] = None,
    seed: int = 0,
    bucket: int = 128,
):
    """Streaming generation (batch 1 semantics for the callback)."""
    input_ids = np.asarray(input_ids, np.int32)
    if input_ids.ndim == 1:
        input_ids = input_ids[None]
    true_len = input_ids.shape[1]
    padded = jnp.asarray(pad_to_bucket(input_ids, bucket))

    eos = eos_token_id
    if eos is None:
        e = model.cfg.eos_token_id
        eos = set(e) if isinstance(e, (tuple, list)) else {e}
    elif isinstance(eos, int):
        eos = {eos}

    key = jax.random.PRNGKey(seed)
    t0 = time.perf_counter()
    logits, cache = _prefill(model, cache, padded, true_len)
    tok = sample_token(key, logits, cfg)
    first = int(tok[0])
    t1 = time.perf_counter()

    out = [first]
    if callback is not None and callback(first) is False:
        return GenerationResult(out, ttft_s=t1 - t0), cache
    if first in eos and len(out) >= cfg.min_new_tokens:
        return GenerationResult(out, ttft_s=t1 - t0, prefill_tps=true_len / (t1 - t0)), cache

    td0 = time.perf_counter()
    for i in range(cfg.max_new_tokens - 1):
        key, sub = jax.random.split(key)
        logits, cache = _decode_step(model, cache, tok)
        tok = sample_token(sub, logits, cfg)
        t = int(tok[0])
        out.append(t)
        if callback is not None and callback(t) is False:
            break
        if t in eos and len(out) >= cfg.min_new_tokens:
            break
    td1 = time.perf_counter()
    n_dec = len(out) - 1
    return (
        GenerationResult(
            out,
            ttft_s=t1 - t0,
            prefill_tps=true_len / (t1 - t0) if t1 > t0 else 0.0,
            decode_tps=n_dec / (td1 - td0) if td1 > td0 and n_dec else 0.0,
        ),
        cache,
    )


@functools.partial(
    jax.jit,
    static_argnames=("true_len", "max_new_tokens", "scfg"),
    donate_argnames=("cache",),
)
def generate_compiled(
    model,
    input_ids,  # [1, S_padded]
    cache: KVCache,
    true_len: int,
    max_new_tokens: int,
    scfg: SamplingConfig = SamplingConfig(),
    eos_token_id: int = -1,
    seed: int = 0,
):
    """Whole generation as ONE device program: prefill + lax.while decode.

    Returns (tokens [max_new_tokens] int32 padded with eos/-1, n_generated).
    """
    hidden, cache = model.hidden_states(input_ids, cache)
    last = hidden[:, true_len - 1 : true_len, :]
    logits = model.logits(last)[:, 0, :]
    cache = cache.with_pos(true_len)

    key = jax.random.PRNGKey(seed)
    tok0 = sample_token(key, logits, scfg)

    tokens = jnp.full((max_new_tokens,), -1, jnp.int32)
    tokens = tokens.at[0].set(tok0[0])

    def cond(state):
        i, tok, cache, tokens, key, done = state
        return (i < max_new_tokens) & (~done)

    def body(state):
        i, tok, cache, tokens, key, done = state
        logits, cache = _decode_step_inner(model, cache, tok)
        key, sub = jax.random.split(key)
        nxt = sample_token(sub, logits, scfg)
        tokens = tokens.at[i].set(nxt[0])
        done = nxt[0] == eos_token_id
        return i + 1, nxt, cache, tokens, key, done

    init = (jnp.asarray(1), tok0, cache, tokens, key, tok0[0] == eos_token_id)
    i, tok, cache, tokens, key, done = jax.lax.while_loop(cond, body, init)
    return tokens, i


@functools.partial(jax.jit, static_argnames=("true_len",), donate_argnames=("cache",))
def _prefill_ragged(model, cache: KVCache, input_ids, pad_lens, true_len: int):
    """Left-padded batch prefill: per-seq rope shift + pad-prefix masking."""
    hidden, cache = model.hidden_states(input_ids, cache, pad_lens=pad_lens)
    last = hidden[:, true_len - 1 : true_len, :]
    logits = model.logits(last)
    cache = cache.with_pos(true_len)
    return logits[:, 0, :], cache


@functools.partial(jax.jit, donate_argnames=("cache",))
def _decode_step_ragged(model, cache: KVCache, token, pad_lens):
    logits, cache = model(token[:, None], cache, last_only=True, pad_lens=pad_lens)
    return logits[:, 0, :], cache


def ragged_batched_generate(
    model,
    prompts: list[np.ndarray],  # per-sequence token id arrays (different lengths)
    cache: KVCache,
    cfg: SamplingConfig,
    *,
    seed: int = 0,
):
    """Batched generation over unequal-length prompts via LEFT padding.

    The serving-grade batched path: all sequences share the cache write head
    (appends aligned at the right edge); per-seq rope positions shift back by
    the pad length and the pad prefix is masked in attention.
    Returns (tokens [B, T], n_valid [B]).
    """
    b = len(prompts)
    lens = np.array([len(p) for p in prompts], np.int32)
    width = int(lens.max())
    ids = np.zeros((b, width), np.int32)
    for i, p in enumerate(prompts):
        ids[i, width - len(p):] = p  # left pad
    pad_lens = jnp.asarray(width - lens, jnp.int32)

    key = jax.random.PRNGKey(seed)
    logits, cache = _prefill_ragged(model, cache, jnp.asarray(ids), pad_lens, width)
    tok = sample_token(key, logits, cfg)
    e = model.cfg.eos_token_id
    eos_ids = tuple(e) if isinstance(e, (tuple, list)) else (e,)
    out = [tok]
    finished = np.zeros(b, bool)
    for _ in range(cfg.max_new_tokens - 1):
        key, sub = jax.random.split(key)
        logits, cache = _decode_step_ragged(model, cache, tok, pad_lens)
        tok = sample_token(sub, logits, cfg)
        finished |= np.isin(np.asarray(out[-1]), eos_ids)
        out.append(tok)
        if finished.all():
            break
    toks = np.stack([np.asarray(t) for t in out], axis=1)  # [B, T]
    # n_valid: tokens up to and including first eos per row
    n_valid = np.full(b, toks.shape[1], np.int32)
    for i in range(b):
        hits = np.where(np.isin(toks[i], eos_ids))[0]
        if hits.size:
            n_valid[i] = hits[0] + 1
    return toks, n_valid, cache


def batched_generate(
    model,
    input_ids: np.ndarray,  # [B, S] already padded to equal length
    lengths: np.ndarray,  # [B] true lengths  (currently S for all — see note)
    cache: KVCache,
    cfg: SamplingConfig,
    *,
    seed: int = 0,
):
    """Batched decode (reference Module::generate batch path, Module.cpp:146-205).

    Note: like the reference's batched demo, prompts are padded to a common
    length and generation proceeds lockstep; per-sequence eos marks completion.
    """
    input_ids = np.asarray(input_ids, np.int32)
    b, s = input_ids.shape
    key = jax.random.PRNGKey(seed)
    logits, cache = _prefill(model, cache, jnp.asarray(input_ids), s)
    tok = sample_token(key, logits, cfg)
    e = model.cfg.eos_token_id
    eos_ids = tuple(e) if isinstance(e, (tuple, list)) else (e,)
    out = [tok]
    finished = np.zeros(b, bool)
    for i in range(cfg.max_new_tokens - 1):
        key, sub = jax.random.split(key)
        logits, cache = _decode_step(model, cache, tok)
        tok = sample_token(sub, logits, cfg)
        tnp = np.asarray(tok)
        finished |= np.isin(tnp, eos_ids)
        out.append(tok)
        if finished.all():
            break
    return np.stack([np.asarray(t) for t in out], axis=1), cache  # [B, T]
