"""Samplers: greedy / temperature / top-k / top-p.

TPU-native counterpart of the reference's LlmTextGenerator methods
(/root/reference/mllm/Generate.cpp:17-156).  All samplers run on-device inside
jit so the decode loop never syncs logits to the host.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplingConfig:
    """Mirror of LlmTextGeneratorOpts (Generate.hpp:26-36)."""

    max_new_tokens: int = 100
    do_sample: bool = False
    temperature: float = 0.7
    top_k: int = 0
    top_p: float = 0.0
    min_new_tokens: int = 0


def greedy(logits: jax.Array) -> jax.Array:
    """logits [..., V] -> token ids [...]."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_top_k(key, logits: jax.Array, k: int, temperature: float = 1.0) -> jax.Array:
    vals, idx = jax.lax.top_k(logits, k)
    vals = vals / jnp.asarray(temperature, vals.dtype)
    choice = jax.random.categorical(key, vals, axis=-1)
    return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0].astype(jnp.int32)


def sample_top_p(key, logits: jax.Array, p: float, temperature: float = 1.0) -> jax.Array:
    """Nucleus sampling over the (sorted) distribution, fully on device."""
    logits = logits / jnp.asarray(temperature, logits.dtype)
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_idx = jnp.argsort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob (exclusive) < p — always keep the first
    keep = (cum - probs) < p
    masked = jnp.where(keep, sorted_logits, -jnp.inf)
    choice = jax.random.categorical(key, masked, axis=-1)
    return jnp.take_along_axis(sorted_idx, choice[..., None], axis=-1)[..., 0].astype(jnp.int32)


def sample_tokens_batched(key, logits: jax.Array, temperature: jax.Array,
                          top_k: jax.Array, top_p: jax.Array) -> jax.Array:
    """Per-slot sampling over a batch of logits, fully on device.

    logits [B, V]; temperature/top_k/top_p are per-slot [B] arrays so one
    compiled program serves any mix of request sampling configs (the
    continuous engine's decode window): temperature <= 0 -> greedy,
    top_k == 0 / top_p == 0 -> filter off.  Each slot folds its index into
    `key` (independent streams)."""
    b, v = logits.shape

    def full_path(_):
        keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(jnp.arange(b))
        t = jnp.maximum(temperature, 1e-6)[:, None].astype(jnp.float32)
        scaled = logits.astype(jnp.float32) / t
        sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]
        kk = jnp.clip(top_k, 1, v) - 1
        kth = jnp.take_along_axis(sorted_desc, kk[:, None], axis=-1)
        mask = jnp.where((top_k > 0)[:, None], scaled >= kth, True)
        sp = jax.nn.softmax(sorted_desc, axis=-1)
        cum = jnp.cumsum(sp, axis=-1)
        keep_sorted = (cum - sp) < top_p[:, None]  # exclusive-cum < p, first always kept
        minkeep = jnp.min(jnp.where(keep_sorted, sorted_desc, jnp.inf), axis=-1)
        mask2 = mask & jnp.where((top_p > 0)[:, None], scaled >= minkeep[:, None], True)
        masked = jnp.where(mask2, scaled, -jnp.inf)
        sampled = jax.vmap(jax.random.categorical)(keys, masked)
        return jnp.where(temperature <= 0, greedy(logits), sampled.astype(jnp.int32))

    # all-greedy fast path: the sort/cumsum over [B, V] costs ~as much as a
    # whole decode layer at V=152k — skip it unless some slot actually samples
    return jax.lax.cond(jnp.all(temperature <= 0),
                        lambda _: greedy(logits), full_path, operand=None)


def sample_token(key, logits: jax.Array, cfg: SamplingConfig) -> jax.Array:
    """Unified entry used by the generate loops (static dispatch on cfg).

    top_k AND top_p together intersect the two keep-sets (same semantics as
    `sample_tokens_batched`, so the offline and serving paths sample from
    identical distributions for identical configs)."""
    if not cfg.do_sample:
        return greedy(logits)
    if cfg.top_k and cfg.top_k > 0 and cfg.top_p and cfg.top_p > 0.0:
        scaled = logits.astype(jnp.float32) / jnp.asarray(cfg.temperature, jnp.float32)
        sorted_desc = jnp.sort(scaled, axis=-1)[..., ::-1]
        kth = sorted_desc[..., min(cfg.top_k, logits.shape[-1]) - 1, None]
        sp = jax.nn.softmax(sorted_desc, axis=-1)
        cum = jnp.cumsum(sp, axis=-1)
        keep_sorted = (cum - sp) < cfg.top_p  # exclusive-cum < p, first always kept
        minkeep = jnp.min(jnp.where(keep_sorted, sorted_desc, jnp.inf), axis=-1, keepdims=True)
        masked = jnp.where((scaled >= kth) & (scaled >= minkeep), scaled, -jnp.inf)
        return jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
    if cfg.top_k and cfg.top_k > 0:
        return sample_top_k(key, logits, cfg.top_k, cfg.temperature)
    if cfg.top_p and cfg.top_p > 0.0:
        return sample_top_p(key, logits, cfg.top_p, cfg.temperature)
    return jax.random.categorical(key, logits / jnp.asarray(cfg.temperature, logits.dtype), axis=-1).astype(jnp.int32)
