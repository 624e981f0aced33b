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


def sample_token(key, logits: jax.Array, cfg: SamplingConfig) -> jax.Array:
    """Unified entry used by the generate loops (static dispatch on cfg)."""
    if not cfg.do_sample:
        return greedy(logits)
    if cfg.top_k and cfg.top_k > 0:
        return sample_top_k(key, logits, cfg.top_k, cfg.temperature)
    if cfg.top_p and cfg.top_p > 0.0:
        return sample_top_p(key, logits, cfg.top_p, cfg.temperature)
    return jax.random.categorical(key, logits / jnp.asarray(cfg.temperature, logits.dtype), axis=-1).astype(jnp.int32)
