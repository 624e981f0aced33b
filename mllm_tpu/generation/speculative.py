"""Speculative decoding driver.

Counterpart of the reference's SD pipeline (modeling_qwen_sd.hpp:270-385 +
Generate.cpp generate_SD): draft from a SuffixAutomaton, verify all draft
tokens in ONE forward over the KV cache, accept the longest matching prefix,
rewind the cache write-head (functional twin of updateVerifiedKVCache).

Verification runs at a FIXED padded draft width so the verify program
compiles once; acceptance logic is host-side (tiny ints).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..kv.cache import KVCache
from .draft import SuffixAutomaton


@dataclass
class SpecStats:
    steps: int = 0
    drafted: int = 0
    accepted: int = 0
    tokens: int = 0

    @property
    def acceptance(self) -> float:
        return self.accepted / self.drafted if self.drafted else 0.0


@functools.partial(jax.jit, donate_argnames=("cache",))
def _verify_step(model, cache: KVCache, ids):
    """Forward [1, W] draft-window tokens; argmax at every position."""
    logits, cache = model(ids, cache, last_only=False)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache


def speculative_generate(
    model,
    input_ids: np.ndarray,  # [1, S]
    cache: KVCache,
    max_new_tokens: int = 128,
    *,
    eos_token_id=None,
    max_draft: int = 8,
    min_match: int = 2,
    callback=None,
):
    """Greedy speculative decoding (reference SD is greedy, Generate.cpp:23-43).

    Returns (tokens, cache, SpecStats).
    """
    from .generate import _prefill, pad_to_bucket

    input_ids = np.asarray(input_ids, np.int32)
    true_len = input_ids.shape[1]
    eos = eos_token_id
    if eos is None:
        e = model.cfg.eos_token_id
        eos = set(e) if isinstance(e, (list, tuple)) else {e}
    elif isinstance(eos, int):
        eos = {eos}

    sa = SuffixAutomaton()
    sa.add_tokens(input_ids[0])

    padded = jnp.asarray(pad_to_bucket(input_ids, 128))
    logits, cache = _prefill(model, cache, padded, true_len)
    t0 = int(np.argmax(np.asarray(logits)[0]))
    out = [t0]
    sa.add_token(t0)
    if callback:
        callback(t0)
    stats = SpecStats()

    w = max_draft + 1  # verify window: [last_token, d1..d_max]
    while len(out) < max_new_tokens and out[-1] not in eos:
        draft = sa.lookup(max_draft, min_match)
        draft = draft[: max_draft]
        stats.steps += 1
        stats.drafted += len(draft)

        ids = np.zeros((1, w), np.int32)
        ids[0, 0] = out[-1]
        if draft:
            ids[0, 1 : 1 + len(draft)] = draft
        base = int(cache.pos)  # position where out[-1] will be written
        preds, cache = _verify_step(model, cache, jnp.asarray(ids))
        preds = np.asarray(preds)[0]  # [w]

        # accept longest prefix of draft matched by greedy predictions
        acc = 0
        while acc < len(draft) and preds[acc] == draft[acc]:
            acc += 1
        new_tokens = list(draft[:acc]) + [int(preds[acc])]
        stats.accepted += acc

        # rewind write head: valid entries = base..base+acc (out[-1] + accepted)
        cache = KVCache(cache.k, cache.v, jnp.asarray(base + acc + 1, jnp.int32))

        for t in new_tokens:
            out.append(t)
            sa.add_token(t)
            if callback:
                callback(t)
            if t in eos or len(out) >= max_new_tokens:
                break
    stats.tokens = len(out)
    return out, cache, stats
