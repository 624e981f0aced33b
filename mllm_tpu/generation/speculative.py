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
        cache = cache.with_pos(base + acc + 1)

        for t in new_tokens:
            out.append(t)
            sa.add_token(t)
            if callback:
                callback(t)
            if t in eos or len(out) >= max_new_tokens:
                break
    stats.tokens = len(out)
    return out, cache, stats


# ---------------------------------------------------------------------------
# Tree-mode speculative decoding (multi-trace TracePool verification —
# reference modeling_qwen_sd.hpp:270-385 with RoPETree + CausalTreeMask)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, donate_argnames=("cache",))
def _tree_verify_step(model, cache: KVCache, ids, positions, bias, bias_win):
    """Forward [1, w] tree tokens through the REAL DecoderBlock forward with
    an explicit attention bias (tree ancestry + window constraints), so every
    config-driven behavior — gemma2 pre/post-FFN norms, residual multipliers,
    sliding windows, softcaps — matches normal decoding exactly.

    bias:     [w, s_max] tree-visibility bias for global-attention layers
    bias_win: same, additionally window-cut, for sliding-window layers
              (pass bias again when the model has no windows)."""
    x = model.embed_tokens(ids)
    if model.cfg.embedding_multiplier != 1.0:
        x = x * jnp.asarray(model.cfg.embedding_multiplier, x.dtype)
    for li, blk in enumerate(model.blocks):
        b = bias_win if blk.attn._window() is not None else bias
        x, cache = blk(x, model.rope, cache, positions, layer_idx=li,
                       bias=b, causal=False)
    x = model.norm(x)
    # update_layer never advances pos; the driver sets it after acceptance
    return jnp.argmax(model.logits(x), axis=-1).astype(jnp.int32)[0], cache


def _tree_bias_full(ancestors: np.ndarray, base: int, s_max: int,
                    positions=None, window=None) -> np.ndarray:
    """[w, s_max] additive bias: cache prefix visible, draft region tree-
    masked, tail masked.  Slot base+0 = last accepted token (root).

    With `window` (+ `positions`, the absolute position of each tree row),
    keys older than `window` positions are additionally masked — the
    sliding-window variant for gemma2/mistral-class layers.  Cache slot j
    holds absolute position j for the committed prefix; draft slot base+r
    holds absolute position positions[r]."""
    w = len(ancestors) + 1
    bias = np.full((w, s_max), -1e30, np.float32)
    bias[:, :base] = 0.0  # committed prefix
    bias[0, base] = 0.0  # root sees itself
    for i, a in enumerate(ancestors):
        row = i + 1
        bias[row, base + row] = 0.0  # self
        bias[row, base] = 0.0  # root
        anc = a
        while anc != -1:
            bias[row, base + 1 + anc] = 0.0
            anc = ancestors[anc]
    if window is not None:
        if positions is None:
            positions = np.full(w, base, np.int64)
        slot_abs = np.concatenate([np.arange(base), np.asarray(positions[:w])])
        slot_abs = np.concatenate([slot_abs, np.full(s_max - len(slot_abs), 1 << 30)])
        q_abs = np.asarray(positions[:w])[:, None]
        bias = np.where(q_abs - slot_abs[None, :] >= window, -1e30, bias)
    return bias.astype(np.float32)


def speculative_generate_tree(
    model,
    input_ids: np.ndarray,
    cache: KVCache,
    max_new_tokens: int = 128,
    *,
    eos_token_id=None,
    max_draft: int = 6,
    max_traces: int = 3,
    min_match: int = 2,
    callback=None,
):
    """Greedy speculative decoding verifying MULTIPLE draft traces per step
    via tree attention.  Fixed verify width = 1 + max_traces*max_draft."""
    from .draft import TracePool
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
    s_max = cache.max_len
    w = 1 + max_traces * max_draft

    while len(out) < max_new_tokens and out[-1] not in eos:
        pool = TracePool(max_traces)
        for tr in sa.lookup_multi(max_draft, min_match, max_traces):
            pool.add_trace(tr)
        base = int(cache.pos)
        tree_ids, tree_pos, anc = pool.build_tree(base_pos=base + 1)
        n = len(tree_ids)
        stats.steps += 1
        stats.drafted += n

        ids = np.zeros((1, w), np.int32)
        pos = np.full((1, w), base, np.int32)
        ids[0, 0] = out[-1]
        if n:
            ids[0, 1 : 1 + n] = tree_ids
            pos[0, 1 : 1 + n] = tree_pos
        anc_pad = np.full(w - 1, -2, np.int32)  # -2 = padding (sees nothing useful)
        anc_pad[:n] = anc

        def _full_bias(window=None):
            b_ = _tree_bias_full(anc_pad[:n], base, s_max,
                                 positions=pos[0], window=window)
            if w - 1 - n:
                pad_rows = np.full((w - 1 - n, s_max), -1e30, np.float32)
                pad_rows[:, :base + 1] = 0.0  # harmless: pad rows see the prefix
                b_ = np.concatenate([b_, pad_rows], axis=0)
            return jnp.asarray(b_)

        bias = _full_bias()
        win = model.cfg.sliding_window
        bias_win = _full_bias(window=win) if win is not None else bias

        preds, cache = _tree_verify_step(
            model, cache, jnp.asarray(ids), jnp.asarray(pos), bias, bias_win,
        )
        preds = np.asarray(preds)  # [w]

        best_trace, n_acc = (0, 0)
        if pool.traces:
            # root prediction must match the trace's first token, else 0 accepted
            best_trace, best_n = 0, -1
            off = 0
            for ti, tr in enumerate(pool.traces):
                acc = 0
                if preds[0] == tr.tokens[0]:
                    acc = 1
                    j = 0
                    while acc < len(tr.tokens) and preds[1 + off + j] == tr.tokens[j + 1]:
                        acc += 1
                        j += 1
                if acc > best_n:
                    best_n, best_trace = acc, ti
                off += len(tr.tokens)
            n_acc = max(best_n, 0)
        stats.accepted += n_acc

        # bonus token = prediction at the last accepted node
        trace_off = sum(len(t.tokens) for t in pool.traces[:best_trace])
        if n_acc == 0:
            new_tokens = [int(preds[0])]
            keep_rel = []
        else:
            tr = pool.traces[best_trace]
            new_tokens = list(tr.tokens[:n_acc]) + [int(preds[trace_off + n_acc])]
            keep_rel = [1 + trace_off + j for j in range(n_acc)]

        # compact cache: keep slot 0 (root) + accepted trace slots
        keep = np.zeros(w, np.int32)
        keep[0] = 0
        for i, r in enumerate(keep_rel):
            keep[1 + i] = r
        cache = cache.rollback_accept(base, jnp.asarray(keep), 1 + n_acc)

        for t in new_tokens:
            out.append(t)
            sa.add_token(t)
            if callback:
                callback(t)
            if t in eos or len(out) >= max_new_tokens:
                break
    stats.tokens = len(out)
    return out, cache, stats
