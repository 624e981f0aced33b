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


# ---------------------------------------------------------------------------
# Fully-compiled speculative decoding (prompt-lookup drafting ON DEVICE)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("true_len", "max_new_tokens", "max_draft", "ngram"),
    donate_argnames=("cache",),
)
def speculative_generate_compiled(
    model,
    input_ids,  # [1, S_padded] int32
    cache: KVCache,
    true_len: int,
    max_new_tokens: int,
    eos_token_id: int = -1,
    max_draft: int = 8,
    ngram: int = 3,
):
    """Whole speculative generation as ONE device program.

    TPU-native redesign of the reference's SuffixAutomaton SD loop
    (modeling_qwen_sd.hpp:270-385 + Draft.hpp:65-128): the host loop pays a
    dispatch round trip PER VERIFY STEP for drafting, acceptance, and cache
    rewind.  Here the draft source is prompt-lookup — the most recent prior
    occurrence of the last `ngram` tokens in the full token history, held in
    a device buffer — so drafting (vectorized window match on the VPU), the
    [1, 1+max_draft] verify forward, longest-prefix acceptance, write-head
    rewind, and eos handling all run inside one `lax.while_loop`.  Zero host
    syncs per step; greedy (reference SD is greedy, Generate.cpp:23-43),
    token-for-token equal to plain greedy decoding by construction.

    The verify forward costs nearly the same HBM traffic as a 1-token decode
    step (weight streaming dominates; the extra max_draft rows ride the same
    tiles), so tok/s ≈ greedy_tok/s × (accepted_per_step + 1) × (t1/tw).

    Requires cache.max_len ≥ true_len + max_new_tokens + max_draft + 1 and
    true_len ≥ ngram.  Returns (tokens [max_new_tokens] int32 (junk beyond
    n_gen), n_gen, steps, drafted, accepted).
    """
    if true_len < ngram:
        raise ValueError(f"prompt ({true_len}) shorter than ngram ({ngram})")
    w = max_draft + 1
    s_padded = input_ids.shape[1]
    buf_len = s_padded + max_new_tokens + w

    # prefill + first greedy token
    hidden, cache = model.hidden_states(input_ids, cache)
    last = hidden[:, true_len - 1 : true_len, :]
    t0 = jnp.argmax(model.logits(last)[:, 0, :], axis=-1).astype(jnp.int32)[0]
    cache = cache.with_pos(true_len)

    buf = jnp.zeros((buf_len,), jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, input_ids[0].astype(jnp.int32), (0,))
    buf = buf.at[true_len].set(t0)

    lw = buf_len - ngram
    ii = jnp.arange(lw, dtype=jnp.int32)
    kk = jnp.arange(max_draft, dtype=jnp.int32)
    jj = jnp.arange(w, dtype=jnp.int32)

    def cond(st):
        return ~st[4]

    def body(st):
        buf, n, m, cache, done, steps, drafted, accepted = st
        # ---- draft: most recent prior occurrence of the last `ngram` tokens.
        # Window i is valid only when fully inside history and not the query
        # itself (i + ngram <= n-1); junk beyond n can never match.
        key = jax.lax.dynamic_slice(buf, (n - ngram,), (ngram,))
        wins = jnp.stack([jax.lax.slice(buf, (k,), (k + lw,))
                          for k in range(ngram)], axis=1)  # [lw, ngram] static
        hit = jnp.all(wins == key[None, :], axis=1) & (ii + ngram <= n - 1)
        # two-tier pick: prefer the LATEST occurrence whose continuation is a
        # full max_draft window of real history; short-period loops (the
        # common degenerate regime) otherwise match right next to the head
        # and cap the draft at n-src ~ 1 token per verify step
        full = hit & (ii + ngram + max_draft <= n)
        idx_full = jnp.max(jnp.where(full, ii, -1))
        idx = jnp.where(idx_full >= 0, idx_full,
                        jnp.max(jnp.where(hit, ii, -1)))
        src = jnp.maximum(idx, 0) + ngram
        draft = jax.lax.dynamic_slice(buf, (src,), (max_draft,))
        draft_len = jnp.where(idx >= 0, jnp.minimum(max_draft, n - src), 0)

        # ---- verify: [last_token, draft...] in one forward; invariant
        # cache.pos == n-1 (KV for every token except the newest)
        ids = jnp.concatenate([jax.lax.dynamic_slice(buf, (n - 1,), (1,)),
                               draft])[None]
        base = cache.pos
        logits, cache = model(ids, cache, last_only=False)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)[0]  # [w]

        # ---- accept the longest matched draft prefix (preds[:acc] == the
        # accepted tokens); preds[acc] is the free bonus token
        match = (preds[:max_draft] == draft) & (kk < draft_len)
        acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))
        blk = acc + 1
        is_eos = (preds == eos_token_id) & (jj < blk)
        first_eos = jnp.min(jnp.where(is_eos, jj, w))
        n_take = jnp.minimum(blk, jnp.minimum(first_eos + 1, max_new_tokens - m))
        done = (first_eos < n_take) | (m + n_take >= max_new_tokens)

        buf = jax.lax.dynamic_update_slice(buf, preds, (n,))  # junk past n_take
        cache = cache.with_pos(base + n_take)                 # is masked by n
        return (buf, n + n_take, m + n_take, cache, done, steps + 1,
                drafted + draft_len, accepted + jnp.minimum(acc, n_take))

    z = jnp.zeros((), jnp.int32)
    st = (buf, jnp.asarray(true_len + 1, jnp.int32), jnp.asarray(1, jnp.int32),
          cache, (t0 == eos_token_id) | (max_new_tokens <= 1), z, z, z)
    buf, n, m, cache, done, steps, drafted, accepted = jax.lax.while_loop(
        cond, body, st)
    tokens = jax.lax.dynamic_slice(buf, (true_len,), (max_new_tokens,))
    return tokens, m, steps, drafted, accepted
