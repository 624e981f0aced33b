"""Continuous (slot/iteration-level) batching engine.

Production serving upgrade over the window micro-batching in
examples/serve.py: requests are admitted into free SLOTS of a shared
SlotKVCache while other slots keep decoding — no convoy effect from
lockstep batches.  The reference has only a lockstep batch path
(/root/reference/mllm/Module.cpp:146-205); slot scheduling is the standard
production-server design (vLLM-style), realized TPU-natively:

  - one compiled ADMIT program per prompt bucket: single-sequence prefill
    into a scratch cache, then one dynamic_update_slice copy into the slot;
  - one compiled DECODE program: every slot appends at its own write head
    (batched scatter) and attends to its own valid length — static shapes,
    so the scheduler never recompiles;
  - inactive slots compute garbage that is discarded (masked attention over
    zeros), the price of static shapes — and far cheaper than convoying.

Greedy-exactness vs the single-stream path is tested
(tests/test_engine.py): a request's tokens are identical whether it runs
alone or interleaved with others.
"""

from __future__ import annotations

import functools
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kv.cache import KVCache, SlotKVCache
from ..nn.module import Module
from .sampling import SamplingConfig


class SchedState(Module):
    """Device-resident scheduler state: ONE pytree that lives on the chip
    between windows so the steady-state loop is exactly one dispatch + one
    fetch per window — no per-window host->device uploads (each transfer
    through the remote relay costs ~25 ms, which at window=16 halved the
    engine's throughput)."""

    def __init__(self, cur, active, budget, temperature, top_k, top_p, key,
                 pos_delta=None):
        self.cur = cur  # [B] int32 current token per slot
        self.active = active  # [B] bool
        self.budget = budget  # [B] int32 remaining tokens per slot
        self.temperature = temperature  # [B] f32 (<=0 -> greedy)
        self.top_k = top_k  # [B] int32 (0 -> off)
        self.top_p = top_p  # [B] f32 (0 -> off)
        self.key = key  # PRNG key, split every window
        # [B] int32 M-RoPE decode-position offset per slot (Qwen2-VL image
        # requests: rope position = cache head + delta; 0 for text)
        self.pos_delta = (pos_delta if pos_delta is not None
                          else jnp.zeros_like(cur))

    @staticmethod
    def init(slots: int, seed: int = 0) -> "SchedState":
        return SchedState(
            jnp.zeros(slots, jnp.int32), jnp.zeros(slots, bool),
            jnp.zeros(slots, jnp.int32), jnp.zeros(slots, jnp.float32),
            jnp.zeros(slots, jnp.int32), jnp.zeros(slots, jnp.float32),
            jax.random.PRNGKey(seed))


@functools.partial(jax.jit, donate_argnames=("cache", "state"),
                   static_argnames=("bucket",))
def _admit_step(model, cache: SlotKVCache, state: SchedState, slot, ids,
                true_len, max_tokens, temperature, top_k, top_p, bucket: int):
    """Prefill `ids` [1, bucket] (true_len valid), install into `slot`,
    sample the first token ON DEVICE, and update the scheduler state.

    Returns (tok [1] int32, cache, state).  Nothing syncs to the host — the
    scheduler keeps the token as a lazy device scalar and fetches it together
    with the next decode window (one round-trip per window, not per admit)."""
    from .sampling import sample_tokens_batched

    cfg = getattr(model.cfg, "text", model.cfg)  # VL models nest the LM config
    small = cache.make_prefill_cache(1, bucket, cache.n_layers,
                                     cfg.num_key_value_heads, cfg.head_dim_)
    hidden, small = model.hidden_states(ids, small)
    last = jax.lax.dynamic_slice_in_dim(hidden, true_len - 1, 1, axis=1)
    logits = model.logits(last)
    cache = cache.admit(slot, small, true_len)
    key, sub = jax.random.split(state.key)
    tok = sample_tokens_batched(jax.random.fold_in(sub, slot), logits[:, 0, :],
                                temperature[None], top_k[None], top_p[None])
    state = SchedState(
        state.cur.at[slot].set(tok[0]),
        state.active.at[slot].set(True),
        state.budget.at[slot].set(max_tokens - 1),  # first token emitted by host
        state.temperature.at[slot].set(temperature),
        state.top_k.at[slot].set(top_k),
        state.top_p.at[slot].set(top_p),
        key, state.pos_delta.at[slot].set(0))
    return tok, cache, state, small.with_pos(true_len)


def _pad_small_seq(small, new_len: int):
    """Grow a small prefill cache along the sequence axis (axis 3 of every
    KV/scale leaf) to `new_len` rows.  Works for KVCache and both quant
    small caches — all store sequence at axis 3; scalar leaves (pos) pass
    through."""
    def pad(a):
        if getattr(a, "ndim", 0) < 4 or a.shape[3] >= new_len:
            return a
        widths = [(0, 0)] * a.ndim
        widths[3] = (0, new_len - a.shape[3])
        return jnp.pad(a, widths)

    return jax.tree.map(pad, small)


@functools.partial(jax.jit, donate_argnames=("cache", "state"),
                   static_argnames=("bucket_total",))
def _admit_prefix_step(model, cache: SlotKVCache, state: SchedState, slot,
                       prefix_small, suffix_ids, true_len, max_tokens,
                       temperature, top_k, top_p, bucket_total: int):
    """Admission with prefix-cache reuse: `prefix_small` already holds the
    KV of the first `prefix_small.pos` prompt tokens (a bucket-aligned
    prefix), so only the suffix runs through the model — the TPU-native
    automatic-prefix-caching admission (no reference counterpart; the
    reference has no serving engine).  suffix_ids [1, sb] with
    prefix_small.pos + sb == bucket_total; logits are taken at prompt
    position true_len - 1 (suffix-local true_len - 1 - pos)."""
    from .sampling import sample_tokens_batched

    m = prefix_small.pos  # traced: reused prefix length
    small = _pad_small_seq(prefix_small, bucket_total)
    hidden, small = model.hidden_states(suffix_ids, small)
    last = jax.lax.dynamic_slice_in_dim(hidden, true_len - 1 - m, 1, axis=1)
    logits = model.logits(last)
    cache = cache.admit(slot, small, true_len)
    key, sub = jax.random.split(state.key)
    tok = sample_tokens_batched(jax.random.fold_in(sub, slot), logits[:, 0, :],
                                temperature[None], top_k[None], top_p[None])
    state = SchedState(
        state.cur.at[slot].set(tok[0]),
        state.active.at[slot].set(True),
        state.budget.at[slot].set(max_tokens - 1),
        state.temperature.at[slot].set(temperature),
        state.top_k.at[slot].set(top_k),
        state.top_p.at[slot].set(top_p),
        key, state.pos_delta.at[slot].set(0))
    return tok, cache, state, small.with_pos(true_len)


@functools.partial(jax.jit, donate_argnames=("cache", "state"),
                   static_argnames=("bucket", "grid_thw"))
def _admit_vl_step(model, cache: SlotKVCache, state: SchedState, slot, ids,
                   patches, positions, true_len, pos_delta, max_tokens,
                   temperature, top_k, top_p, bucket: int, grid_thw):
    """Multimodal admission: vision encode + spliced prefill + install, one
    program.  `positions` [3, 1, bucket] are the M-RoPE prompt positions from
    the processor; `pos_delta` is its mrope_delta, recorded per slot so the
    decode window offsets this slot's rope positions (image tokens compress
    the position space).  The serving counterpart of the reference's
    demo_qwen2_vl flow (processing_qwen2_vl.hpp get_rope_index), which only
    runs one request at a time."""
    from .sampling import sample_tokens_batched

    cfg = getattr(model.cfg, "text", model.cfg)
    small = cache.make_prefill_cache(1, bucket, cache.n_layers,
                                     cfg.num_key_value_heads, cfg.head_dim_)
    image_embeds = model.visual(patches, grid_thw)
    x = model.embed(ids, image_embeds)
    hidden, small = model.trunk(x, positions, small)
    last = jax.lax.dynamic_slice_in_dim(hidden, true_len - 1, 1, axis=1)
    logits = model.logits(last)
    small = small.with_pos(true_len)
    cache = cache.admit(slot, small, true_len)
    key, sub = jax.random.split(state.key)
    tok = sample_tokens_batched(jax.random.fold_in(sub, slot), logits[:, 0, :],
                                temperature[None], top_k[None], top_p[None])
    state = SchedState(
        state.cur.at[slot].set(tok[0]),
        state.active.at[slot].set(True),
        state.budget.at[slot].set(max_tokens - 1),
        state.temperature.at[slot].set(temperature),
        state.top_k.at[slot].set(top_k),
        state.top_p.at[slot].set(top_p),
        key, state.pos_delta.at[slot].set(pos_delta))
    return tok, cache, state


@functools.partial(jax.jit, donate_argnames=("cache", "state"),
                   static_argnames=("bucket",))
def _admit_batch(model, cache: SlotKVCache, state: SchedState, slot_ids, ids,
                 true_lens, max_tokens, temperature, top_k, top_p, bucket: int):
    """Admit up to A requests in ONE program: an [A, bucket] batched prefill
    plus scatter installs — one dispatch instead of A, and the A prompts ride
    the MXU together (a b=1 128-token prefill leaves most of the systolic
    array idle).  Rows with slot_ids == n_slots are padding (scatter mode
    'drop' discards them).

    Returns (toks [A], cache, state)."""
    from .sampling import sample_tokens_batched

    cfg = getattr(model.cfg, "text", model.cfg)  # VL models nest the LM config
    a = ids.shape[0]
    small = cache.make_prefill_cache(a, bucket, cache.n_layers,
                                     cfg.num_key_value_heads, cfg.head_dim_)
    hidden, small = model.hidden_states(ids, small)
    idx = jnp.arange(a)
    last = hidden[idx, true_lens - 1]  # [A, D]
    logits = model.logits(last[:, None, :])[:, 0, :]  # [A, V]
    key, sub = jax.random.split(state.key)
    toks = sample_tokens_batched(sub, logits, temperature, top_k, top_p)
    pad = slot_ids >= cache.k.shape[1]  # padding rows
    cache = cache.admit_batch(slot_ids, small, true_lens, bucket)
    state = SchedState(
        state.cur.at[slot_ids].set(toks, mode="drop"),
        state.active.at[slot_ids].set(~pad, mode="drop"),
        state.budget.at[slot_ids].set(max_tokens - 1, mode="drop"),
        state.temperature.at[slot_ids].set(temperature, mode="drop"),
        state.top_k.at[slot_ids].set(top_k, mode="drop"),
        state.top_p.at[slot_ids].set(top_p, mode="drop"),
        key, state.pos_delta.at[slot_ids].set(0, mode="drop"))
    return toks, cache, state, small


@functools.partial(jax.jit, donate_argnames=("cache", "state"),
                   static_argnames=("steps",))
def _decode_window(model, cache: SlotKVCache, state: SchedState, eos_ids,
                   steps: int):
    """`steps` fused decode iterations with on-device per-slot sampling.

    The round-2 engine synced logits to the host and ran Python sampling
    every token (one relay round-trip per step); this window syncs ONCE per
    `steps` tokens, and all loop state (tokens, activity, budgets, sampling
    params, PRNG) lives in the device-resident SchedState.  Slots sample
    with their own (temperature, top_k, top_p) via sample_tokens_batched;
    EOS/budget exhaustion deactivates a slot in-device and its remaining
    window positions emit -1.

    Returns (out [B, steps] int32 with -1 padding, cache, state').
    """
    from .sampling import sample_tokens_batched

    key, sub = jax.random.split(state.key)

    is_vl = hasattr(model, "visual")  # static: M-RoPE models take positions

    def body(i, carry):
        toks, cache, out, active, budget = carry
        if is_vl:
            # per-slot M-RoPE decode position = cache head + image delta
            p = (cache.pos + state.pos_delta)[None, :, None].astype(jnp.int32)
            p = jnp.broadcast_to(p, (3,) + p.shape[1:])
            logits, cache = model(toks[:, None], cache, positions=p, last_only=True)
        else:
            logits, cache = model(toks[:, None], cache, last_only=True)
        nxt = sample_tokens_batched(jax.random.fold_in(sub, i), logits[:, 0, :],
                                    state.temperature, state.top_k, state.top_p)
        emit = active & (budget > 0)
        nxt = jnp.where(emit, nxt, -1)
        out = out.at[:, i].set(nxt)
        budget = budget - emit.astype(jnp.int32)
        hit_eos = jnp.any(nxt[:, None] == eos_ids[None, :], axis=1)
        active = emit & ~hit_eos & (budget > 0)
        toks = jnp.where(nxt >= 0, nxt, toks)  # keep last valid token
        return toks, cache, out, active, budget

    out = jnp.full((state.cur.shape[0], steps), -1, jnp.int32)
    toks, cache, out, active, budget = jax.lax.fori_loop(
        0, steps, body, (state.cur, cache, out, state.active, state.budget))
    state = SchedState(toks, active, budget, state.temperature, state.top_k,
                       state.top_p, key, state.pos_delta)
    return out, cache, state


@dataclass
class _Request:
    ids: np.ndarray
    max_tokens: int
    out: queue.Queue
    t_submit: float
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    # multimodal (Qwen2-VL): (patches [Sp, F], grid_thw, positions [3,1,S],
    # mrope_delta) from the processor; None for text requests
    vl: Optional[tuple] = None


class ContinuousEngine:
    """Slot scheduler.  Thread-safe submit(); runs its own loop thread."""

    def __init__(self, model, *, slots: int = 8, max_len: int = 2048,
                 prompt_bucket: int = 128, eos_token_id=None,
                 kv_dtype=jnp.bfloat16, start_thread: bool = True,
                 decode_window: int = 8, pipeline: bool = False,
                 prefix_cache: int = 0, paged: int = 0, mesh=None):
        cfg = getattr(model.cfg, "text", model.cfg)  # VL models nest the LM config
        self.model = model
        self.slots = slots
        self.max_len = max_len
        self.bucket = prompt_bucket
        # decode_window: tokens decoded per compiled window (host syncs once
        # per window; admission happens between windows).  1 = the old
        # step-per-token behavior.
        self.window = max(1, decode_window)
        # paged (block-table) KV: blocks reserved per request from a shared
        # pool instead of max_len per slot — vLLM-style capacity elasticity
        self._free_blocks: list = []
        self._slot_blocks: list = [[] for _ in range(slots)]
        # two-phase quarantine: a retired slot's blocks survive TWO drains
        # before reuse (a pipelined window dispatched before its table row
        # was cleared may still write them; retired slots keep appending
        # garbage at their advancing heads until the -1 row drops the writes)
        self._deferred_free: list = []
        self._free_pending: list = []
        if paged > 0:
            from ..kv.cache import PagedKVCache

            self.cache = PagedKVCache.init(
                cfg.num_hidden_layers, slots, max_len, cfg.num_key_value_heads,
                cfg.head_dim_,
                jnp.bfloat16 if kv_dtype in ("bf16", "bfloat16") else kv_dtype,
                n_blocks=paged)
            self._free_blocks = list(range(self.cache.n_blocks))
        elif kv_dtype in ("int8", "q8", "int4", "q4"):
            # quantized serving cache: 2x (int8) / 4x (int4) context per chip,
            # decode streams through the fused quant attention kernel
            from ..kv.cache import SlotQuantKVCache

            self.cache = SlotQuantKVCache.init(
                cfg.num_hidden_layers, slots, max_len, cfg.num_key_value_heads,
                cfg.head_dim_, bits=4 if kv_dtype in ("int4", "q4") else 8)
        else:
            if kv_dtype in ("bf16", "bfloat16"):
                kv_dtype = jnp.bfloat16
            self.cache = SlotKVCache.init(
                cfg.num_hidden_layers, slots, max_len, cfg.num_key_value_heads,
                cfg.head_dim_, kv_dtype)
        # tensor-parallel serving: `model` must already be head-padded
        # (parallel/heads.pad_heads_for_tp) and sharded (shard_model) over
        # `mesh`; the slot cache shards its kv-head axis to match and the
        # scheduler state replicates.  The admit/window programs are the
        # SAME jitted functions — GSPMD inserts the tp collectives from the
        # operand shardings.  Greedy-exact vs the single-chip engine
        # (tests/test_parallel.py::test_engine_tp_matches_single_chip).
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as _P

            from ..parallel.sharding import shard_slot_cache

            self.cache = shard_slot_cache(self.cache, mesh)
            self._repl = NamedSharding(mesh, _P())
        e = eos_token_id if eos_token_id is not None else cfg.eos_token_id
        self.eos = set(e) if isinstance(e, (tuple, list, set)) else {e}
        self._eos_arr = jnp.asarray(sorted(self.eos) or [-9999], jnp.int32)
        if mesh is not None:
            self._eos_arr = jax.device_put(self._eos_arr, self._repl)
        self.pending: queue.Queue = queue.Queue()
        self.req: list[Optional[_Request]] = [None] * slots
        self.emitted = [0] * slots
        self.cur = np.zeros(slots, np.int32)
        self._state = SchedState.init(slots)  # device-resident between windows
        if mesh is not None:
            self._state = jax.device_put(self._state, self._repl)
        self._first: dict = {}  # slot -> pending first-token device scalar
        self.pipeline = pipeline
        self._inflight = None  # previous window's (out, firsts, gens) pack
        self._gen = [0] * slots  # admission generation per slot
        self.steps = 0
        self._stop = False
        # automatic prefix caching: LRU of admission small-caches keyed by
        # prompt tokens; reuse is bucket-aligned (shared system prompts /
        # chat history skip re-prefill).  0 = off.
        self._pcache = None
        if prefix_cache > 0:
            from .prefill import PromptCache

            self._pcache = PromptCache(prefix_cache)
        self.prefix_hits = 0
        self.prefix_tokens_reused = 0
        if start_thread:
            self._thread = threading.Thread(target=self.run, daemon=True)
            self._thread.start()

    # -- client API --------------------------------------------------------
    def submit(self, prompt_ids: np.ndarray, max_tokens: int = 64,
               sampling: Optional[SamplingConfig] = None) -> queue.Queue:
        """Returns a queue yielding token ids, then None when finished."""
        out: queue.Queue = queue.Queue()
        ids = np.asarray(prompt_ids, np.int32).reshape(-1)
        # capacity guard: past max_len the slot cache would silently drop KV
        # writes (SlotKVCache.update_layer mode="drop") while pos advanced,
        # decoding over stale rows — reject instead of corrupting.
        if len(ids) >= self.max_len:
            raise ValueError(
                f"prompt length {len(ids)} >= engine max_len {self.max_len}")
        max_tokens = min(max_tokens, self.max_len - len(ids))
        self.pending.put(_Request(ids, max_tokens, out, time.perf_counter(),
                                  sampling or SamplingConfig()))
        return out

    def submit_vl(self, proc_out, max_tokens: int = 64,
                  sampling: Optional[SamplingConfig] = None) -> queue.Queue:
        """Submit a multimodal (Qwen2-VL) request: `proc_out` is a
        Qwen2VLProcessorOutput (input_ids/patches/grid_thw/position_ids/
        mrope_delta).  Image and text requests share slots — the decode
        window offsets this slot's rope positions by mrope_delta."""
        out: queue.Queue = queue.Queue()
        ids = np.asarray(proc_out.input_ids, np.int32).reshape(-1)
        if len(ids) >= self.max_len:
            raise ValueError(
                f"prompt length {len(ids)} >= engine max_len {self.max_len}")
        max_tokens = min(max_tokens, self.max_len - len(ids))
        vl = (proc_out.patches, proc_out.grid_thw,
              np.asarray(proc_out.position_ids, np.int32), int(proc_out.mrope_delta))
        self.pending.put(_Request(ids, max_tokens, out, time.perf_counter(),
                                  sampling or SamplingConfig(), vl=vl))
        return out

    def stop(self):
        self._stop = True

    # -- scheduler ---------------------------------------------------------
    def _free_slot(self) -> Optional[int]:
        for i, r in enumerate(self.req):
            if r is None:
                return i
        return None

    def _paged_reserve(self, slot: int, n: int, max_tokens: int, bucket: int) -> bool:
        """Reserve this request's blocks in table[slot] (False = pool full).
        Upfront reservation (prompt + full budget) means decode never
        allocates mid-flight — the write path stays one compiled program."""
        from ..kv.cache import PagedKVCache

        if not isinstance(self.cache, PagedKVCache):
            return True
        bs = PagedKVCache.BS
        need = max(-(-(n + max_tokens) // bs), bucket // bs)
        need = min(need, self.cache.table.shape[1])
        if len(self._free_blocks) < need:
            return False
        # previous tenant's blocks go to the deferred pool (an in-flight
        # pipelined window may still write through the old table snapshot)
        self._deferred_free.extend(self._slot_blocks[slot])
        self._slot_blocks[slot] = [self._free_blocks.pop() for _ in range(need)]
        tbl = np.array(self.cache.table)  # writable copy
        row = np.full(tbl.shape[1], -1, np.int32)
        row[: need] = self._slot_blocks[slot]
        tbl[slot] = row
        self.cache = self.cache.with_tables(tbl)
        return True

    def _paged_release(self):
        """Advance the free quarantine one drain: pending -> free,
        deferred -> pending.  Two drains after a table-row clear, every
        program dispatched with the old table has retired."""
        self._free_blocks.extend(self._free_pending)
        self._free_pending = self._deferred_free
        self._deferred_free = []

    def _paged_retire(self, slot: int):
        """Request finished: quarantine its blocks and clear the table row
        so the slot's zombie decode writes (pos keeps advancing until
        re-tenancy) drop instead of corrupting reused blocks."""
        if not self._slot_blocks[slot]:
            return
        self._deferred_free.extend(self._slot_blocks[slot])
        self._slot_blocks[slot] = []
        tbl = np.array(self.cache.table)
        tbl[slot] = -1
        self.cache = self.cache.with_tables(tbl)

    def _prefix_match(self, ids: np.ndarray) -> int:
        """Bucket-aligned reusable prefix length for `ids` (0 = no hit)."""
        if self._pcache is None:
            return 0
        _, matched = self._pcache.lookup_common(ids)
        m = min(matched, len(ids) - 1)  # keep >= 1 suffix token for logits
        return (m // self.bucket) * self.bucket

    def _admit(self, slot: int, r: _Request):
        """Prefill + install into `slot`; the first token stays a LAZY device
        scalar (self._first[slot]) fetched at the next window boundary —
        admission never blocks on the host.

        With the prefix cache enabled, a bucket-aligned shared prefix skips
        re-prefill: only the suffix runs through the model."""
        n = len(r.ids)
        bucket = -(-max(n, 1) // self.bucket) * self.bucket
        bucket = min(bucket, self.max_len)
        if not self._paged_reserve(slot, n, r.max_tokens, bucket):
            return False
        s = r.sampling
        temp = jnp.asarray(s.temperature if s.do_sample else 0.0, jnp.float32)
        topk = jnp.asarray(s.top_k if s.do_sample else 0, jnp.int32)
        topp = jnp.asarray(s.top_p if s.do_sample else 0.0, jnp.float32)
        m = self._prefix_match(r.ids)
        hit = self._pcache.lookup_prefix_rows(r.ids, m) if m > 0 else None
        if hit is not None:
            sb = bucket - m
            ids = np.zeros((1, sb), np.int32)
            ids[0, : n - m] = r.ids[m:n]
            tok, self.cache, self._state, small = _admit_prefix_step(
                self.model, self.cache, self._state, jnp.asarray(slot, jnp.int32),
                hit, jnp.asarray(ids), jnp.asarray(n, jnp.int32),
                jnp.asarray(r.max_tokens, jnp.int32), temp, topk, topp, bucket)
            self.prefix_hits += 1
            self.prefix_tokens_reused += m
        else:
            ids = np.zeros((1, bucket), np.int32)
            ids[0, :n] = r.ids[:bucket]
            tok, self.cache, self._state, small = _admit_step(
                self.model, self.cache, self._state, jnp.asarray(slot, jnp.int32),
                jnp.asarray(ids), jnp.asarray(min(n, bucket), jnp.int32),
                jnp.asarray(r.max_tokens, jnp.int32), temp, topk, topp, bucket)
        if self._pcache is not None:
            self._pcache.store(r.ids[: min(n, bucket)], small)
        self.req[slot] = r
        self.emitted[slot] = 0
        self._first[slot] = tok
        self._gen[slot] += 1
        return True

    def _admit_vl(self, slot: int, r: _Request):
        """Vision admission: one program encodes the image(s), splices, and
        prefills; the slot records the M-RoPE decode offset."""
        patches, grid_thw, positions, delta = r.vl
        n = len(r.ids)
        bucket = -(-max(n, 1) // self.bucket) * self.bucket
        bucket = min(bucket, self.max_len)
        if not self._paged_reserve(slot, n, r.max_tokens, bucket):
            return False
        ids = np.zeros((1, bucket), np.int32)
        ids[0, :n] = r.ids
        pos = np.zeros((3, 1, bucket), np.int32)
        pos[:, :, :n] = positions[:, :, :n]
        # pad positions continue past the last real one (masked rows anyway)
        pos[:, :, n:] = positions[:, :, n - 1 : n] + np.arange(1, bucket - n + 1)[None, None, :]
        s = r.sampling
        tok, self.cache, self._state = _admit_vl_step(
            self.model, self.cache, self._state, jnp.asarray(slot, jnp.int32),
            jnp.asarray(ids), jnp.asarray(patches), jnp.asarray(pos),
            jnp.asarray(n, jnp.int32), jnp.asarray(delta, jnp.int32),
            jnp.asarray(r.max_tokens, jnp.int32),
            jnp.asarray(s.temperature if s.do_sample else 0.0, jnp.float32),
            jnp.asarray(s.top_k if s.do_sample else 0, jnp.int32),
            jnp.asarray(s.top_p if s.do_sample else 0.0, jnp.float32),
            bucket, tuple(grid_thw))
        self.req[slot] = r
        self.emitted[slot] = 0
        self._first[slot] = tok
        self._gen[slot] += 1
        return True

    def _admit_many(self, batch):
        """Admit several bucket-sized requests in ONE batched program."""
        a = self.slots
        slot_ids = np.full(a, self.slots, np.int32)  # out-of-range = dropped
        ids = np.zeros((a, self.bucket), np.int32)
        lens = np.ones(a, np.int32)
        mt = np.ones(a, np.int32)
        temp = np.zeros(a, np.float32)
        topk = np.zeros(a, np.int32)
        topp = np.zeros(a, np.float32)
        for row, (slot, r) in enumerate(batch):
            n = len(r.ids)
            slot_ids[row] = slot
            ids[row, :n] = r.ids
            lens[row] = max(n, 1)
            mt[row] = r.max_tokens
            s = r.sampling
            temp[row] = s.temperature if s.do_sample else 0.0
            topk[row] = s.top_k if s.do_sample else 0
            topp[row] = s.top_p if s.do_sample else 0.0
        toks, self.cache, self._state, small = _admit_batch(
            self.model, self.cache, self._state, jnp.asarray(slot_ids),
            jnp.asarray(ids), jnp.asarray(lens), jnp.asarray(mt),
            jnp.asarray(temp), jnp.asarray(topk), jnp.asarray(topp), self.bucket)
        for row, (slot, r) in enumerate(batch):
            self.req[slot] = r
            self.emitted[slot] = 0
            self._first[slot] = toks[row : row + 1]
            self._gen[slot] += 1
            if self._pcache is not None:
                # slice this row's small cache (fresh buffers) for the prefix
                # store; batch axis is 1 on every KV/scale leaf
                one = jax.tree.map(
                    lambda a: (jax.lax.slice_in_dim(a, row, row + 1, axis=1)
                               if getattr(a, "ndim", 0) >= 4 else a), small)
                self._pcache.store(r.ids, one.with_pos(len(r.ids)))

    def _emit(self, slot: int, tok: int):
        r = self.req[slot]
        r.out.put(tok)
        self.emitted[slot] += 1
        if tok in self.eos or self.emitted[slot] >= r.max_tokens:
            r.out.put(None)  # finished sentinel
            self.req[slot] = None
            self._paged_retire(slot)

    def _drain(self, out, firsts, gens):
        """Fetch + emit one window's tokens (the only host round-trip).

        gens: per-slot admission-generation snapshot taken at dispatch —
        tokens are dropped for slots re-admitted since (a pipelined window
        dispatched before the re-admission must not leak into the new
        request)."""
        slots_f = sorted(firsts)
        fetched = jax.device_get([firsts[s] for s in slots_f] + [out])
        out_np, first_np = fetched[-1], fetched[:-1]
        for s, t in zip(slots_f, first_np):
            if self._gen[s] != gens[s]:
                continue
            self.cur[s] = int(t[0])
            self._emit(s, int(t[0]))
        for slot in range(self.slots):
            if self._gen[slot] != gens[slot]:
                continue
            if slot in firsts and self.req[slot] is None:
                continue  # first token already finished the request —
                # the window decoded past it; discard those tokens
            for i in range(self.window):
                tok = int(out_np[slot, i])
                if tok < 0 or self.req[slot] is None:
                    break
                self.cur[slot] = tok
                self._emit(slot, tok)
        self._paged_release()  # this drain proves the prior window retired

    def step(self) -> bool:
        """One scheduler iteration; returns True if any work was done."""
        worked = False
        if self._inflight is None and all(r is None for r in self.req):
            # no dispatched program outstanding: the whole quarantine is
            # safe to release (otherwise it only advances on drains)
            self._paged_release()
            self._paged_release()
        batch = []
        while True:
            slot = self._free_slot()
            if slot is None:
                break
            try:
                r = self.pending.get_nowait()
            except queue.Empty:
                break
            if r.vl is not None:  # multimodal: vision-prefill program
                if not self._admit_vl(slot, r):
                    self.pending.put(r)  # pool full: retry next step
                    break
            elif len(r.ids) <= self.bucket and self._prefix_match(r.ids) == 0:
                if not self._paged_reserve(slot, len(r.ids), r.max_tokens,
                                           self.bucket):
                    self.pending.put(r)
                    break
                self.req[slot] = r  # reserve; installed by _admit_many below
                batch.append((slot, r))
            else:  # multi-bucket prompt or prefix-cache hit: per-request program
                if not self._admit(slot, r):
                    self.pending.put(r)
                    break
            worked = True
        if batch:
            self._admit_many(batch)
        if any(r is not None for r in self.req):
            firsts = self._first
            self._first = {}
            self.steps += 1
            out, self.cache, self._state = _decode_window(
                self.model, self.cache, self._state, self._eos_arr, self.window)
            pack = (out, firsts, list(self._gen))
            if self.pipeline:
                # double buffering: window N+1 is already dispatched while
                # window N's tokens cross the relay — the fetch round-trip
                # hides entirely behind device compute (throughput mode;
                # adds one window of token latency)
                prev, self._inflight = self._inflight, pack
                if prev is not None:
                    self._drain(*prev)
            else:
                self._drain(*pack)
            worked = True
        elif self._inflight is not None:
            self._drain(*self._inflight)
            self._inflight = None
            worked = True
        return worked

    def run(self):
        while not self._stop:
            if not self.step():
                try:
                    r = self.pending.get(timeout=0.05)
                except queue.Empty:
                    continue
                self.pending.put(r)  # picked up by the next step()


def collect(out_q: queue.Queue, timeout: float = 300.0) -> list[int]:
    """Drain a submit() queue until the None sentinel."""
    toks = []
    deadline = time.time() + timeout
    while True:
        t = out_q.get(timeout=max(deadline - time.time(), 0.01))
        if t is None:
            return toks
        toks.append(t)
