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
from .sampling import SamplingConfig, sample_token


@functools.partial(jax.jit, donate_argnames=("cache",), static_argnames=("bucket",))
def _admit_step(model, cache: SlotKVCache, slot, ids, true_len, bucket: int):
    """Prefill `ids` [1, bucket] (true_len valid) and install into `slot`.

    Returns (last-token logits [1, V], cache with slot written, pos[slot]
    set to true_len)."""
    cfg = model.cfg
    small = KVCache.init(cache.n_layers, 1, bucket, cfg.num_key_value_heads,
                         cfg.head_dim_, cache.k.dtype)
    hidden, small = model.hidden_states(ids, small)
    last = jax.lax.dynamic_slice_in_dim(hidden, true_len - 1, 1, axis=1)
    logits = model.logits(last)
    cache = cache.admit(slot, small, true_len)
    return logits[:, 0, :], cache


@functools.partial(jax.jit, donate_argnames=("cache",))
def _slot_decode(model, cache: SlotKVCache, toks):
    """One decode step for every slot: toks [B] -> (logits [B, V], cache)."""
    logits, cache = model(toks[:, None], cache, last_only=True)
    return logits[:, 0, :], cache


@dataclass
class _Request:
    ids: np.ndarray
    max_tokens: int
    out: queue.Queue
    t_submit: float
    sampling: SamplingConfig = field(default_factory=SamplingConfig)


class ContinuousEngine:
    """Slot scheduler.  Thread-safe submit(); runs its own loop thread."""

    def __init__(self, model, *, slots: int = 8, max_len: int = 2048,
                 prompt_bucket: int = 128, eos_token_id=None,
                 kv_dtype=jnp.bfloat16, start_thread: bool = True):
        cfg = model.cfg
        self.model = model
        self.slots = slots
        self.max_len = max_len
        self.bucket = prompt_bucket
        self.cache = SlotKVCache.init(
            cfg.num_hidden_layers, slots, max_len, cfg.num_key_value_heads,
            cfg.head_dim_, kv_dtype)
        e = eos_token_id if eos_token_id is not None else cfg.eos_token_id
        self.eos = set(e) if isinstance(e, (tuple, list, set)) else {e}
        self.pending: queue.Queue = queue.Queue()
        self.req: list[Optional[_Request]] = [None] * slots
        self.emitted = [0] * slots
        self.cur = np.zeros(slots, np.int32)
        self.steps = 0
        self._stop = False
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

    def stop(self):
        self._stop = True

    # -- scheduler ---------------------------------------------------------
    def _free_slot(self) -> Optional[int]:
        for i, r in enumerate(self.req):
            if r is None:
                return i
        return None

    def _admit(self, slot: int, r: _Request):
        n = len(r.ids)
        bucket = -(-max(n, 1) // self.bucket) * self.bucket
        bucket = min(bucket, self.max_len)
        ids = np.zeros((1, bucket), np.int32)
        ids[0, :n] = r.ids[:bucket]
        logits, self.cache = _admit_step(
            self.model, self.cache, jnp.asarray(slot, jnp.int32),
            jnp.asarray(ids), jnp.asarray(min(n, bucket), jnp.int32), bucket)
        tok = int(np.asarray(sample_token(
            jax.random.fold_in(jax.random.PRNGKey(self.steps), slot), logits,
            r.sampling))[0])
        self.req[slot] = r
        self.emitted[slot] = 0
        self.cur[slot] = tok
        self._emit(slot, tok)

    def _emit(self, slot: int, tok: int):
        r = self.req[slot]
        r.out.put(tok)
        self.emitted[slot] += 1
        if tok in self.eos or self.emitted[slot] >= r.max_tokens:
            r.out.put(None)  # finished sentinel
            self.req[slot] = None

    def step(self) -> bool:
        """One scheduler iteration; returns True if any work was done."""
        worked = False
        while True:
            slot = self._free_slot()
            if slot is None:
                break
            try:
                r = self.pending.get_nowait()
            except queue.Empty:
                break
            self._admit(slot, r)
            worked = True
        if any(r is not None for r in self.req):
            logits, self.cache = _slot_decode(self.model, self.cache,
                                              jnp.asarray(self.cur))
            self.steps += 1
            logits_np = None
            for slot, r in enumerate(self.req):
                if r is None:
                    continue
                if logits_np is None:
                    logits_np = logits  # fetched lazily once
                tok = int(np.asarray(sample_token(
                    jax.random.fold_in(jax.random.PRNGKey(self.steps), slot),
                    logits_np[slot:slot + 1], r.sampling))[0])
                self.cur[slot] = tok
                self._emit(slot, tok)
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
