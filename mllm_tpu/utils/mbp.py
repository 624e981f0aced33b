"""MBP — memory-bounded pipelining for MoE expert weights.

Counterpart of the reference's expert-offload machinery
(/root/reference/mllm/models/minicpm_moe/mbp/settings_minicpm_moe_mbp.hpp:22-63,
modeling_minicpm_moe_mbp.hpp:48-132): expert weights live in host RAM and are
streamed to the device overlapping compute, with background prefetch of the
next layer's experts.  TPU-native: `jax.device_put` is itself async, so the
"loader thread" is a prefetch queue + LRU device cache keyed by
(layer, expert); the router's top-k for layer L is used to prefetch layer
L+1's likely experts (same-expert heuristic, as the reference's MBP does).
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Callable, Optional

import jax
import numpy as np


class HostExpertStore:
    """Host-resident expert weights with an LRU device cache + prefetcher.

    weights[(layer, expert)] -> pytree of numpy arrays (gate/up/down).
    """

    def __init__(self, weights: dict, device=None, max_device_entries: int = 16):
        self.host = weights
        self.device = device or jax.devices()[0]
        self.max_entries = max_device_entries
        self._cache: OrderedDict[tuple, object] = OrderedDict()
        self._lock = threading.Lock()
        self._prefetch_thread: Optional[threading.Thread] = None
        self.hits = 0
        self.misses = 0

    def _put(self, key):
        # jax.device_put is async; the transfer overlaps compute until the
        # arrays are first consumed.
        return jax.tree.map(lambda a: jax.device_put(a, self.device), self.host[key])

    def fetch(self, layer: int, expert: int):
        key = (layer, expert)
        with self._lock:
            if key in self._cache:
                self.hits += 1
                self._cache.move_to_end(key)
                return self._cache[key]
            self.misses += 1
            val = self._put(key)
            self._cache[key] = val
            while len(self._cache) > self.max_entries:
                self._cache.popitem(last=False)
            return val

    def prefetch(self, keys: list[tuple[int, int]]):
        """Asynchronously stage experts for upcoming layers (reference MBP
        worker-thread analogue)."""

        def work():
            for layer, expert in keys:
                key = (layer, expert)
                with self._lock:
                    if key in self._cache or key not in self.host:
                        continue
                    self._cache[key] = self._put(key)
                    while len(self._cache) > self.max_entries:
                        self._cache.popitem(last=False)

        t = threading.Thread(target=work, daemon=True)
        t.start()
        self._prefetch_thread = t

    def wait(self):
        if self._prefetch_thread is not None:
            self._prefetch_thread.join()

    @property
    def hit_rate(self) -> float:
        n = self.hits + self.misses
        return self.hits / n if n else 0.0


import functools

import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("top_k", "norm_topk"))
def _route(x, router_weight, top_k: int, norm_topk: bool):
    logits = jax.lax.dot_general(x, router_weight, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    top_p, top_i = jax.lax.top_k(probs, top_k)
    if norm_topk:
        top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)
    return top_p, top_i


@functools.partial(jax.jit, static_argnames=("act_fn",), donate_argnums=(0,))
def _expert_apply(y, x, wg, wu, wd, top_p, top_i, e, act_fn):
    """y += expert_e(x) * routing_weight — ONE dispatch per streamed expert
    (eager per-op dispatch costs ~25 ms each through a remote relay)."""
    w_tok = jnp.sum(jnp.where(top_i == e, top_p, 0.0), axis=-1)  # [T]
    h = act_fn(x @ wg.T) * (x @ wu.T)
    return y + (h @ wd.T).astype(jnp.float32) * w_tok[:, None]


def mbp_moe_forward(x, router_weight, store: HostExpertStore, layer: int,
                    n_layers: int, top_k: int, act_fn: Callable, norm_topk: bool = True):
    """MoE layer forward with host-streamed experts.

    Routes on-device (one jitted program), syncs ONLY the [T, k] routed-
    expert ids to the host, fetches just those experts' weights from the
    host store (async device_put, LRU-cached), and prefetches the same
    experts for layer+1 (the reference MBP reuse heuristic,
    modeling_minicpm_moe_mbp.hpp:48-132).  x: [T, d].
    """
    top_p, top_i = _route(x, router_weight, top_k, norm_topk)
    routed = sorted(set(int(e) for e in np.asarray(top_i).reshape(-1)))

    if layer + 1 < n_layers:
        store.prefetch([(layer + 1, e) for e in routed])

    y = jnp.zeros(x.shape, jnp.float32, device=x.device)
    for e in routed:
        wg, wu, wd = store.fetch(layer, e)
        y = _expert_apply(y, x, jnp.asarray(wg), jnp.asarray(wu), jnp.asarray(wd),
                          top_p, top_i, e, act_fn)
    return y.astype(x.dtype)
