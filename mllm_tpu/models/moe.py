"""Mixture-of-Experts — counterpart of the reference's MoE models
(/root/reference/mllm/models/minicpm_moe/modeling_minicpm_moe.hpp:41-88,
ling/, smallthinker/): router top-k + expert FFNs + weighted combine.

The reference routes with tensor-function chains
(topk -> argsort -> bincount -> clip -> experts -> scatter_add); the
TPU-native formulation sorts token-expert pairs by expert and runs ONE
grouped matmul per projection via `jax.lax.ragged_dot` (MXU-native,
no per-expert host loop), then unsorts and combines.  Expert weights are
stacked [E, ...] so expert parallelism is a sharding annotation away.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TextConfig
from ..nn.layers import ACT_FN, Linear
from ..nn.module import Module
from .transformer import MLP


class MoEMLP(Module):
    """Top-k routed expert FFN with optional shared expert.

    router_weight: [E, d]
    w_gate, w_up:  [E, d, ff]   (k-major for ragged_dot)
    w_down:        [E, ff, d]
    """

    def __init__(self, router_weight, w_gate, w_up, w_down, top_k: int,
                 norm_topk_prob: bool, act: str,
                 shared_expert: Optional[MLP] = None, shared_gate: Optional[jax.Array] = None):
        self.router_weight = router_weight
        self.w_gate = w_gate
        self.w_up = w_up
        self.w_down = w_down
        self.top_k = top_k
        self.norm_topk_prob = norm_topk_prob
        self.act = act
        self.shared_expert = shared_expert
        self.shared_gate = shared_gate  # [1, d] -> sigmoid gate (qwen2_moe)

    def __call__(self, x):
        b, s, d = x.shape
        t = b * s
        k = self.top_k
        e = self.w_gate.shape[0]
        xf = x.reshape(t, d)

        router_logits = jax.lax.dot_general(
            xf, self.router_weight, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, E]
        probs = jax.nn.softmax(router_logits, axis=-1)
        top_p, top_i = jax.lax.top_k(probs, k)  # [T, k]
        if self.norm_topk_prob:
            top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)

        # sort (token, k) pairs by expert id -> grouped layout for ragged_dot
        flat_expert = top_i.reshape(-1)  # [T*k]
        order = jnp.argsort(flat_expert)  # stable
        token_of = order // k  # source token per sorted slot
        xs = jnp.take(xf, token_of, axis=0)  # [T*k, d]
        group_sizes = jnp.bincount(flat_expert, length=e)

        h = jax.lax.ragged_dot(xs, self.w_gate.astype(xs.dtype), group_sizes)
        u = jax.lax.ragged_dot(xs, self.w_up.astype(xs.dtype), group_sizes)
        hu = ACT_FN[self.act](h) * u
        ys = jax.lax.ragged_dot(hu, self.w_down.astype(xs.dtype), group_sizes)  # [T*k, d]

        # unsort and combine with routing weights
        y_pairs = jnp.zeros_like(ys).at[order].set(ys).reshape(t, k, d)
        y = jnp.sum(y_pairs * top_p[..., None].astype(ys.dtype), axis=1)

        if self.shared_expert is not None:
            sh = self.shared_expert(xf)
            if self.shared_gate is not None:
                g = jax.nn.sigmoid(
                    jax.lax.dot_general(xf, self.shared_gate, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                )
                sh = sh * g.astype(sh.dtype)
            y = y + sh
        return y.reshape(b, s, d).astype(x.dtype)


def load_moe_mlp(loader, prefix: str, cfg: TextConfig, dtype=jnp.bfloat16,
                 expert_prefix: str = "experts.{e}.", router_name: str = "gate",
                 shared_prefix: Optional[str] = None, shared_gate_name: Optional[str] = None,
                 expert_ff: Optional[int] = None) -> MoEMLP:
    """Assemble a MoEMLP from per-expert HF weights (stacked at load)."""
    d = cfg.hidden_size
    e = cfg.num_experts
    ff = expert_ff or cfg.intermediate_size
    router = jnp.asarray(loader.load(prefix + router_name + ".weight", (e, d)), dtype)
    gates, ups, downs = [], [], []
    for i in range(e):
        ep = prefix + expert_prefix.format(e=i)
        gates.append(loader.load(ep + "gate_proj.weight", (ff, d)).T)
        ups.append(loader.load(ep + "up_proj.weight", (ff, d)).T)
        downs.append(loader.load(ep + "down_proj.weight", (d, ff)).T)
    w_gate = jnp.asarray(np.stack(gates), dtype)  # [E, d, ff]
    w_up = jnp.asarray(np.stack(ups), dtype)
    w_down = jnp.asarray(np.stack(downs), dtype)  # [E, ff, d]

    shared = None
    sgate = None
    if shared_prefix is not None and (prefix + shared_prefix + "gate_proj.weight") in loader:
        sp = prefix + shared_prefix
        sff = cfg.moe_shared_expert_size or ff
        shared = MLP(
            Linear(jnp.asarray(loader.load(sp + "gate_proj.weight", (sff, d)), dtype), None),
            Linear(jnp.asarray(loader.load(sp + "up_proj.weight", (sff, d)), dtype), None),
            Linear(jnp.asarray(loader.load(sp + "down_proj.weight", (d, sff)), dtype), None),
            cfg.hidden_act,
        )
        if shared_gate_name and (prefix + shared_gate_name + ".weight") in loader:
            sgate = jnp.asarray(loader.load(prefix + shared_gate_name + ".weight", (1, d)), dtype)
    return MoEMLP(router, w_gate, w_up, w_down, cfg.num_experts_per_tok,
                  cfg.moe_norm_topk_prob, cfg.hidden_act, shared, sgate)
