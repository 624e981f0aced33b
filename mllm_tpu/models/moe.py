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
from ..nn.module import Module, ModuleList
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

    @staticmethod
    def init(key, cfg, dtype=jnp.bfloat16) -> "MoEMLP":
        """Random-weight routed FFN from a TextConfig with num_experts /
        num_experts_per_tok / moe_intermediate_size (synthetic bench builds;
        traceable under jit)."""
        import dataclasses

        from .transformer import MLP as _MLP

        d = cfg.hidden_size
        ff = cfg.intermediate_size  # from_hf_config maps moe_intermediate_size here
        e = cfg.num_experts
        ks = jax.random.split(key, 4)
        sc = 0.02
        shared = None
        if cfg.moe_shared_expert_size:
            shared = _MLP.init(
                jax.random.fold_in(key, 9),
                dataclasses.replace(cfg, intermediate_size=cfg.moe_shared_expert_size),
                dtype)
        return MoEMLP(
            jax.random.normal(ks[0], (e, d), dtype) * sc,
            jax.random.normal(ks[1], (e, d, ff), dtype) * sc,
            jax.random.normal(ks[2], (e, d, ff), dtype) * sc,
            jax.random.normal(ks[3], (e, ff, d), dtype) * sc,
            cfg.num_experts_per_tok, cfg.moe_norm_topk_prob, cfg.hidden_act,
            shared_expert=shared,
        )

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

        if t <= 16 and self._dense_decode_ok():
            # DECODE-SHAPED path: compute ALL experts densely and combine
            # with the (scattered-dense) routing probs.  At t <= 16 with
            # top-k routing, t*k draws touch most experts anyway, so the
            # ragged path streams ~the same weight bytes but pays
            # sort/gather/bincount/scatter machinery per step; the dense
            # batched einsums stream each expert weight exactly once and
            # the e/k-fold extra FLOPs are free at decode arithmetic
            # intensity.  Measured on the bench MoE geometry (16 experts,
            # b8): 978 -> ~2,900 tok/s bf16.
            y = self._dense_all_experts(xf, top_p, top_i)
        else:
            # sort (token, k) pairs by expert id -> grouped ragged_dot layout
            flat_expert = top_i.reshape(-1)  # [T*k]
            order = jnp.argsort(flat_expert)  # stable
            token_of = order // k  # source token per sorted slot
            xs = jnp.take(xf, token_of, axis=0)  # [T*k, d]
            group_sizes = jnp.bincount(flat_expert, length=e)

            expert_sorted = jnp.take(flat_expert, order)  # expert id per slot
            ys = self._expert_ffn(xs, group_sizes, expert_sorted)  # [T*k, d]

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

    def _expert_ffn(self, xs, group_sizes, expert_sorted):
        """Gated FFN over expert-sorted rows — subclass hook (quantization)."""
        h = jax.lax.ragged_dot(xs, self.w_gate.astype(xs.dtype), group_sizes)
        u = jax.lax.ragged_dot(xs, self.w_up.astype(xs.dtype), group_sizes)
        hu = ACT_FN[self.act](h) * u
        return jax.lax.ragged_dot(hu, self.w_down.astype(xs.dtype), group_sizes)

    def _dense_decode_ok(self) -> bool:
        """Subclasses without dense expert stacks opt out."""
        return True

    def _dense_all_experts(self, xf, top_p, top_i):
        """All-experts batched FFN + dense prob combine (decode shapes).
        xf [T, d] -> y [T, d]; subclass hook (quantization)."""
        t = xf.shape[0]
        e = self.w_gate.shape[0]
        xc = xf.astype(self.w_gate.dtype)
        g = jnp.einsum("td,edf->etf", xc, self.w_gate,
                       preferred_element_type=jnp.float32)
        u = jnp.einsum("td,edf->etf", xc, self.w_up,
                       preferred_element_type=jnp.float32)
        h = (ACT_FN[self.act](g) * u).astype(self.w_down.dtype)
        yall = jnp.einsum("etf,efd->etd", h, self.w_down,
                          preferred_element_type=jnp.float32)  # [E, T, d]
        dense_p = jnp.zeros((t, e), jnp.float32).at[
            jnp.arange(t)[:, None], top_i].set(top_p)
        return jnp.einsum("etd,te->td", yall, dense_p).astype(xf.dtype)


class QuantMoEMLP(MoEMLP):
    """MoEMLP with int8 per-(expert, out-channel) expert weights.

    Counterpart of the reference running its MoE models quantized
    (/root/reference/mllm/models/minicpm_moe/ + tools/quantizer: expert
    FFNs are quantized like any other Linear).  Expert stacks stream at
    half the bf16 bytes; scales are applied to the ragged_dot outputs,
    gathered per sorted slot (y_row = (x @ q_e) * s_e for that row's
    expert), which is exactly per-out-channel symmetric dequant.

    w_gate/w_up: int8 [E, d, ff] + s_gate/s_up f32 [E, ff];
    w_down: int8 [E, ff, d] + s_down f32 [E, d].
    """

    def __init__(self, router_weight, w_gate, s_gate, w_up, s_up, w_down,
                 s_down, top_k: int, norm_topk_prob: bool, act: str,
                 shared_expert: Optional[MLP] = None,
                 shared_gate: Optional[jax.Array] = None):
        self.router_weight = router_weight
        self.w_gate = w_gate
        self.s_gate = s_gate
        self.w_up = w_up
        self.s_up = s_up
        self.w_down = w_down
        self.s_down = s_down
        self.top_k = top_k
        self.norm_topk_prob = norm_topk_prob
        self.act = act
        self.shared_expert = shared_expert
        self.shared_gate = shared_gate

    def _expert_ffn(self, xs, group_sizes, expert_sorted):
        xb = xs.astype(jnp.bfloat16)
        h = jax.lax.ragged_dot(xb, self.w_gate.astype(jnp.bfloat16), group_sizes,
                               preferred_element_type=jnp.float32)
        h = h * jnp.take(self.s_gate, expert_sorted, axis=0)
        u = jax.lax.ragged_dot(xb, self.w_up.astype(jnp.bfloat16), group_sizes,
                               preferred_element_type=jnp.float32)
        u = u * jnp.take(self.s_up, expert_sorted, axis=0)
        hu = (ACT_FN[self.act](h) * u).astype(jnp.bfloat16)
        ys = jax.lax.ragged_dot(hu, self.w_down.astype(jnp.bfloat16), group_sizes,
                                preferred_element_type=jnp.float32)
        return (ys * jnp.take(self.s_down, expert_sorted, axis=0)).astype(xs.dtype)

    def _dense_all_experts(self, xf, top_p, top_i):
        """Dense decode path over int8 expert stacks: XLA fuses the
        int8->bf16 convert into each batched einsum's weight read, and the
        per-(expert, out-channel) scales apply to the [E, T, *] partials."""
        t = xf.shape[0]
        e = self.w_gate.shape[0]
        xb = xf.astype(jnp.bfloat16)
        g = jnp.einsum("td,edf->etf", xb, self.w_gate.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32) * self.s_gate[:, None, :]
        u = jnp.einsum("td,edf->etf", xb, self.w_up.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32) * self.s_up[:, None, :]
        h = (ACT_FN[self.act](g) * u).astype(jnp.bfloat16)
        yall = jnp.einsum("etf,efd->etd", h, self.w_down.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32) * self.s_down[:, None, :]
        dense_p = jnp.zeros((t, e), jnp.float32).at[
            jnp.arange(t)[:, None], top_i].set(top_p)
        return jnp.einsum("etd,te->td", yall, dense_p).astype(xf.dtype)

    @staticmethod
    def from_moe(moe: MoEMLP) -> "QuantMoEMLP":
        """Quantize a bf16/f32 MoEMLP's expert stacks (jit-friendly)."""
        (qg, sg), (qu, su), (qd, sd) = (
            _quant_expert_stack(moe.w_gate),
            _quant_expert_stack(moe.w_up),
            _quant_expert_stack(moe.w_down),
        )
        return QuantMoEMLP(moe.router_weight, qg, sg, qu, su, qd, sd,
                           moe.top_k, moe.norm_topk_prob, moe.act,
                           shared_expert=moe.shared_expert,
                           shared_gate=moe.shared_gate)


def _quant_expert_stack(w):
    """[..., E, K, N] float -> (int8 same shape, scales f32 [..., E, N])
    per-(expert, out-channel); leading dims pass through (stacked layers)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2)  # [..., E, N]
    sc = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / sc[..., None, :]), -127, 127).astype(jnp.int8)
    return q, sc


class MBPMoEMLP(Module):
    """MoE FFN with host-resident experts (MBP, memory-bounded pipelining).

    TPU-native counterpart of the reference's MBP MoE layer
    (/root/reference/mllm/models/minicpm_moe/mbp/modeling_minicpm_moe_mbp.hpp:48-132):
    expert weights live in host RAM inside a `HostExpertStore`; each forward
    routes on device, streams only the routed experts over PCIe (async
    `device_put`, LRU-cached), and prefetches the same experts for the next
    layer — the reference's worker-thread reuse heuristic.  The router,
    norms, attention and optional shared expert stay device-resident.

    Host-driven by construction: the routed-expert set is data-dependent, so
    this layer must run EAGERLY (outside jit) — exactly as the reference's
    MBP path runs outside its graph executor.  Use `to_mbp()` to convert a
    loaded MoE model; capacity (experts ≫ HBM) is the point, not latency.
    """

    def __init__(self, router_weight, store, layer: int, n_layers: int,
                 top_k: int, norm_topk_prob: bool, act: str,
                 shared_expert: Optional[MLP] = None, shared_gate: Optional[jax.Array] = None):
        self.router_weight = router_weight
        self.store = store  # HostExpertStore — static (host object), not a leaf
        self.layer = layer
        self.n_layers = n_layers
        self.top_k = top_k
        self.norm_topk_prob = norm_topk_prob
        self.act = act
        self.shared_expert = shared_expert
        self.shared_gate = shared_gate

    def __call__(self, x):
        if isinstance(x, jax.core.Tracer):
            raise RuntimeError(
                "MBPMoEMLP routes data-dependently through a host expert store "
                "and cannot run under jit — call the model eagerly (see demo_llm --mbp)")
        from ..utils.mbp import mbp_moe_forward

        b, s, d = x.shape
        xf = x.reshape(b * s, d)
        y = mbp_moe_forward(xf, self.router_weight, self.store, self.layer,
                            self.n_layers, self.top_k, ACT_FN[self.act],
                            norm_topk=self.norm_topk_prob)
        if self.shared_expert is not None:
            sh = self.shared_expert(xf)
            if self.shared_gate is not None:
                g = jax.nn.sigmoid(
                    jax.lax.dot_general(xf, self.shared_gate, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                )
                sh = sh * g.astype(sh.dtype)
            y = y + sh.astype(y.dtype)
        return y.reshape(b, s, d).astype(x.dtype)


def to_mbp(model, max_device_entries: int = 16, device=None):
    """Convert a loaded MoE CausalLM to MBP form: expert weights move to a
    host `HostExpertStore`; every `MoEMLP` becomes an `MBPMoEMLP`.

    Returns (mbp_model, store).  `store.hit_rate` reports the prefetch hit
    rate after generation (reference MBP's loader-thread effectiveness).
    `max_device_entries` bounds device-resident experts (the MBP memory
    budget — reference settings_minicpm_moe_mbp.hpp:22-63).
    """
    from ..utils.mbp import HostExpertStore

    blocks = getattr(model.blocks, "mods", None)
    if blocks is None or not blocks:
        raise ValueError("to_mbp needs an unstacked model (model.unstack())")
    weights = {}
    n_layers = len(blocks)
    new_blocks = []
    store = HostExpertStore(weights, device=device, max_device_entries=max_device_entries)
    for li, blk in enumerate(blocks):
        mlp = blk.mlp
        if not isinstance(mlp, MoEMLP):
            new_blocks.append(blk)
            continue
        e = mlp.w_gate.shape[0]
        quant = isinstance(mlp, QuantMoEMLP)
        for ei in range(e):
            # host layout per expert: gate/up [ff, d], down [d, ff] (HF
            # row-major, what mbp_moe_forward consumes).  Quantized experts
            # dequantize on copy (int8 [d, ff] * per-out-channel scale [ff])
            # so the host store always holds ready-to-stream float weights —
            # mbp_moe_forward has no scale channel.
            if quant:
                g = np.asarray(mlp.w_gate[ei], np.float32) * np.asarray(mlp.s_gate[ei])[None, :]
                u = np.asarray(mlp.w_up[ei], np.float32) * np.asarray(mlp.s_up[ei])[None, :]
                d = np.asarray(mlp.w_down[ei], np.float32) * np.asarray(mlp.s_down[ei])[None, :]
            else:
                g, u, d = (np.asarray(mlp.w_gate[ei]), np.asarray(mlp.w_up[ei]),
                           np.asarray(mlp.w_down[ei]))
            weights[(li, ei)] = (
                np.ascontiguousarray(g.T),
                np.ascontiguousarray(u.T),
                np.ascontiguousarray(d.T),
            )
        new_blocks.append(blk.replace(mlp=MBPMoEMLP(
            mlp.router_weight, store, li, n_layers, mlp.top_k,
            mlp.norm_topk_prob, mlp.act, mlp.shared_expert, mlp.shared_gate,
        )))
    if not weights:
        raise ValueError("model has no MoEMLP layers to offload")
    return model.replace(blocks=ModuleList(new_blocks)), store


import functools


@jax.jit
def _mbp_embed(embed, ids, mult):
    x = embed(ids)
    return x * mult.astype(x.dtype)


@functools.partial(jax.jit, donate_argnums=(2,))
def _mbp_attn_half(blk, rope, cache, x):
    """input_norm + attention + residual + post_attn_norm as ONE program
    (per-op eager dispatch costs ~25 ms each through a remote relay)."""
    rm = blk.attn.cfg.residual_multiplier
    s = x.shape[1]
    pos0 = cache.pos
    if getattr(pos0, "ndim", 0) == 1:
        pos0 = pos0[:, None]
    positions = pos0 + jnp.arange(s, dtype=jnp.int32)[None, :]
    h = blk.input_norm(x)
    h, cache = blk.attn(h, rope, cache, positions)
    if blk.pre_ffn_norm is not None:
        h = blk.pre_ffn_norm(h)
    x = x + (h if rm == 1.0 else h * jnp.asarray(rm, h.dtype))
    return x, blk.post_attn_norm(x), cache


@jax.jit
def _mbp_residual(blk, x, h):
    rm = blk.attn.cfg.residual_multiplier
    if blk.post_ffn_norm is not None:
        h = blk.post_ffn_norm(h)
    return x + (h if rm == 1.0 else h * jnp.asarray(rm, h.dtype))


@functools.partial(jax.jit, static_argnames=("last_only",))
def _mbp_head(model_nb, x, last_only: bool):
    x = model_nb.norm(x)
    if last_only:
        x = x[:, -1:, :]
    return model_nb.logits(x)


def mbp_forward(model, ids, cache, last_only: bool = True):
    """Forward an MBP-converted model: dense sub-blocks (embed, attention
    halves, head) each run as one jitted program; only the MoE expert
    streaming is host-driven.  ~4 device dispatches + E_routed expert
    programs per layer instead of hundreds of eager ops — the TPU twin of
    the reference MBP's compute/transfer overlap
    (modeling_minicpm_moe_mbp.hpp:48-132).

    Returns (logits, cache-with-pos-advanced)."""
    s = ids.shape[1]
    mult = jnp.asarray(model.cfg.embedding_multiplier, jnp.float32)
    x = _mbp_embed(model.embed_tokens, ids, mult)
    for blk in model.blocks:
        x, h, cache = _mbp_attn_half(blk, model.rope, cache, x)
        h = blk.mlp(h)  # MBPMoEMLP: routed host-streamed experts
        x = _mbp_residual(blk, x, h)
    logits = _mbp_head(model.replace(blocks=ModuleList([])), x, last_only)
    return logits, cache.advance(s)


def load_moe_mlp(loader, prefix: str, cfg: TextConfig, dtype=jnp.bfloat16,
                 expert_prefix: str = "experts.{e}.", router_name: str = "gate",
                 shared_prefix: Optional[str] = None, shared_gate_name: Optional[str] = None,
                 expert_ff: Optional[int] = None, quant=None) -> MoEMLP:
    """Assemble a MoEMLP from per-expert HF weights (stacked at load).
    quant='int8'/'int4' quantizes the expert stacks (int8 per-(expert,
    out-channel)) and the shared expert like the rest of the model."""
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
    moe = MoEMLP(router, w_gate, w_up, w_down, cfg.num_experts_per_tok,
                 cfg.moe_norm_topk_prob, cfg.hidden_act, shared, sgate)
    if quant in ("int8", "int8-a8", "int4"):
        from ..ops.quantize_model import quantize_model

        # min_size=1: quant here is an explicit per-model request and the
        # expert stacks are the dominant weights — no size gate.  "int8-a8"
        # maps the expert stacks to plain int8 (ragged expert dots have no
        # A8 path; the dense attn/shared projections get A8 elsewhere).
        moe = quantize_model(moe, "int8" if quant == "int8-a8" else quant,
                             min_size=1, quant_embed_head=False)
    return moe
