"""DeepSeek-V3-class models: MLA (multi-head latent attention) + grouped
sigmoid-routed MoE.

Covers the MiniCPM3/DeepSeek architecture family (the reference's ds_qwen2 is
a distilled *qwen2*; this adds the real MLA arch the reference lacks).

MLA here caches the per-head K (nope+rope concat) and V like regular
attention (correctness-first; the compressed-latent cache is an optimization
pass).  K and V head dims differ (qk_head_dim vs v_head_dim) — the cache
holds differently-shaped k/v arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TextConfig
from ..kv.cache import KVCache
from ..nn.attention import sdpa
from ..nn.layers import Embedding, Linear, RMSNorm, RotaryEmbedding
from ..nn.module import Module, ModuleList
from .moe import MoEMLP
from .transformer import MLP, CausalLM, DecoderBlock, _make_norm


@dataclass(frozen=True)
class MLAConfig:
    q_lora_rank: Optional[int] = 1536
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    rope_interleave: bool = True

    @property
    def qk_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim


class MLAAttention(Module):
    """Multi-head latent attention (DeepseekV3Attention semantics)."""

    def __init__(self, q_a, q_a_norm, q_b, q_full, kv_a, kv_a_norm, kv_b, o_proj,
                 cfg: TextConfig, mla: MLAConfig, layer_idx: int):
        self.q_a = q_a  # [q_lora, d] or None
        self.q_a_norm = q_a_norm
        self.q_b = q_b  # [H*qk_head, q_lora]
        self.q_full = q_full  # [H*qk_head, d] when q_lora_rank is None
        self.kv_a = kv_a  # [kv_lora + rope, d]
        self.kv_a_norm = kv_a_norm
        self.kv_b = kv_b  # [H*(nope+v), kv_lora]
        self.o_proj = o_proj
        self.cfg = cfg
        self.mla = mla
        self.layer_idx = layer_idx

    def __call__(self, x, rope: RotaryEmbedding, cache: Optional[KVCache], positions,
                 kv_start=None, layer_idx=None, bias=None, causal=True, ring=None):
        assert ring is None, "sequence-parallel ring attention not supported for MLA"
        cfg, mla = self.cfg, self.mla
        if layer_idx is None:
            layer_idx = self.layer_idx
        b, s, _ = x.shape
        h = cfg.num_attention_heads

        if self.q_full is not None:
            q = self.q_full(x)
        else:
            q = self.q_b(self.q_a_norm(self.q_a(x)))
        q = q.reshape(b, s, h, mla.qk_head_dim)
        q_nope = q[..., : mla.qk_nope_head_dim]
        q_rot = q[..., mla.qk_nope_head_dim :]

        ckv = self.kv_a(x)  # [b, s, kv_lora + rope]
        k_latent = ckv[..., : mla.kv_lora_rank]
        k_rot = ckv[..., mla.kv_lora_rank :].reshape(b, s, 1, mla.qk_rope_head_dim)

        kv = self.kv_b(self.kv_a_norm(k_latent)).reshape(
            b, s, h, mla.qk_nope_head_dim + mla.v_head_dim
        )
        k_nope = kv[..., : mla.qk_nope_head_dim]
        v = kv[..., mla.qk_nope_head_dim :]

        style = "llama" if mla.rope_interleave else "hf"
        q_rot = _rope_apply(rope, q_rot, positions, style)
        k_rot = _rope_apply(rope, k_rot, positions, style)
        k_rot = jnp.broadcast_to(k_rot, (b, s, h, mla.qk_rope_head_dim))

        k = jnp.concatenate([k_nope, k_rot], axis=-1)  # [b, s, h, qk_head]
        scale = mla.qk_head_dim**-0.5

        if cache is not None:
            cache = cache.update_layer(layer_idx, k, v)
            k_full, v_full = cache.layer(layer_idx)
            q_offset, kv_valid = cache.pos, cache.pos + s
        else:
            k_full = jnp.transpose(k, (0, 2, 1, 3))
            v_full = jnp.transpose(v, (0, 2, 1, 3))
            q_offset, kv_valid = 0, None

        out = sdpa(q, k_full, v_full, q_offset=q_offset, kv_valid_len=kv_valid,
                   kv_start=kv_start, causal=causal, bias=bias, scale=scale)
        return self.o_proj(out.reshape(b, s, h * mla.v_head_dim)), cache


def _rope_apply(rope: RotaryEmbedding, x, positions, style):
    from ..nn.layers import apply_rotary

    sin = jnp.take(rope.sin, positions, axis=0)[..., None, :]
    cos = jnp.take(rope.cos, positions, axis=0)[..., None, :]
    return apply_rotary(x, sin, cos, style, rope.rot_dim)


class GroupedTopkRouter(Module):
    """DeepseekV3TopkRouter: sigmoid scores + correction bias, group-limited
    top-k (top-2-sum group score, keep topk_group groups)."""

    def __init__(self, weight, bias, top_k, n_group, topk_group, norm_topk,
                 routed_scaling):
        self.weight = weight  # [E, d]
        self.bias = bias  # [E]
        self.top_k = top_k
        self.n_group = n_group
        self.topk_group = topk_group
        self.norm_topk = norm_topk
        self.routed_scaling = routed_scaling

    def __call__(self, x2d):
        e = self.weight.shape[0]
        logits = jax.lax.dot_general(
            x2d.astype(jnp.float32), self.weight.astype(jnp.float32),
            (((1,), (1,)), ((), ())))
        scores = jax.nn.sigmoid(logits)  # [T, E]
        choice = scores + self.bias[None]
        per_group = choice.reshape(-1, self.n_group, e // self.n_group)
        group_scores = jnp.sum(jax.lax.top_k(per_group, 2)[0], axis=-1)  # [T, G]
        _, gidx = jax.lax.top_k(group_scores, self.topk_group)
        gmask = jnp.zeros_like(group_scores).at[
            jnp.arange(group_scores.shape[0])[:, None], gidx].set(1.0)
        smask = jnp.repeat(gmask, e // self.n_group, axis=-1)
        masked = jnp.where(smask > 0, choice, 0.0)
        _, top_i = jax.lax.top_k(masked, self.top_k)
        top_w = jnp.take_along_axis(scores, top_i, axis=-1)  # weights WITHOUT bias
        if self.norm_topk:
            top_w = top_w / (jnp.sum(top_w, axis=-1, keepdims=True) + 1e-20)
        return top_i, top_w * self.routed_scaling


class DeepseekMoE(Module):
    """Routed experts (ragged_dot dispatch) + shared experts."""

    def __init__(self, router: GroupedTopkRouter, w_gate, w_up, w_down,
                 shared: Optional[MLP], act: str):
        self.router = router
        self.w_gate = w_gate  # [E, d, ff]
        self.w_up = w_up
        self.w_down = w_down  # [E, ff, d]
        self.shared = shared
        self.act = act

    def __call__(self, x):
        from ..nn.layers import ACT_FN

        b, s, d = x.shape
        t = b * s
        k = self.router.top_k
        e = self.w_gate.shape[0]
        xf = x.reshape(t, d)
        top_i, top_w = self.router(xf)
        flat = top_i.reshape(-1)
        order = jnp.argsort(flat)
        token_of = order // k
        xs = jnp.take(xf, token_of, axis=0)
        group_sizes = jnp.bincount(flat, length=e)
        hdn = jax.lax.ragged_dot(xs, self.w_gate.astype(xs.dtype), group_sizes)
        u = jax.lax.ragged_dot(xs, self.w_up.astype(xs.dtype), group_sizes)
        ys = jax.lax.ragged_dot(ACT_FN[self.act](hdn) * u, self.w_down.astype(xs.dtype),
                                group_sizes)
        y = jnp.zeros_like(ys).at[order].set(ys).reshape(t, k, d)
        y = jnp.sum(y * top_w[..., None].astype(ys.dtype), axis=1)
        if self.shared is not None:
            y = y + self.shared(xf)
        return y.reshape(b, s, d).astype(x.dtype)


def deepseek_config_from_hf(path_or_dict):
    import json, os

    c = path_or_dict
    if not isinstance(c, dict):
        p = os.fspath(c)
        if os.path.isdir(p):
            p = os.path.join(p, "config.json")
        with open(p) as f:
            c = json.load(f)
    from ..core.config import from_hf_config

    text = from_hf_config({k: v for k, v in c.items()}, model_type="deepseek_v3")
    mla = MLAConfig(
        q_lora_rank=c.get("q_lora_rank"),
        kv_lora_rank=c.get("kv_lora_rank", 512),
        qk_nope_head_dim=c.get("qk_nope_head_dim", 128),
        qk_rope_head_dim=c.get("qk_rope_head_dim", 64),
        v_head_dim=c.get("v_head_dim", 128),
        rope_interleave=c.get("rope_interleave", True),
    )
    moe_cfg = dict(
        n_routed_experts=c.get("n_routed_experts", 0),
        num_experts_per_tok=c.get("num_experts_per_tok", 8),
        n_group=c.get("n_group", 1),
        topk_group=c.get("topk_group", 1),
        norm_topk_prob=c.get("norm_topk_prob", True),
        routed_scaling_factor=c.get("routed_scaling_factor", 1.0),
        n_shared_experts=c.get("n_shared_experts", 0),
        first_k_dense_replace=c.get("first_k_dense_replace", 0),
        moe_intermediate_size=c.get("moe_intermediate_size", c.get("intermediate_size")),
    )
    return text, mla, moe_cfg


def load_deepseek(loader, text: TextConfig, mla: MLAConfig, moe_cfg: dict,
                  dtype=jnp.bfloat16):
    d = text.hidden_size
    h = text.num_attention_heads

    def lin(prefix, out_f, in_f, required=True):
        name = prefix + ".weight"
        if not required and name not in loader:
            return None
        w = jnp.asarray(loader.load(name, (out_f, in_f)), dtype)
        b = None
        if prefix + ".bias" in loader:
            b = jnp.asarray(loader.load(prefix + ".bias", (out_f,)), dtype)
        return Linear(w, b)

    def rms(name, dim):
        return RMSNorm(jnp.asarray(loader.load(name + ".weight", (dim,)), dtype),
                       text.rms_norm_eps)

    embed = Embedding(jnp.asarray(loader.load("model.embed_tokens.weight",
                                              (text.vocab_size, d)), dtype))
    blocks = []
    for i in range(text.num_hidden_layers):
        p = f"model.layers.{i}."
        if mla.q_lora_rank:
            q_a = lin(p + "self_attn.q_a_proj", mla.q_lora_rank, d)
            q_a_norm = rms(p + "self_attn.q_a_layernorm", mla.q_lora_rank)
            q_b = lin(p + "self_attn.q_b_proj", h * mla.qk_head_dim, mla.q_lora_rank)
            q_full = None
        else:
            q_a = q_a_norm = q_b = None
            q_full = lin(p + "self_attn.q_proj", h * mla.qk_head_dim, d)
        attn = MLAAttention(
            q_a, q_a_norm, q_b, q_full,
            lin(p + "self_attn.kv_a_proj_with_mqa", mla.kv_lora_rank + mla.qk_rope_head_dim, d),
            rms(p + "self_attn.kv_a_layernorm", mla.kv_lora_rank),
            lin(p + "self_attn.kv_b_proj", h * (mla.qk_nope_head_dim + mla.v_head_dim),
                mla.kv_lora_rank),
            lin(p + "self_attn.o_proj", d, h * mla.v_head_dim),
            text, mla, i,
        )
        if moe_cfg["n_routed_experts"] and i >= moe_cfg["first_k_dense_replace"]:
            e = moe_cfg["n_routed_experts"]
            ff = moe_cfg["moe_intermediate_size"]
            router = GroupedTopkRouter(
                jnp.asarray(loader.load(p + "mlp.gate.weight", (e, d)), jnp.float32),
                jnp.asarray(loader.load(p + "mlp.gate.e_score_correction_bias", (e,)), jnp.float32),
                moe_cfg["num_experts_per_tok"], moe_cfg["n_group"], moe_cfg["topk_group"],
                moe_cfg["norm_topk_prob"], moe_cfg["routed_scaling_factor"],
            )
            g, u, dn = [], [], []
            for j in range(e):
                ep = f"{p}mlp.experts.{j}."
                g.append(loader.load(ep + "gate_proj.weight", (ff, d)).T)
                u.append(loader.load(ep + "up_proj.weight", (ff, d)).T)
                dn.append(loader.load(ep + "down_proj.weight", (d, ff)).T)
            shared = None
            if moe_cfg["n_shared_experts"]:
                sff = ff * moe_cfg["n_shared_experts"]
                shared = MLP(
                    lin(p + "mlp.shared_experts.gate_proj", sff, d),
                    lin(p + "mlp.shared_experts.up_proj", sff, d),
                    lin(p + "mlp.shared_experts.down_proj", d, sff),
                    text.hidden_act,
                )
            mlp = DeepseekMoE(router, jnp.asarray(np.stack(g), dtype),
                              jnp.asarray(np.stack(u), dtype),
                              jnp.asarray(np.stack(dn), dtype), shared, text.hidden_act)
        else:
            mlp = MLP(
                lin(p + "mlp.gate_proj", text.intermediate_size, d),
                lin(p + "mlp.up_proj", text.intermediate_size, d),
                lin(p + "mlp.down_proj", d, text.intermediate_size),
                text.hidden_act,
            )
        blocks.append(DecoderBlock(
            rms(p + "input_layernorm", d), attn, rms(p + "post_attention_layernorm", d), mlp,
        ))
    norm = rms("model.norm", d)
    lm_head = None
    if not text.tie_word_embeddings and "lm_head.weight" in loader:
        lm_head = lin("lm_head", text.vocab_size, d)
    rope = RotaryEmbedding.make(mla.qk_rope_head_dim, text.max_position_embeddings,
                                text.rope_theta, "hf", 1.0, None)
    model = DeepseekForCausalLM(embed, ModuleList(blocks), norm, lm_head, rope, text, mla)
    return model


class DeepseekForCausalLM(CausalLM):
    """CausalLM whose cache has split K/V head dims (MLA)."""

    def __init__(self, embed_tokens, blocks, norm, lm_head, rope, cfg, mla: MLAConfig):
        super().__init__(embed_tokens, blocks, norm, lm_head, rope, cfg)
        self.mla = mla

    def init_cache(self, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
        cfg, mla = self.cfg, self.mla
        h = cfg.num_attention_heads
        kshape = (cfg.num_hidden_layers, batch, h, max_len, mla.qk_head_dim)
        vshape = (cfg.num_hidden_layers, batch, h, max_len, mla.v_head_dim)
        return KVCache(jnp.zeros(kshape, dtype), jnp.zeros(vshape, dtype),
                       jnp.zeros((), jnp.int32))


def minicpm3_config_from_hf(path_or_dict):
    """MiniCPM3 = MLA attention (DeepseekV2-style, dense MLP) + MiniCPM
    residual/embedding/logit scalings (reference models/minicpm3/)."""
    import json, math, os

    c = path_or_dict
    if not isinstance(c, dict):
        p = os.fspath(c)
        if os.path.isdir(p):
            p = os.path.join(p, "config.json")
        with open(p) as f:
            c = json.load(f)
    text, mla, moe_cfg = deepseek_config_from_hf(c)
    sd = float(c.get("scale_depth", 1.0))
    text = text.replace(
        model_type="minicpm3",
        residual_multiplier=sd / math.sqrt(c.get("num_hidden_layers", 1)),
        embedding_multiplier=float(c.get("scale_emb", 1.0)),
        logit_divisor=float(c.get("hidden_size", 1)) / float(c.get("dim_model_base", c.get("hidden_size", 1))),
    )
    moe_cfg["n_routed_experts"] = 0  # minicpm3 is dense
    return text, mla, moe_cfg
