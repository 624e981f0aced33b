"""Checkpoint -> model assembly.

Counterpart of the reference's lazy-load pass (Module::load walking Layers and
pulling named tensors from ParamLoader — /root/reference/mllm/Module.hpp:215-225,
Layer.hpp:116-176).  Here loading is explicit and eager: we walk the config,
pull tensors by HF-convention names from any loader (.mllm container or
safetensors), and build the pytree model — dense bf16, or quantized
(ggml-packed weights are repacked losslessly to the TPU int4/int8 layouts;
float weights can be quantized on the fly with quant='int8'|'int4').
"""

from __future__ import annotations

from typing import Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import dtypes as dt
from ..core.config import TextConfig
from ..nn.layers import (Embedding, LayerNorm, Linear, QuantLinear,
                         QuantLinearA8, RMSNorm, RotaryEmbedding)
from ..ops.quantize_model import make_int4_linear
from ..nn.module import ModuleList
from ..ops import quant_matmul as qm
from .transformer import MLP, Attention, CausalLM, DecoderBlock, _make_norm

QuantMode = Optional[Literal["int8", "int8-a8", "int4", "int4-mixed"]]


class NameMap:
    """HF-convention weight names (the reference's QWenNameConfig pattern,
    configuration_qwen.hpp:21-77). Override fields for families that differ."""

    token_embd = "model.embed_tokens.weight"
    final_norm = "model.norm.weight"
    lm_head = "lm_head.weight"
    blk = "model.layers.{i}."
    attn_q = "self_attn.q_proj"
    attn_k = "self_attn.k_proj"
    attn_v = "self_attn.v_proj"
    attn_o = "self_attn.o_proj"
    attn_qkv = "self_attn.qkv_proj"  # fused variant (phi3)
    attn_qkv_interleaved = None  # persimmon/fuyu: rows packed [H, (q,k,v), hd]
    q_norm = "self_attn.q_norm.weight"
    k_norm = "self_attn.k_norm.weight"
    gate = "mlp.gate_proj"
    up = "mlp.up_proj"
    down = "mlp.down_proj"
    gate_up = "mlp.gate_up_proj"  # fused variant (phi3)
    attn_norm = "input_layernorm"
    ffn_norm = "post_attention_layernorm"
    pre_ffn_norm = "pre_feedforward_layernorm"  # gemma2
    post_ffn_norm = "post_feedforward_layernorm"


def _has(loader, name: str) -> bool:
    return name in loader


def load_tensor(loader, name: str, shape, dtype=np.float32) -> np.ndarray:
    return loader.load(name, shape, dtype)


def make_linear(loader, prefix: str, out_f: int, in_f: int, dtype,
                quant: QuantMode = None, bias_optional: bool = True):
    """Build Linear/QuantLinear/Int4Linear from `prefix`.weight/.bias."""
    if quant == "int4-mixed":  # non-attention tensors: plain int4
        quant = "int4"
    wname = prefix + ".weight"
    bname = prefix + ".bias"
    bias = None
    if _has(loader, bname):
        bias = jnp.asarray(load_tensor(loader, bname, (out_f,)), dtype)

    # .mllm loaders expose raw packed bytes + dtype; safetensors does not
    ldt = loader.dtype(wname) if hasattr(loader, "raw") else None
    if ldt is not None and dt.is_quantized(ldt):
        raw = loader.raw(wname)
        if ldt == dt.DataType.Q4_0:
            packed, scales, zeros = qm.prepare_int4(*qm.repack_q4_0(np.asarray(raw), out_f, in_f))
            return make_int4_linear(packed, scales, zeros, bias, k=in_f,
                                    symmetric=True)  # Q4_0: value = (q-8)*d
        if ldt == dt.DataType.Q4_K:
            p_, s_, z_ = qm.repack_q4_k(np.asarray(raw), out_f, in_f)
            p_, s_, z_ = qm.prepare_int4(p_, s_, 32, z_)
            return make_int4_linear(p_, s_, z_, bias, k=in_f)
        if ldt in (dt.DataType.Q8_0, dt.DataType.Q8_0F):
            qv, sc = qm.repack_q8_0(np.asarray(raw), out_f, in_f)
            return QuantLinear(jnp.asarray(qv), jnp.asarray(sc), bias)
        # other quant formats: dequant to float then fall through
        w = dt.decode(raw, ldt, out_f * in_f).reshape(out_f, in_f)
    else:
        w = load_tensor(loader, wname, (out_f, in_f))

    if quant in ("int8", "int8-a8"):
        qv, sc = qm.repack_float_to_int8(w)
        cls = QuantLinearA8 if quant == "int8-a8" else QuantLinear
        return cls(jnp.asarray(qv), jnp.asarray(sc), bias)
    if quant == "int4":
        packed, scales, zeros = qm.prepare_int4(*qm.repack_float_to_int4(w, 32))
        return make_int4_linear(packed, scales, zeros, bias, k=in_f,
                                symmetric=True)
    return Linear(jnp.asarray(w, dtype), bias)


def _split_rows(loader, name: str, splits: list[int], in_f: int):
    """Load a fused [sum(splits), in_f] weight and split it row-wise."""
    total = sum(splits)
    w = load_tensor(loader, name, (total, in_f))
    out = []
    o = 0
    for s in splits:
        out.append(w[o : o + s])
        o += s
    return out


def load_causal_lm(loader, cfg: TextConfig, dtype=jnp.bfloat16,
                   quant: QuantMode = None, names: NameMap = None,
                   mlp_builder=None) -> CausalLM:
    """mlp_builder(loader, layer_prefix, layer_idx) -> Module overrides the
    dense MLP (used for MoE layers)."""
    nm = names or NameMap()
    d, hd = cfg.hidden_size, cfg.head_dim_
    h, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    # "int4-mixed": attention projections stay int8 (small GEMVs live in the
    # fused XLA graph; no Pallas call boundary), MLP/head stream int4 — see
    # ops.quantize_model.quantize_model(attn_quant=...)
    aq = "int8" if quant == "int4-mixed" else quant

    embed = Embedding(jnp.asarray(load_tensor(loader, nm.token_embd, (cfg.vocab_size, d)), dtype))

    def norm_from(name, full_name=None):
        nme = full_name or name
        if cfg.norm_type == "layernorm":
            wN = nme + ".weight" if not nme.endswith(".weight") else nme
            base = wN[: -len(".weight")]
            w = jnp.asarray(load_tensor(loader, base + ".weight", (d,)), dtype)
            b = None
            if _has(loader, base + ".bias"):
                b = jnp.asarray(load_tensor(loader, base + ".bias", (d,)), dtype)
            return LayerNorm(w, b, cfg.rms_norm_eps)
        w = jnp.asarray(load_tensor(loader, nme if nme.endswith(".weight") else nme + ".weight", (d,)), dtype)
        return RMSNorm(w, cfg.rms_norm_eps, add_unit_offset=cfg.model_type.startswith("gemma"))

    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = nm.blk.format(i=i)
        # attention projections (fused-qkv checkpoints are split at load)
        if nm.attn_qkv_interleaved and _has(loader, p + nm.attn_qkv_interleaved + ".weight"):
            base = p + nm.attn_qkv_interleaved
            w = load_tensor(loader, base + ".weight", (h, 3, hd, d))
            b3 = None
            if _has(loader, base + ".bias"):
                b3 = load_tensor(loader, base + ".bias", (h, 3, hd))
            def _mk(idx):
                lw = jnp.asarray(w[:, idx].reshape(h * hd, d), dtype)
                lb = jnp.asarray(b3[:, idx].reshape(h * hd), dtype) if b3 is not None else None
                return Linear(lw, lb)
            q_proj, k_proj, v_proj = _mk(0), _mk(1), _mk(2)
        elif _has(loader, p + nm.attn_qkv + ".weight"):
            wq, wk, wv = _split_rows(loader, p + nm.attn_qkv + ".weight", [h * hd, hkv * hd, hkv * hd], d)
            q_proj = _maybe_quant_from_float(wq, dtype, aq)
            k_proj = _maybe_quant_from_float(wk, dtype, aq)
            v_proj = _maybe_quant_from_float(wv, dtype, aq)
        else:
            q_proj = make_linear(loader, p + nm.attn_q, h * hd, d, dtype, aq)
            k_proj = make_linear(loader, p + nm.attn_k, hkv * hd, d, dtype, aq)
            v_proj = make_linear(loader, p + nm.attn_v, hkv * hd, d, dtype, aq)
        o_proj = make_linear(loader, p + nm.attn_o, d, h * hd, dtype, aq)

        qn = kn = None
        if cfg.qk_norm and _has(loader, p + nm.q_norm):
            def _qknorm(name):
                w = jnp.asarray(load_tensor(loader, p + name, (hd,)), dtype)
                bias_name = p + name.replace(".weight", ".bias")
                if _has(loader, bias_name):  # persimmon-style per-head LayerNorm
                    b = jnp.asarray(load_tensor(loader, bias_name, (hd,)), dtype)
                    return LayerNorm(w, b, cfg.rms_norm_eps)
                return RMSNorm(w, cfg.rms_norm_eps)
            qn = _qknorm(nm.q_norm)
            kn = _qknorm(nm.k_norm)
        attn = Attention(q_proj, k_proj, v_proj, o_proj, qn, kn, cfg, i)

        if mlp_builder is not None:
            mlp = mlp_builder(loader, p, i)
        else:
            if _has(loader, p + nm.gate_up + ".weight"):
                wg, wu = _split_rows(loader, p + nm.gate_up + ".weight",
                                     [cfg.intermediate_size, cfg.intermediate_size], d)
                gate = _maybe_quant_from_float(wg, dtype, quant)
                up = _maybe_quant_from_float(wu, dtype, quant)
            else:
                gate = make_linear(loader, p + nm.gate, cfg.intermediate_size, d, dtype, quant)
                up = None
                if _has(loader, p + nm.up + ".weight"):
                    up = make_linear(loader, p + nm.up, cfg.intermediate_size, d, dtype, quant)
            down = make_linear(loader, p + nm.down, d, cfg.intermediate_size, dtype, quant)
            mlp = MLP(gate, up, down, cfg.hidden_act)

        pre_ffn = post_ffn = None
        if cfg.post_norm:
            pre_ffn = norm_from(p + nm.pre_ffn_norm)
            post_ffn = norm_from(p + nm.post_ffn_norm)
        blocks.append(DecoderBlock(
            norm_from(p + nm.attn_norm), attn, norm_from(p + nm.ffn_norm), mlp, pre_ffn, post_ffn
        ))

    final_norm = norm_from(nm.final_norm)
    lm_head = None
    if not cfg.tie_word_embeddings and _has(loader, nm.lm_head):
        lm_head = make_linear(loader, nm.lm_head[: -len(".weight")], cfg.vocab_size, d, dtype, quant)

    rope = RotaryEmbedding.make(
        cfg.head_dim_, cfg.max_position_embeddings, cfg.rope_theta,
        cfg.rope_style, cfg.rope_partial, cfg.rope_scaling_dict(),
    )
    return CausalLM(embed, ModuleList(blocks), final_norm, lm_head, rope, cfg)


def _maybe_quant_from_float(w: np.ndarray, dtype, quant: QuantMode):
    if quant == "int4-mixed":
        quant = "int4"
    if quant in ("int8", "int8-a8"):
        qv, sc = qm.repack_float_to_int8(w)
        cls = QuantLinearA8 if quant == "int8-a8" else QuantLinear
        return cls(jnp.asarray(qv), jnp.asarray(sc), None)
    if quant == "int4":
        packed, scales, zeros = qm.prepare_int4(*qm.repack_float_to_int4(w, 32))
        return make_int4_linear(packed, scales, zeros, None, k=w.shape[-1],
                                symmetric=True)
    return Linear(jnp.asarray(w, dtype), None)
