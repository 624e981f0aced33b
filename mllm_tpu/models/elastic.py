"""Elastic and predictor-sparse inference wiring.

Counterparts of the reference's width-elastic and PowerInfer-style sparse
LLaMA variants:
  /root/reference/mllm/models/llama/modeling_elastic_llama.hpp (ElasticLinear
  per-step activate_dims; demo examples/demo_elastic_llama.cpp:43-52)
  /root/reference/mllm/models/llama/modeling_sparse_llama.hpp (Predictor +
  SparseLinear/SparseIdLinear, ops op/CPUSparseLinear.cpp)

TPU-native design: instead of per-op dynamic activate_dims (which would force
a recompile per step anyway under XLA's static-shape model), `elastic_model`
slices the weight pytree ONCE on device into a smaller standard CausalLM —
first `ratio` fraction of heads / FFN neurons, exactly the reference's
"first activate_dim columns" semantics.  Every existing program (prefill,
decode, chunked prefill, speculative) then compiles for the reduced shapes
and runs proportionally faster — the idiomatic equivalent of the reference's
eager per-call slicing.

`sparse_model` swaps each block's MLP for PredictorSparseMLP (nn/layers.py):
a low-rank predictor scores FFN neurons per token and inactive neurons are
masked.  On the MXU, dense-compute-then-mask is the fast formulation; the
semantics (masked neurons contribute exactly zero) match the reference's
gather-style sparse kernels.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ..nn.layers import Linear, PredictorSparseMLP, QuantLinear
from ..nn.module import ModuleList
from .transformer import CausalLM


def _slice_out(lin, n_out: int):
    """First n_out output features of a (Quant)Linear."""
    if isinstance(lin, QuantLinear):
        return lin.replace(
            qweight_t=lin.qweight_t[:, :n_out],
            scales=lin.scales[:n_out],
            bias=None if lin.bias is None else lin.bias[:n_out],
        )
    if isinstance(lin, Linear):
        return lin.replace(
            weight=lin.weight[:n_out, :],
            bias=None if lin.bias is None else lin.bias[:n_out],
        )
    raise TypeError(
        f"elastic slicing supports Linear/QuantLinear(int8), got {type(lin).__name__}; "
        "load with quant=None or quant='int8'"
    )


def _slice_in(lin, n_in: int):
    """First n_in input features of a (Quant)Linear."""
    if isinstance(lin, QuantLinear):
        return lin.replace(qweight_t=lin.qweight_t[:n_in, :])
    if isinstance(lin, Linear):
        return lin.replace(weight=lin.weight[:, :n_in])
    raise TypeError(
        f"elastic slicing supports Linear/QuantLinear(int8), got {type(lin).__name__}"
    )


def elastic_model(model: CausalLM, attn_ratio: float = 1.0,
                  mlp_ratio: Union[float, Sequence[float]] = 1.0) -> CausalLM:
    """Shrink a CausalLM to the first attn_ratio heads / mlp_ratio FFN neurons.

    attn_ratio applies uniformly (the KV cache layout [L,B,H,S,D] needs one
    head count across layers — the reference demo also uses one ratio);
    mlp_ratio may be a per-layer sequence like the reference's activate_dims.
    Ratio 1.0 returns byte-identical weights (exactness tested).
    """
    cfg = model.cfg
    if getattr(model, "stacked_blocks", None) is not None:
        raise ValueError("call elastic_model before .stack()")
    h, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    gsize = h // hkv
    ahkv = max(1, round(hkv * attn_ratio))
    ah = ahkv * gsize  # preserve the GQA group size
    n_layers = cfg.num_hidden_layers
    if isinstance(mlp_ratio, (int, float)):
        mlp_ratio = [float(mlp_ratio)] * n_layers
    if len(mlp_ratio) != n_layers:
        raise ValueError(f"need {n_layers} mlp ratios, got {len(mlp_ratio)}")

    new_cfg = cfg.replace(num_attention_heads=ah, num_key_value_heads=ahkv,
                          head_dim=hd)
    blocks = []
    for li, blk in enumerate(model.blocks.mods):
        attn = blk.attn
        attn = attn.replace(
            q_proj=_slice_out(attn.q_proj, ah * hd),
            k_proj=_slice_out(attn.k_proj, ahkv * hd),
            v_proj=_slice_out(attn.v_proj, ahkv * hd),
            o_proj=_slice_in(attn.o_proj, ah * hd),
            cfg=new_cfg,
        )
        mlp = blk.mlp
        ai = max(1, round(cfg.intermediate_size * mlp_ratio[li]))
        # round to the int8 lane quantum when quantized (keeps kernels happy)
        if isinstance(mlp.gate_proj, QuantLinear):
            ai = max(128, (ai // 128) * 128)
        mlp = mlp.replace(
            gate_proj=_slice_out(mlp.gate_proj, ai),
            up_proj=None if mlp.up_proj is None else _slice_out(mlp.up_proj, ai),
            down_proj=_slice_in(mlp.down_proj, ai),
        )
        blocks.append(blk.replace(attn=attn, mlp=mlp))
    return model.replace(blocks=ModuleList(blocks), cfg=new_cfg)


def make_predictors(key, model: CausalLM, rank: int = 128):
    """Random low-rank FFN-activation predictors, one per layer.

    Real deployments train these offline (PowerInfer recipe); the reference
    loads them from the model file as `Predictor` weights.  Shapes follow
    PredictorSparseMLP: pred_down [r, d], pred_up [ff, r].
    """
    cfg = model.cfg
    d, ff = cfg.hidden_size, cfg.intermediate_size
    keys = jax.random.split(key, cfg.num_hidden_layers)
    preds = []
    for k in keys:
        k1, k2 = jax.random.split(k)
        preds.append((
            jax.random.normal(k1, (rank, d), jnp.float32) / (d ** 0.5),
            jax.random.normal(k2, (ff, rank), jnp.float32) / (rank ** 0.5),
        ))
    return preds


def sparse_model(model: CausalLM, predictors, threshold: float = 0.0) -> CausalLM:
    """Swap each block's MLP for a predictor-gated sparse MLP.

    predictors: list of (pred_down [r, d], pred_up [ff, r]) per layer — from
    `make_predictors` or loaded from a checkpoint's Predictor weights.
    """
    cfg = model.cfg
    if getattr(model, "stacked_blocks", None) is not None:
        raise ValueError("call sparse_model before .stack()")
    if len(predictors) != cfg.num_hidden_layers:
        raise ValueError(f"need {cfg.num_hidden_layers} predictors, got {len(predictors)}")
    blocks = []
    for blk, (pd, pu) in zip(model.blocks.mods, predictors):
        mlp = blk.mlp
        sparse = PredictorSparseMLP(
            pd, pu, mlp.gate_proj, mlp.up_proj, mlp.down_proj,
            act=mlp.act, threshold=threshold,
        )
        blocks.append(blk.replace(mlp=sparse))
    return model.replace(blocks=ModuleList(blocks))
