"""Model registry + auto loading from a checkpoint directory.

`auto_model(path)` is the one-call surface: reads HF config.json (or uses a
named preset), builds the right architecture, loads weights from safetensors
or a `.mllm` container, and returns (model, tokenizer, config).
Counterpart of the reference's per-demo model construction
(e.g. examples/demo_qwen.cpp:36-54).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp

from ..core.config import TextConfig, from_hf_config
from ..core.param_loader import MultiFileParamLoader, ParamLoader, SafetensorsLoader
from .families import PRESETS
from .loading import NameMap, load_causal_lm
from .transformer import CausalLM


def build_model(cfg: TextConfig, loader, dtype=jnp.bfloat16, quant=None):
    """Dispatch on model_type to the right architecture builder."""
    mt = cfg.model_type
    if mt in ("qwen2", "qwen3", "llama", "mistral", "gemma", "gemma2", "stablelm",
              "phi3", "phonelm", "smollm", "dclm", "tinyllama", "minicpm"):
        # minicpm dense = llama topology + scale_depth/scale_emb/dim_model_base
        # multipliers carried in TextConfig (reference
        # models/minicpm/modeling_minicpm.hpp:62-65,126-128)
        return load_causal_lm(loader, cfg, dtype, quant)
    if mt in ("mixtral", "qwen2_moe", "minicpm_moe", "bailing_moe", "smallthinker"):
        from .moe import load_moe_mlp

        if mt == "mixtral":
            def mlp_builder(ld, prefix, i):
                return load_moe_mlp(
                    ld, prefix + "block_sparse_moe.", cfg, dtype,
                    expert_prefix="experts.{e}.", router_name="gate",
                )
            # mixtral expert proj names are w1/w3/w2 — handled via name shim below
            mlp_builder = _mixtral_mlp_builder(cfg, dtype, quant)
        elif mt in ("qwen2_moe", "bailing_moe", "smallthinker"):
            # bailing/ling and smallthinker follow the qwen2_moe naming
            # convention (reference models/ling, models/smallthinker)
            def mlp_builder(ld, prefix, i):
                return load_moe_mlp(
                    ld, prefix + "mlp.", cfg, dtype,
                    expert_prefix="experts.{e}.", router_name="gate",
                    shared_prefix="shared_expert.", shared_gate_name="shared_expert_gate",
                    quant=quant,
                )
        else:  # minicpm_moe
            def mlp_builder(ld, prefix, i):
                return load_moe_mlp(
                    ld, prefix + "mlp.", cfg, dtype,
                    expert_prefix="experts.{e}.", router_name="gate", quant=quant,
                )
        return load_causal_lm(loader, cfg, dtype, quant, mlp_builder=mlp_builder)
    raise NotImplementedError(f"model_type {mt}")


# model_types that are not bare CausalLMs: auto_model delegates these to
# auto_model_any (vision/encoder configs live next to the checkpoint, so
# dispatch is by path, not by TextConfig)
_ANY_TYPES = ("opt", "bert", "clip", "llava", "vit", "fuyu", "phi3_v",
              "phi3v", "qwen2_vl", "qwen2_5_vl")


def auto_model_any(path: str, dtype=jnp.bfloat16, quant=None):
    """Extended auto-loader covering non-CausalLM architectures too
    (opt/bert/clip/llava/qwen2_vl) — returns (model, kind)."""
    import json

    with open(os.path.join(path, "config.json")) as f:
        mt = json.load(f).get("model_type", "")
    loader = open_loader(path)
    if mt == "opt":
        from .opt import load_opt, opt_config_from_hf

        return load_opt(loader, opt_config_from_hf(path), dtype), "opt"
    if mt == "bert":
        from .bert import bert_config_from_hf, load_bert

        return load_bert(loader, bert_config_from_hf(path), dtype), "bert"
    if mt == "clip":
        from .clip import clip_config_from_hf, load_clip

        return load_clip(loader, clip_config_from_hf(path), dtype), "clip"
    if mt == "llava":
        from .llava import llava_config_from_hf, load_llava

        return load_llava(loader, llava_config_from_hf(path), dtype, quant), "llava"
    if mt == "vit":
        from .vit import load_vit_classifier, vit_config_from_hf

        vcfg, n_labels, id2label = vit_config_from_hf(path)
        return load_vit_classifier(loader, vcfg, n_labels, dtype, id2label), "vit"
    if mt == "fuyu":
        from .fuyu import fuyu_config_from_hf, load_fuyu

        return load_fuyu(loader, fuyu_config_from_hf(path), dtype, quant), "fuyu"
    if mt in ("phi3_v", "phi3v"):
        from .phi3v import load_phi3v, phi3v_config_from_hf

        return load_phi3v(loader, phi3v_config_from_hf(path), dtype, quant), "phi3v"
    if mt == "qwen2_5_vl":
        from .qwen2_5_vl import load_qwen2_5_vl, qwen2_5_vl_configs_from_hf

        base, vcfg = qwen2_5_vl_configs_from_hf(path)
        return load_qwen2_5_vl(loader, base, vcfg, dtype, quant), "qwen2_5_vl"
    if mt == "qwen2_vl":
        from .qwen2_vl import load_qwen2_vl, qwen2_vl_config_from_hf

        return load_qwen2_vl(loader, qwen2_vl_config_from_hf(path), dtype, quant), "qwen2_vl"
    model, _, cfg = auto_model(path, dtype, quant, with_tokenizer=False)
    return model, "causal_lm"


def _mixtral_mlp_builder(cfg, dtype, quant=None):
    import numpy as np
    import jax.numpy as jnp
    from .moe import MoEMLP

    def build(ld, prefix, i):
        d, ff, e = cfg.hidden_size, cfg.intermediate_size, cfg.num_experts
        p = prefix + "block_sparse_moe."
        router = jnp.asarray(ld.load(p + "gate.weight", (e, d)), dtype)
        g, u, dn = [], [], []
        for j in range(e):
            ep = f"{p}experts.{j}."
            g.append(ld.load(ep + "w1.weight", (ff, d)).T)
            u.append(ld.load(ep + "w3.weight", (ff, d)).T)
            dn.append(ld.load(ep + "w2.weight", (d, ff)).T)
        moe = MoEMLP(router, jnp.asarray(np.stack(g), dtype), jnp.asarray(np.stack(u), dtype),
                     jnp.asarray(np.stack(dn), dtype), cfg.num_experts_per_tok,
                     cfg.moe_norm_topk_prob, cfg.hidden_act)
        if quant in ("int8", "int8-a8", "int4", "int4-mixed"):
            from ..ops.quantize_model import quantize_model

            moe = quantize_model(moe, "int4" if quant == "int4-mixed" else quant,
                                 min_size=1, quant_embed_head=False)
        return moe

    return build


def open_loader(path: str):
    """Open any supported checkpoint: .mllm file(s) or safetensors file/dir."""
    if os.path.isdir(path):
        mllms = [f for f in sorted(os.listdir(path)) if f.endswith(".mllm")]
        if mllms and not any(f.endswith(".safetensors") for f in os.listdir(path)):
            return MultiFileParamLoader([os.path.join(path, f) for f in mllms])
        return SafetensorsLoader(path)
    if path.endswith(".mllm"):
        return ParamLoader(path)
    return SafetensorsLoader(path)


def auto_config(path_or_preset: str, **overrides) -> TextConfig:
    if path_or_preset in PRESETS:
        cfg = PRESETS[path_or_preset]
        return cfg.replace(**overrides) if overrides else cfg
    cfg_json = path_or_preset
    if os.path.isdir(path_or_preset):
        cfg_json = os.path.join(path_or_preset, "config.json")
    return from_hf_config(cfg_json, **overrides)


def auto_model(path: str, dtype=jnp.bfloat16, quant=None, config: Optional[TextConfig] = None,
               with_tokenizer: bool = True, **overrides):
    """Load (model, tokenizer, cfg) from a HF-style model directory."""
    if config is None and os.path.isdir(path):
        cfg_json = os.path.join(path, "config.json")
        if os.path.exists(cfg_json):
            with open(cfg_json) as f:
                mt = json.load(f).get("model_type", "")
            if mt in _ANY_TYPES:  # VL / encoder archs: full dispatch
                model, _kind = auto_model_any(path, dtype, quant)
                tok = None
                if with_tokenizer and os.path.exists(os.path.join(path, "tokenizer.json")):
                    from ..tokenizers.hf_json import auto_tokenizer

                    tok = auto_tokenizer(path)
                return model, tok, getattr(model, "cfg", None)
    cfg = config or auto_config(path, **overrides)
    loader = open_loader(path)
    model = build_model(cfg, loader, dtype, quant)
    tok = None
    if with_tokenizer and os.path.isdir(path) and os.path.exists(os.path.join(path, "tokenizer.json")):
        from ..tokenizers.hf_json import auto_tokenizer

        tok = auto_tokenizer(path)
    return model, tok, cfg
