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
              "phi3", "phonelm", "smollm", "dclm", "tinyllama"):
        return load_causal_lm(loader, cfg, dtype, quant)
    raise NotImplementedError(f"model_type {mt}")


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
    cfg = config or auto_config(path, **overrides)
    loader = open_loader(path)
    model = build_model(cfg, loader, dtype, quant)
    tok = None
    if with_tokenizer and os.path.isdir(path) and os.path.exists(os.path.join(path, "tokenizer.json")):
        from ..tokenizers.hf_json import auto_tokenizer

        tok = auto_tokenizer(path)
    return model, tok, cfg
