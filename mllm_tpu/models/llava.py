"""LLaVA — CLIP vision tower + MLP projector + LLaMA-class LM.

Counterpart of /root/reference/mllm/models/llava/ (modeling_llava.hpp):
vision features from the CLIP penultimate layer (CLS dropped), 2-layer GELU
projector, image embeds spliced at <image> token positions.

Loads HF llava-1.5 checkpoints (vision_tower.* / multi_modal_projector.* /
language_model.*).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TextConfig, from_hf_config
from ..kv.cache import KVCache
from ..nn.layers import Linear
from ..nn.module import Module
from .clip import _ln, _linear, _tower_blocks
from .loading import NameMap, load_causal_lm
from .transformer import CausalLM
from .vit import VisionConfig, VisionEmbeddings, ViTEncoder


@dataclass(frozen=True)
class LlavaConfig:
    text: TextConfig = TextConfig()
    vision: VisionConfig = VisionConfig()
    image_token_id: int = 32000
    vision_feature_layer: int = -2  # penultimate block
    projector_act: str = "gelu"


class LlavaProjector(Module):
    def __init__(self, fc1, fc2):
        self.fc1 = fc1
        self.fc2 = fc2

    def __call__(self, x):
        return self.fc2(jax.nn.gelu(self.fc1(x), approximate=False))


class LlavaForConditionalGeneration(Module):
    def __init__(self, vision_tower: ViTEncoder, projector: LlavaProjector, lm: CausalLM,
                 cfg: LlavaConfig):
        self.vision_tower = vision_tower
        self.projector = projector
        self.lm = lm
        self.cfg = cfg

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16) -> KVCache:
        return self.lm.init_cache(batch, max_len, dtype)

    def encode_image(self, pixel_values):
        """pixel [B, 3, H, W] -> projected patch embeds [B, P, lm_hidden]
        (feature layer = penultimate, CLS dropped — HF default 'default')."""
        x = self.vision_tower.embeddings(pixel_values)
        if self.vision_tower.pre_ln is not None:
            x = self.vision_tower.pre_ln(x)
        n = len(self.vision_tower.blocks)
        upto = n + self.cfg.vision_feature_layer + 1  # -2 -> skip last block
        for blk in self.vision_tower.blocks[:upto]:
            x = blk(x)
        x = x[:, 1:]  # drop CLS
        return self.projector(x)

    def __call__(self, input_ids, cache, pixel_values=None, last_only=True):
        x = self.lm.embed_tokens(input_ids)
        if pixel_values is not None:
            img = self.encode_image(pixel_values)  # [B, P, D]
            img = img.reshape(-1, img.shape[-1])
            is_img = input_ids == self.cfg.image_token_id
            idx = jnp.clip(jnp.cumsum(is_img.astype(jnp.int32), axis=-1) - 1, 0, img.shape[0] - 1)
            x = jnp.where(is_img[..., None], img[idx].astype(x.dtype), x)
        hidden, cache = self.lm.hidden_states(None, cache, inputs_embeds=x)
        if last_only:
            hidden = hidden[:, -1:, :]
        return self.lm.logits(hidden), cache


def llava_config_from_hf(path_or_dict) -> LlavaConfig:
    import json, os

    if not isinstance(path_or_dict, dict):
        p = os.fspath(path_or_dict)
        if os.path.isdir(p):
            p = os.path.join(p, "config.json")
        with open(p) as f:
            c = json.load(f)
    else:
        c = dict(path_or_dict)
    text = from_hf_config(c.get("text_config", {}))
    v = c.get("vision_config", {})
    vis = VisionConfig(
        hidden_size=v.get("hidden_size", 1024),
        intermediate_size=v.get("intermediate_size", 4096),
        num_hidden_layers=v.get("num_hidden_layers", 24),
        num_attention_heads=v.get("num_attention_heads", 16),
        image_size=v.get("image_size", 336),
        patch_size=v.get("patch_size", 14),
        hidden_act=v.get("hidden_act", "quick_gelu"),
    )
    return LlavaConfig(
        text=text, vision=vis,
        image_token_id=c.get("image_token_index", 32000),
        vision_feature_layer=c.get("vision_feature_layer", -2),
    )


def load_llava(loader, cfg: LlavaConfig, dtype=jnp.bfloat16, quant=None):
    vc = cfg.vision
    pre = "vision_tower.vision_model."
    emb = VisionEmbeddings(
        jnp.asarray(loader.load(pre + "embeddings.patch_embedding.weight",
                                (vc.hidden_size, vc.num_channels, vc.patch_size, vc.patch_size)), dtype),
        jnp.asarray(loader.load(pre + "embeddings.class_embedding", (vc.hidden_size,)), dtype),
        jnp.asarray(loader.load(pre + "embeddings.position_embedding.weight",
                                (vc.num_positions, vc.hidden_size)), dtype),
        vc,
    )
    vision = ViTEncoder(
        emb,
        _ln(loader, pre + "pre_layrnorm", vc.hidden_size, dtype, vc.layer_norm_eps),
        _tower_blocks(loader, "vision_tower.vision_model", vc.hidden_size, vc.intermediate_size,
                      vc.num_attention_heads, vc.num_hidden_layers, vc.hidden_act,
                      vc.layer_norm_eps, dtype),
        None, vc,
    )
    proj = LlavaProjector(
        _linear(loader, "multi_modal_projector.linear_1", cfg.text.hidden_size, vc.hidden_size, dtype),
        _linear(loader, "multi_modal_projector.linear_2", cfg.text.hidden_size, cfg.text.hidden_size, dtype),
    )

    lm_loader = (
        PrefixedLoader(loader, "language_model.")
        if "language_model.model.embed_tokens.weight" in loader
        else loader
    )
    lm = load_causal_lm(lm_loader, cfg.text, dtype, quant)
    return LlavaForConditionalGeneration(vision, proj, lm, cfg)


class PrefixedLoader:
    """View of a loader with a name prefix applied (llava's language_model.*)."""

    def __init__(self, base, prefix: str):
        self.base = base
        self.prefix = prefix
        if hasattr(base, "raw"):
            self.raw = lambda name: base.raw(self.prefix + name)
            self.dtype = lambda name: base.dtype(self.prefix + name)

    def __contains__(self, name):
        return (self.prefix + name) in self.base

    def load(self, name, shape, dtype_=np.float32):
        return self.base.load(self.prefix + name, shape, dtype_)
