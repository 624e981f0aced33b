"""Phi-3-Vision — counterpart of /root/reference/mllm/models/phi3v/
(modeling_phi3v.hpp, processing_phi3v.hpp).

Phi3 LM (fused qkv/gate_up) + CLIP-L/336 vision tower + HD transform:
24x24 patch features are regrouped into 12x12 blocks of 2x2-concatenated
patches (dim 4096), a sub_GN separator column is appended per row, crops are
joined with glb_GN, and a 2-layer projector maps into the LM space.  Image
embeddings substitute at NEGATIVE input ids (phi3v's image-token convention:
-1 marks image positions).

Single-crop (global image) path; structural tests (no transformers oracle —
microsoft/Phi-3-vision requires remote code).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TextConfig, from_hf_config
from ..kv.cache import KVCache
from ..nn.layers import Linear
from ..nn.module import Module
from .llava import PrefixedLoader
from .loading import load_causal_lm
from .transformer import CausalLM
from .vit import VisionConfig, VisionEmbeddings, ViTEncoder


@dataclass(frozen=True)
class Phi3VConfig:
    text: TextConfig = TextConfig()
    vision: VisionConfig = VisionConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, image_size=336, patch_size=14, hidden_act="quick_gelu",
    )
    image_dim_out: int = 1024


class Phi3VImageEmbedding(Module):
    """CLIP tower + HD transform + projector (reference Phi3ImageEmbedding)."""

    def __init__(self, vision: ViTEncoder, glb_gn, sub_gn, proj1, proj2, cfg: Phi3VConfig):
        self.vision = vision
        self.glb_gn = glb_gn  # [1, 1, 4*image_dim_out]
        self.sub_gn = sub_gn  # [1, 1, 1, 4*image_dim_out]
        self.proj1 = proj1
        self.proj2 = proj2
        self.cfg = cfg

    def hd_feature(self, pixel_values):
        """[B, 3, 336, 336] -> [B, 12*13+1, lm_hidden] (single global crop)."""
        x = self.vision.embeddings(pixel_values)
        if self.vision.pre_ln is not None:
            x = self.vision.pre_ln(x)
        for blk in self.vision.blocks[:-1]:  # penultimate layer (CLIP convention)
            x = blk(x)
        feat = x[:, 1:]  # drop CLS -> [B, 576, 1024]
        b = feat.shape[0]
        hw = self.cfg.vision.image_size // self.cfg.vision.patch_size  # 24
        f = feat.reshape(b, hw // 2, 2, hw // 2, 2, self.cfg.image_dim_out)
        f = jnp.transpose(f, (0, 1, 3, 2, 4, 5)).reshape(
            b, hw // 2, hw // 2, 4 * self.cfg.image_dim_out
        )  # [B, 12, 12, 4096]
        sub = jnp.broadcast_to(self.sub_gn, (b, hw // 2, 1, 4 * self.cfg.image_dim_out))
        f = jnp.concatenate([f, sub.astype(f.dtype)], axis=2)  # separator column
        f = f.reshape(b, -1, 4 * self.cfg.image_dim_out)  # [B, 12*13, 4096]
        glb = jnp.broadcast_to(self.glb_gn, (b, 1, 4 * self.cfg.image_dim_out))
        f = jnp.concatenate([f, glb.astype(f.dtype)], axis=1)
        return self.proj2(jax.nn.gelu(self.proj1(f), approximate=False))


class Phi3VForCausalLM(Module):
    def __init__(self, image_embed: Phi3VImageEmbedding, lm: CausalLM, cfg: Phi3VConfig):
        self.image_embed = image_embed
        self.lm = lm
        self.cfg = cfg

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16) -> KVCache:
        return self.lm.init_cache(batch, max_len, dtype)

    def __call__(self, input_ids, cache, pixel_values=None, last_only=True):
        """input_ids: negative ids mark image positions (phi3v convention)."""
        safe_ids = jnp.maximum(input_ids, 0)
        x = self.lm.embed_tokens(safe_ids)
        if pixel_values is not None:
            img = self.image_embed.hd_feature(pixel_values)  # [B, P, D]
            img = img.reshape(-1, img.shape[-1])
            is_img = input_ids < 0
            idx = jnp.clip(jnp.cumsum(is_img.astype(jnp.int32), axis=-1) - 1, 0, img.shape[0] - 1)
            x = jnp.where(is_img[..., None], img[idx].astype(x.dtype), x)
        hidden, cache = self.lm.hidden_states(None, cache, inputs_embeds=x)
        if last_only:
            hidden = hidden[:, -1:, :]
        return self.lm.logits(hidden), cache

    @property
    def num_image_tokens(self) -> int:
        hw = self.cfg.vision.image_size // self.cfg.vision.patch_size
        return (hw // 2) * (hw // 2 + 1) + 1  # 12*13 + glb_GN


def phi3v_config_from_hf(path_or_dict) -> Phi3VConfig:
    import json, os

    c = path_or_dict
    if not isinstance(c, dict):
        p = os.fspath(c)
        if os.path.isdir(p):
            p = os.path.join(p, "config.json")
        with open(p) as f:
            c = json.load(f)
    text = from_hf_config({k: v for k, v in c.items() if k != "embd_layer"},
                          model_type="phi3")
    img = c.get("img_processor", {})
    vis = VisionConfig(
        hidden_size=img.get("hidden_size", 1024),
        intermediate_size=img.get("intermediate_size", 4096),
        num_hidden_layers=img.get("num_hidden_layers", 24),
        num_attention_heads=img.get("num_attention_heads", 16),
        image_size=img.get("image_size", 336),
        patch_size=img.get("patch_size", 14),
        hidden_act="quick_gelu",
    )
    return Phi3VConfig(text=text, vision=vis, image_dim_out=img.get("hidden_size", 1024))


def load_phi3v(loader, cfg: Phi3VConfig, dtype=jnp.bfloat16, quant=None):
    from .clip import _ln, _linear, _tower_blocks

    vc = cfg.vision
    pre = "model.vision_embed_tokens.img_processor.vision_model."
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
        _tower_blocks(loader, pre[:-1], vc.hidden_size, vc.intermediate_size,
                      vc.num_attention_heads, vc.num_hidden_layers, vc.hidden_act,
                      vc.layer_norm_eps, dtype),
        None, vc,
    )
    d4 = 4 * cfg.image_dim_out
    base = "model.vision_embed_tokens."
    image_embed = Phi3VImageEmbedding(
        vision,
        jnp.asarray(loader.load(base + "glb_GN", (1, 1, d4)), dtype),
        jnp.asarray(loader.load(base + "sub_GN", (1, 1, 1, d4)), dtype),
        _linear(loader, base + "img_projection.0", cfg.text.hidden_size, d4, dtype),
        _linear(loader, base + "img_projection.2", cfg.text.hidden_size, cfg.text.hidden_size, dtype),
        cfg,
    )
    lm = load_causal_lm(loader, cfg.text, dtype, quant)
    return Phi3VForCausalLM(image_embed, lm, cfg)
