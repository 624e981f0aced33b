"""CLIP image-text scoring — counterpart of
/root/reference/mllm/models/clip/modeling_clip.hpp (:12-207) and demo_clip.

Text tower: causal transformer with learned positions, EOT pooling.
Vision tower: ViTEncoder (vit.py) with CLS pooling.
Loads HF CLIP checkpoints (openai/clip-vit-base-*) via safetensors.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.attention import sdpa
from ..nn.layers import LayerNorm, Linear
from ..nn.module import Module, ModuleList
from .vit import (
    VisionAttention,
    VisionBlock,
    VisionConfig,
    VisionEmbeddings,
    VisionMLP,
    ViTEncoder,
)


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    intermediate_size: int = 2048
    num_hidden_layers: int = 12
    num_attention_heads: int = 8
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407


@dataclass(frozen=True)
class CLIPConfig:
    text: CLIPTextConfig = CLIPTextConfig()
    vision: VisionConfig = VisionConfig()
    projection_dim: int = 512


class CLIPTextEncoder(Module):
    def __init__(self, token_embedding, position_embedding, blocks, final_ln, cfg: CLIPTextConfig):
        self.token_embedding = token_embedding  # [V, D]
        self.position_embedding = position_embedding  # [P, D]
        self.blocks = blocks
        self.final_ln = final_ln
        self.cfg = cfg

    def __call__(self, input_ids):
        b, s = input_ids.shape
        x = jnp.take(self.token_embedding, input_ids, axis=0) + self.position_embedding[None, :s]
        # causal bias for the bidirectional-block attention
        mask = jnp.where(
            jnp.arange(s)[None, :] <= jnp.arange(s)[:, None], 0.0, -1e30
        ).astype(jnp.float32)
        for blk in self.blocks:
            x = blk(x, bias=mask)
        x = self.final_ln(x)
        # EOT pooling: feature at the eos token position (HF: argmax(ids==eos))
        eot = jnp.argmax((input_ids == self.cfg.eos_token_id).astype(jnp.int32), axis=1)
        return x[jnp.arange(b), eot]


class CLIPModel(Module):
    """Full CLIP: encode_text / encode_image / similarity logits."""

    def __init__(self, text_model: CLIPTextEncoder, vision_model: ViTEncoder,
                 text_projection, visual_projection, logit_scale, cfg: CLIPConfig):
        self.text_model = text_model
        self.vision_model = vision_model
        self.text_projection = text_projection
        self.visual_projection = visual_projection
        self.logit_scale = logit_scale
        self.cfg = cfg

    def encode_text(self, input_ids):
        return self.text_projection(self.text_model(input_ids))

    def encode_image(self, pixel_values):
        return self.visual_projection(self.vision_model.pooled(pixel_values))

    def __call__(self, input_ids, pixel_values):
        """Returns logits_per_image [B_img, B_txt] (reference demo_clip scoring)."""
        t = self.encode_text(input_ids)
        v = self.encode_image(pixel_values)
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * v @ t.T

    @staticmethod
    def init(key, cfg: CLIPConfig = CLIPConfig(), dtype=jnp.float32) -> "CLIPModel":
        """Random-weight CLIP (synthetic bench/test builds; traceable under jit)."""
        tc, vc = cfg.text, cfg.vision
        ks = jax.random.split(key, 8)

        def blocks(key, d, inter, heads, n, act, eps):
            out = []
            for i in range(n):
                kk = jax.random.split(jax.random.fold_in(key, i), 6)
                mk = lambda k2, o, ii: Linear.init(k2, ii, o, True, dtype)
                attn = VisionAttention(mk(kk[0], d, d), mk(kk[1], d, d),
                                       mk(kk[2], d, d), mk(kk[3], d, d), heads)
                mlp = VisionMLP(mk(kk[4], inter, d), mk(kk[5], d, inter), act)
                out.append(VisionBlock(LayerNorm.init(d, eps), attn,
                                       LayerNorm.init(d, eps), mlp))
            return ModuleList(out)

        text = CLIPTextEncoder(
            jax.random.normal(ks[0], (tc.vocab_size, tc.hidden_size), dtype) * 0.02,
            jax.random.normal(ks[1], (tc.max_position_embeddings, tc.hidden_size), dtype) * 0.02,
            blocks(ks[2], tc.hidden_size, tc.intermediate_size, tc.num_attention_heads,
                   tc.num_hidden_layers, tc.hidden_act, tc.layer_norm_eps),
            LayerNorm.init(tc.hidden_size, tc.layer_norm_eps), tc,
        )
        emb = VisionEmbeddings(
            jax.random.normal(ks[3], (vc.hidden_size, vc.num_channels,
                                      vc.patch_size, vc.patch_size), dtype) * 0.02,
            jnp.zeros((vc.hidden_size,), dtype),
            jax.random.normal(ks[4], (vc.num_positions, vc.hidden_size), dtype) * 0.02,
            vc,
        )
        vision = ViTEncoder(
            emb, LayerNorm.init(vc.hidden_size, vc.layer_norm_eps),
            blocks(ks[5], vc.hidden_size, vc.intermediate_size, vc.num_attention_heads,
                   vc.num_hidden_layers, vc.hidden_act, vc.layer_norm_eps),
            LayerNorm.init(vc.hidden_size, vc.layer_norm_eps), vc,
        )
        return CLIPModel(
            text, vision,
            Linear.init(ks[6], tc.hidden_size, cfg.projection_dim, False, dtype),
            Linear.init(ks[7], vc.hidden_size, cfg.projection_dim, False, dtype),
            jnp.asarray(2.6592, dtype), cfg,
        )


# ---------------------------------------------------------------------------
# HF checkpoint loading
# ---------------------------------------------------------------------------


def _linear(loader, prefix, out_f, in_f, dtype):
    w = jnp.asarray(loader.load(prefix + ".weight", (out_f, in_f)), dtype)
    b = None
    if prefix + ".bias" in loader:
        b = jnp.asarray(loader.load(prefix + ".bias", (out_f,)), dtype)
    return Linear(w, b)


def _ln(loader, prefix, dim, dtype, eps):
    return LayerNorm(
        jnp.asarray(loader.load(prefix + ".weight", (dim,)), dtype),
        jnp.asarray(loader.load(prefix + ".bias", (dim,)), dtype),
        eps,
    )


def _tower_blocks(loader, prefix, d, inter, n_heads, n_layers, act, eps, dtype):
    blocks = []
    for i in range(n_layers):
        p = f"{prefix}.encoder.layers.{i}."
        attn = VisionAttention(
            _linear(loader, p + "self_attn.q_proj", d, d, dtype),
            _linear(loader, p + "self_attn.k_proj", d, d, dtype),
            _linear(loader, p + "self_attn.v_proj", d, d, dtype),
            _linear(loader, p + "self_attn.out_proj", d, d, dtype),
            n_heads,
        )
        mlp = VisionMLP(
            _linear(loader, p + "mlp.fc1", inter, d, dtype),
            _linear(loader, p + "mlp.fc2", d, inter, dtype),
            act,
        )
        blocks.append(VisionBlock(
            _ln(loader, p + "layer_norm1", d, dtype, eps), attn,
            _ln(loader, p + "layer_norm2", d, dtype, eps), mlp,
        ))
    return ModuleList(blocks)


def load_clip(loader, cfg: CLIPConfig, dtype=jnp.float32) -> CLIPModel:
    tc, vc = cfg.text, cfg.vision
    text = CLIPTextEncoder(
        jnp.asarray(loader.load("text_model.embeddings.token_embedding.weight",
                                (tc.vocab_size, tc.hidden_size)), dtype),
        jnp.asarray(loader.load("text_model.embeddings.position_embedding.weight",
                                (tc.max_position_embeddings, tc.hidden_size)), dtype),
        _tower_blocks(loader, "text_model", tc.hidden_size, tc.intermediate_size,
                      tc.num_attention_heads, tc.num_hidden_layers, tc.hidden_act,
                      tc.layer_norm_eps, dtype),
        _ln(loader, "text_model.final_layer_norm", tc.hidden_size, dtype, tc.layer_norm_eps),
        tc,
    )
    emb = VisionEmbeddings(
        jnp.asarray(loader.load("vision_model.embeddings.patch_embedding.weight",
                                (vc.hidden_size, vc.num_channels, vc.patch_size, vc.patch_size)), dtype),
        jnp.asarray(loader.load("vision_model.embeddings.class_embedding", (vc.hidden_size,)), dtype),
        jnp.asarray(loader.load("vision_model.embeddings.position_embedding.weight",
                                (vc.num_positions, vc.hidden_size)), dtype),
        vc,
    )
    vision = ViTEncoder(
        emb,
        _ln(loader, "vision_model.pre_layrnorm", vc.hidden_size, dtype, vc.layer_norm_eps),
        _tower_blocks(loader, "vision_model", vc.hidden_size, vc.intermediate_size,
                      vc.num_attention_heads, vc.num_hidden_layers, vc.hidden_act,
                      vc.layer_norm_eps, dtype),
        _ln(loader, "vision_model.post_layernorm", vc.hidden_size, dtype, vc.layer_norm_eps),
        vc,
    )
    text_proj = Linear(jnp.asarray(loader.load("text_projection.weight",
                                               (cfg.projection_dim, tc.hidden_size)), dtype), None)
    vis_proj = Linear(jnp.asarray(loader.load("visual_projection.weight",
                                              (cfg.projection_dim, vc.hidden_size)), dtype), None)
    logit_scale = jnp.asarray(loader.load("logit_scale", ()), jnp.float32)
    return CLIPModel(text, vision, text_proj, vis_proj, logit_scale, cfg)


def clip_config_from_hf(path_or_dict) -> CLIPConfig:
    import json, os

    if isinstance(path_or_dict, (str, bytes)) or hasattr(path_or_dict, "__fspath__"):
        p = path_or_dict
        if os.path.isdir(p):
            p = os.path.join(p, "config.json")
        with open(p) as f:
            c = json.load(f)
    else:
        c = path_or_dict
    t, v = c.get("text_config", {}), c.get("vision_config", {})

    def mk(cls, d, allowed):
        return cls(**{k: d[k] for k in allowed if k in d})

    tc = mk(CLIPTextConfig, t, ["vocab_size", "hidden_size", "intermediate_size",
                                "num_hidden_layers", "num_attention_heads",
                                "max_position_embeddings", "hidden_act", "layer_norm_eps",
                                "eos_token_id"])
    vcfg = mk(VisionConfig, v, ["hidden_size", "intermediate_size", "num_hidden_layers",
                                "num_attention_heads", "image_size", "patch_size",
                                "num_channels", "hidden_act", "layer_norm_eps"])
    return CLIPConfig(tc, vcfg, c.get("projection_dim", 512))
