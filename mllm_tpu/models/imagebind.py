"""ImageBind tri-modal encoder — counterpart of
/root/reference/mllm/models/imagebind/modeling_imagebind.hpp (:16-294) and
demo_imagebind: vision / text / audio towers projected into one embedding
space, cross-modal softmax scoring.

Geometry defaults follow the reference configuration_imagebind.hpp ("huge"):
vision ViT-H 1280x32, text 1024x24 (CLIP-style, EOT pooling), audio 768x12
over 128x204 fbank patches (16px kernel, stride 10).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import LayerNorm, Linear
from ..nn.module import Module, ModuleList
from .vit import VisionAttention, VisionBlock, VisionMLP


@dataclass(frozen=True)
class ImageBindConfig:
    vision_hidden: int = 1280
    vision_heads: int = 16
    vision_ffn: int = 5120
    patch: int = 14
    patch_time: int = 2
    img_hw: int = 224
    time_frames: int = 2
    vision_blocks: int = 32

    text_hidden: int = 1024
    text_heads: int = 16
    text_ffn: int = 4096
    vocab_size: int = 49408
    max_positions: int = 77
    text_blocks: int = 24

    audio_hidden: int = 768
    audio_heads: int = 12
    audio_ffn: int = 3072
    audio_kernel: int = 16
    audio_stride: int = 10
    audio_h: int = 128
    audio_w: int = 204
    audio_blocks: int = 12
    audio_clips: int = 3
    audio_scale: float = 20.0

    head_dim: int = 1024  # shared embedding dim

    @property
    def vision_seq(self) -> int:
        hw = self.img_hw // self.patch
        return hw * hw * (self.time_frames // self.patch_time) + 1

    @property
    def audio_seq(self) -> int:
        nh = (self.audio_h - self.audio_kernel) // self.audio_stride + 1
        nw = (self.audio_w - self.audio_kernel) // self.audio_stride + 1
        return nh * nw + 1


def _blocks(key, dim, heads, ffn, n, dtype, act="gelu"):
    out = []
    for i in range(n):
        ks = jax.random.split(jax.random.fold_in(key, i), 6)
        mk = lambda kk, o, ii: Linear.init(kk, ii, o, True, dtype)
        attn = VisionAttention(mk(ks[0], dim, dim), mk(ks[1], dim, dim),
                               mk(ks[2], dim, dim), mk(ks[3], dim, dim), heads)
        mlp = VisionMLP(mk(ks[4], ffn, dim), mk(ks[5], dim, ffn), act)
        out.append(VisionBlock(LayerNorm.init(dim, 1e-6), attn, LayerNorm.init(dim, 1e-6), mlp))
    return ModuleList(out)


class ImageBindVisionTower(Module):
    """3D patch embed + CLS + learned positions + ViT blocks -> head."""

    def __init__(self, patch_weight, cls_token, pos_embed, pre_ln, blocks, norm, head, cfg):
        self.patch_weight = patch_weight  # [D, C*pt*p*p]
        self.cls_token = cls_token  # [D]
        self.pos_embed = pos_embed  # [S, D]
        self.pre_ln = pre_ln
        self.blocks = blocks
        self.norm = norm
        self.head = head
        self.cfg = cfg

    @staticmethod
    def init(key, cfg: ImageBindConfig, dtype=jnp.float32):
        ks = jax.random.split(key, 4)
        pin = 3 * cfg.patch_time * cfg.patch * cfg.patch
        return ImageBindVisionTower(
            jax.random.normal(ks[0], (cfg.vision_hidden, pin), dtype) * 0.02,
            jnp.zeros((cfg.vision_hidden,), dtype),
            jax.random.normal(ks[1], (cfg.vision_seq, cfg.vision_hidden), dtype) * 0.02,
            LayerNorm.init(cfg.vision_hidden, 1e-6),
            _blocks(ks[2], cfg.vision_hidden, cfg.vision_heads, cfg.vision_ffn,
                    cfg.vision_blocks, dtype),
            LayerNorm.init(cfg.vision_hidden, 1e-6),
            Linear.init(ks[3], cfg.vision_hidden, cfg.head_dim, False, dtype),
            cfg,
        )

    def __call__(self, patches):
        """patches: [B, S-1, C*pt*p*p] pre-patchified video/image frames."""
        b = patches.shape[0]
        x = jax.lax.dot_general(patches, self.patch_weight, (((2,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(patches.dtype)
        cls = jnp.broadcast_to(self.cls_token[None, None], (b, 1, x.shape[-1])).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1) + self.pos_embed[None]
        x = self.pre_ln(x)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x[:, 0])
        e = self.head(x)
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True)


class ImageBindTextTower(Module):
    """CLIP-style causal text encoder with EOT pooling."""

    def __init__(self, token_embedding, pos_embed, blocks, norm, head, cfg):
        self.token_embedding = token_embedding  # [V, D]
        self.pos_embed = pos_embed  # [P, D]
        self.blocks = blocks
        self.norm = norm
        self.head = head
        self.cfg = cfg

    @staticmethod
    def init(key, cfg: ImageBindConfig, dtype=jnp.float32):
        ks = jax.random.split(key, 4)
        return ImageBindTextTower(
            jax.random.normal(ks[0], (cfg.vocab_size, cfg.text_hidden), dtype) * 0.02,
            jax.random.normal(ks[1], (cfg.max_positions, cfg.text_hidden), dtype) * 0.01,
            _blocks(ks[2], cfg.text_hidden, cfg.text_heads, cfg.text_ffn, cfg.text_blocks, dtype),
            LayerNorm.init(cfg.text_hidden, 1e-6),
            Linear.init(ks[3], cfg.text_hidden, cfg.head_dim, False, dtype),
            cfg,
        )

    def __call__(self, input_ids, eot_positions):
        b, s = input_ids.shape
        x = jnp.take(self.token_embedding, input_ids, axis=0) + self.pos_embed[None, :s]
        mask = jnp.where(jnp.arange(s)[None, :] <= jnp.arange(s)[:, None], 0.0, -1e30)
        for blk in self.blocks:
            x = blk(x, bias=mask.astype(jnp.float32))
        x = self.norm(x)
        pooled = x[jnp.arange(b), eot_positions]
        e = self.head(pooled)
        return e / jnp.linalg.norm(e, axis=-1, keepdims=True)


class ImageBindAudioTower(Module):
    """Conv2D fbank patch embed + CLS + positions + blocks; mean over clips,
    scaled by audio_scale (reference modeling_imagebind.hpp:222-235)."""

    def __init__(self, patch_weight, embed_norm, cls_token, pos_embed, blocks, norm, head, cfg):
        self.patch_weight = patch_weight  # [D, 1, k, k]
        self.embed_norm = embed_norm
        self.cls_token = cls_token
        self.pos_embed = pos_embed
        self.blocks = blocks
        self.norm = norm
        self.head = head
        self.cfg = cfg

    @staticmethod
    def init(key, cfg: ImageBindConfig, dtype=jnp.float32):
        ks = jax.random.split(key, 4)
        return ImageBindAudioTower(
            jax.random.normal(ks[0], (cfg.audio_hidden, 1, cfg.audio_kernel, cfg.audio_kernel), dtype) * 0.02,
            LayerNorm.init(cfg.audio_hidden, 1e-6),
            jnp.zeros((cfg.audio_hidden,), dtype),
            jax.random.normal(ks[1], (cfg.audio_seq, cfg.audio_hidden), dtype) * 0.02,
            _blocks(ks[2], cfg.audio_hidden, cfg.audio_heads, cfg.audio_ffn, cfg.audio_blocks, dtype),
            LayerNorm.init(cfg.audio_hidden, 1e-6),
            Linear.init(ks[3], cfg.audio_hidden, cfg.head_dim, False, dtype),
            cfg,
        )

    def __call__(self, fbanks):
        """fbanks: [B*clips, 1, H, W] -> embeddings [B, head_dim]."""
        cfg = self.cfg
        x = jnp.transpose(fbanks, (0, 2, 3, 1))  # NHWC
        w = jnp.transpose(self.patch_weight, (2, 3, 1, 0))
        x = jax.lax.conv_general_dilated(
            x, w, (cfg.audio_stride, cfg.audio_stride), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(fbanks.dtype)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.audio_hidden)
        x = self.embed_norm(x)
        cls = jnp.broadcast_to(self.cls_token[None, None], (b, 1, cfg.audio_hidden)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1) + self.pos_embed[None]
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x[:, 0])
        e = self.head(x)
        e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
        e = e * cfg.audio_scale
        e = e.reshape(-1, cfg.audio_clips, cfg.head_dim).mean(axis=1)
        return e


class ImageBindModel(Module):
    """Cross-modal scoring (reference ImagebindModel::Forward :272-290)."""

    def __init__(self, vision, text, audio, cfg: ImageBindConfig):
        self.vision_model = vision
        self.text_model = text
        self.audio_model = audio
        self.cfg = cfg

    @staticmethod
    def init(key, cfg: ImageBindConfig = ImageBindConfig(), dtype=jnp.float32):
        k1, k2, k3 = jax.random.split(key, 3)
        return ImageBindModel(
            ImageBindVisionTower.init(k1, cfg, dtype),
            ImageBindTextTower.init(k2, cfg, dtype),
            ImageBindAudioTower.init(k3, cfg, dtype),
            cfg,
        )

    def __call__(self, input_ids, eot_positions, vision_patches, audio_fbanks):
        t = self.text_model(input_ids, eot_positions)
        v = self.vision_model(vision_patches)
        a = self.audio_model(audio_fbanks)
        vision_x_text = jax.nn.softmax(v @ t.T, axis=-1)
        vision_x_audio = jax.nn.softmax(v @ a.T, axis=-1)
        return vision_x_text, vision_x_audio


def patchify_video(frames: np.ndarray, patch: int = 14, patch_time: int = 2) -> np.ndarray:
    """[B, C, T, H, W] -> [B, (T/pt)*(H/p)*(W/p), C*pt*p*p] (vision tower input)."""
    b, c, t, h, w = frames.shape
    x = frames.reshape(b, c, t // patch_time, patch_time, h // patch, patch, w // patch, patch)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(b, (t // patch_time) * (h // patch) * (w // patch), c * patch_time * patch * patch)
