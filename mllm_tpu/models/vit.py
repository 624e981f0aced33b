"""ViT encoder blocks — counterpart of /root/reference/mllm/models/vit/
(modeling_vit.hpp) and the shared vision blocks used by CLIP/LLaVA/ImageBind.

Bidirectional attention, pre-LN, learned position embeddings, optional CLS
token.  All shapes static: one (image_size, patch_size) pair per compiled
encoder.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.attention import sdpa
from ..nn.layers import ACT_FN, LayerNorm, Linear
from ..nn.module import Module, ModuleList


@dataclass(frozen=True)
class VisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 224
    patch_size: int = 32
    num_channels: int = 3
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    use_cls_token: bool = True

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_positions(self) -> int:
        return self.num_patches + (1 if self.use_cls_token else 0)


class VisionAttention(Module):
    """Bidirectional MHA over patch tokens."""

    def __init__(self, q_proj, k_proj, v_proj, out_proj, n_heads: int):
        self.q_proj = q_proj
        self.k_proj = k_proj
        self.v_proj = v_proj
        self.out_proj = out_proj
        self.n_heads = n_heads

    def __call__(self, x, bias=None):
        b, s, d = x.shape
        hd = d // self.n_heads
        q = self.q_proj(x).reshape(b, s, self.n_heads, hd)
        k = self.k_proj(x).reshape(b, s, self.n_heads, hd)
        v = self.v_proj(x).reshape(b, s, self.n_heads, hd)
        out = sdpa(
            q, jnp.transpose(k, (0, 2, 1, 3)), jnp.transpose(v, (0, 2, 1, 3)),
            causal=False, bias=bias,
        )
        return self.out_proj(out.reshape(b, s, d))


class VisionMLP(Module):
    def __init__(self, fc1, fc2, act: str):
        self.fc1 = fc1
        self.fc2 = fc2
        self.act = act

    def __call__(self, x):
        return self.fc2(ACT_FN[self.act](self.fc1(x)))


class VisionBlock(Module):
    def __init__(self, ln1, attn, ln2, mlp):
        self.ln1 = ln1
        self.attn = attn
        self.ln2 = ln2
        self.mlp = mlp

    def __call__(self, x, bias=None):
        x = x + self.attn(self.ln1(x), bias=bias)
        x = x + self.mlp(self.ln2(x))
        return x


class VisionEmbeddings(Module):
    """Conv patch embed + optional CLS + learned positions."""

    def __init__(self, patch_weight, class_embedding, position_embedding, cfg: VisionConfig):
        self.patch_weight = patch_weight  # [D, C, ps, ps] (torch layout)
        self.class_embedding = class_embedding  # [D] or None
        self.position_embedding = position_embedding  # [num_positions, D]
        self.cfg = cfg

    def __call__(self, pixel_values):
        """pixel_values: [B, C, H, W] -> [B, S, D]."""
        cfg = self.cfg
        b = pixel_values.shape[0]
        # conv as unfold+matmul (stride == kernel): MXU-native
        ps = cfg.patch_size
        x = pixel_values.reshape(b, cfg.num_channels, cfg.image_size // ps, ps,
                                 cfg.image_size // ps, ps)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, cfg.num_patches, cfg.num_channels * ps * ps)
        w = self.patch_weight.reshape(cfg.hidden_size, -1)  # [D, C*ps*ps]
        emb = jax.lax.dot_general(x, w, (((2,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32).astype(x.dtype)
        if self.class_embedding is not None:
            cls = jnp.broadcast_to(self.class_embedding[None, None, :], (b, 1, cfg.hidden_size))
            emb = jnp.concatenate([cls.astype(emb.dtype), emb], axis=1)
        return emb + self.position_embedding[None]


class ViTEncoder(Module):
    def __init__(self, embeddings, pre_ln, blocks: ModuleList, post_ln, cfg: VisionConfig):
        self.embeddings = embeddings
        self.pre_ln = pre_ln  # CLIP's pre_layrnorm; None for plain ViT
        self.blocks = blocks
        self.post_ln = post_ln
        self.cfg = cfg

    def __call__(self, pixel_values, bias=None):
        x = self.embeddings(pixel_values)
        if self.pre_ln is not None:
            x = self.pre_ln(x)
        for blk in self.blocks:
            x = blk(x, bias=bias)
        return x  # [B, S, D] pre-post_ln (pooling differs per consumer)

    def pooled(self, pixel_values):
        x = self(pixel_values)
        cls = x[:, 0]
        return self.post_ln(cls) if self.post_ln is not None else cls


class ViTForImageClassification(Module):
    """CLS-token classifier head on the encoder — counterpart of the
    reference's ViTModel (models/vit/modeling_vit.hpp: transformer trunk +
    classifier Linear over the CLS state, demo_vit.cpp postProcess argmax)."""

    def __init__(self, encoder: ViTEncoder, classifier: Linear, id2label=None):
        self.encoder = encoder
        self.classifier = classifier
        self.id2label = id2label or {}

    def __call__(self, pixel_values):
        """[B, C, H, W] -> logits [B, num_labels]."""
        return self.classifier(self.encoder.pooled(pixel_values))

    def classify(self, pixel_values, top_k: int = 1):
        """Host-side helper: [(label, prob)] per image."""
        logits = self(pixel_values)
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))
        out = []
        for row in probs:
            idx = np.argsort(row)[::-1][:top_k]
            out.append([(self.id2label.get(int(i), str(int(i))), float(row[i]))
                        for i in idx])
        return out


def vit_config_from_hf(path_or_dict) -> "tuple[VisionConfig, int, dict]":
    """HF ViT config.json -> (VisionConfig, num_labels, id2label)."""
    import json, os

    c = path_or_dict
    if not isinstance(c, dict):
        p = os.fspath(c)
        if os.path.isdir(p):
            p = os.path.join(p, "config.json")
        with open(p) as f:
            c = json.load(f)
    cfg = VisionConfig(
        hidden_size=c.get("hidden_size", 768),
        intermediate_size=c.get("intermediate_size", 3072),
        num_hidden_layers=c.get("num_hidden_layers", 12),
        num_attention_heads=c.get("num_attention_heads", 12),
        image_size=c.get("image_size", 224),
        patch_size=c.get("patch_size", 16),
        num_channels=c.get("num_channels", 3),
        hidden_act=c.get("hidden_act", "gelu"),
        layer_norm_eps=float(c.get("layer_norm_eps", 1e-12)),
    )
    id2label = {int(k): v for k, v in c.get("id2label", {}).items()}
    return cfg, len(id2label) or 1000, id2label


def load_vit_classifier(loader, cfg: VisionConfig, num_labels: int,
                        dtype=jnp.float32, id2label=None) -> ViTForImageClassification:
    """Load HF `ViTForImageClassification` weights (google/vit-* naming:
    vit.encoder.layer.{i}.attention.attention.query/..., layernorm_before/
    after, intermediate/output.dense, classifier)."""

    def lin(prefix, o, i):
        w = jnp.asarray(loader.load(prefix + ".weight", (o, i)), dtype)
        b = None
        if prefix + ".bias" in loader:
            b = jnp.asarray(loader.load(prefix + ".bias", (o,)), dtype)
        return Linear(w, b)

    def ln(prefix, d):
        return LayerNorm(jnp.asarray(loader.load(prefix + ".weight", (d,)), dtype),
                         jnp.asarray(loader.load(prefix + ".bias", (d,)), dtype),
                         cfg.layer_norm_eps)

    d, inter = cfg.hidden_size, cfg.intermediate_size
    emb = VisionEmbeddings(
        jnp.asarray(loader.load("vit.embeddings.patch_embeddings.projection.weight",
                                (d, cfg.num_channels, cfg.patch_size, cfg.patch_size)), dtype),
        jnp.asarray(loader.load("vit.embeddings.cls_token", (1, 1, d)), dtype).reshape(d),
        jnp.asarray(loader.load("vit.embeddings.position_embeddings",
                                (1, cfg.num_positions, d)), dtype).reshape(cfg.num_positions, d),
        cfg,
    )
    # patch conv has a bias in HF ViT; fold it into the position embedding of
    # the patch tokens (stride==kernel conv bias is a constant per channel)
    if "vit.embeddings.patch_embeddings.projection.bias" in loader:
        pb = jnp.asarray(loader.load("vit.embeddings.patch_embeddings.projection.bias",
                                     (d,)), dtype)
        pos = emb.position_embedding
        pos = pos.at[1:].add(pb[None, :])
        emb = emb.replace(position_embedding=pos)
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"vit.encoder.layer.{i}."
        attn = VisionAttention(
            lin(p + "attention.attention.query", d, d),
            lin(p + "attention.attention.key", d, d),
            lin(p + "attention.attention.value", d, d),
            lin(p + "attention.output.dense", d, d),
            cfg.num_attention_heads,
        )
        mlp = VisionMLP(lin(p + "intermediate.dense", inter, d),
                        lin(p + "output.dense", d, inter), cfg.hidden_act)
        blocks.append(VisionBlock(ln(p + "layernorm_before", d), attn,
                                  ln(p + "layernorm_after", d), mlp))
    enc = ViTEncoder(emb, None, ModuleList(blocks), ln("vit.layernorm", d), cfg)
    head = lin("classifier", num_labels, d)
    return ViTForImageClassification(enc, head, id2label)
