"""BERT encoder — counterpart of /root/reference/mllm/models/bert/
(modeling_bert.hpp): token+position+type embeddings, post-LN encoder blocks,
mean/CLS pooling for sentence embeddings (the reference demo_bert use case)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.attention import sdpa
from ..nn.layers import LayerNorm, Linear
from ..nn.module import Module, ModuleList


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"


class BertSelfAttention(Module):
    def __init__(self, q, k, v, out, out_ln, n_heads):
        self.q = q
        self.k = k
        self.v = v
        self.out = out
        self.out_ln = out_ln
        self.n_heads = n_heads

    def __call__(self, x, attn_bias):
        b, s, d = x.shape
        hd = d // self.n_heads
        q = self.q(x).reshape(b, s, self.n_heads, hd)
        k = self.k(x).reshape(b, s, self.n_heads, hd)
        v = self.v(x).reshape(b, s, self.n_heads, hd)
        o = sdpa(q, jnp.transpose(k, (0, 2, 1, 3)), jnp.transpose(v, (0, 2, 1, 3)),
                 causal=False, bias=attn_bias)
        return self.out_ln(x + self.out(o.reshape(b, s, d)))


class BertBlock(Module):
    def __init__(self, attn, inter, output, out_ln, act):
        self.attn = attn
        self.inter = inter
        self.output = output
        self.out_ln = out_ln
        self.act = act

    def __call__(self, x, attn_bias):
        from ..nn.layers import ACT_FN

        x = self.attn(x, attn_bias)
        h = self.output(ACT_FN[self.act](self.inter(x)))
        return self.out_ln(x + h)


class BertModel(Module):
    def __init__(self, word_emb, pos_emb, type_emb, emb_ln, blocks, cfg: BertConfig):
        self.word_emb = word_emb
        self.pos_emb = pos_emb
        self.type_emb = type_emb
        self.emb_ln = emb_ln
        self.blocks = blocks
        self.cfg = cfg

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        b, s = input_ids.shape
        x = (jnp.take(self.word_emb, input_ids, axis=0)
             + self.pos_emb[None, :s]
             + (jnp.take(self.type_emb, token_type_ids, axis=0)
                if token_type_ids is not None else self.type_emb[0][None, None]))
        x = self.emb_ln(x)
        bias = None
        if attention_mask is not None:
            bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e30).astype(jnp.float32)
        for blk in self.blocks:
            x = blk(x, bias)
        return x  # [B, S, D]

    def sentence_embedding(self, input_ids, attention_mask):
        """Mean pooling over valid tokens + L2 norm (gte/sbert style, the
        reference demo_bert flow)."""
        h = self(input_ids, attention_mask)
        m = attention_mask[..., None].astype(h.dtype)
        emb = jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)


def bert_config_from_hf(path_or_dict) -> BertConfig:
    import json, os

    c = path_or_dict
    if not isinstance(c, dict):
        p = os.fspath(c)
        if os.path.isdir(p):
            p = os.path.join(p, "config.json")
        with open(p) as f:
            c = json.load(f)
    return BertConfig(
        vocab_size=c.get("vocab_size", 30522),
        hidden_size=c.get("hidden_size", 768),
        intermediate_size=c.get("intermediate_size", 3072),
        num_hidden_layers=c.get("num_hidden_layers", 12),
        num_attention_heads=c.get("num_attention_heads", 12),
        max_position_embeddings=c.get("max_position_embeddings", 512),
        type_vocab_size=c.get("type_vocab_size", 2),
        layer_norm_eps=c.get("layer_norm_eps", 1e-12),
        hidden_act=c.get("hidden_act", "gelu"),
    )


def load_bert(loader, cfg: BertConfig, dtype=jnp.float32) -> BertModel:
    d = cfg.hidden_size
    names = list(loader)
    pre = "bert." if any(n.startswith("bert.") for n in names) else ""

    def lin(prefix, out_f, in_f):
        return Linear(
            jnp.asarray(loader.load(prefix + ".weight", (out_f, in_f)), dtype),
            jnp.asarray(loader.load(prefix + ".bias", (out_f,)), dtype),
        )

    def ln(prefix):
        return LayerNorm(
            jnp.asarray(loader.load(prefix + ".weight", (d,)), dtype),
            jnp.asarray(loader.load(prefix + ".bias", (d,)), dtype),
            cfg.layer_norm_eps,
        )

    e = pre + "embeddings."
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"{pre}encoder.layer.{i}."
        attn = BertSelfAttention(
            lin(p + "attention.self.query", d, d), lin(p + "attention.self.key", d, d),
            lin(p + "attention.self.value", d, d), lin(p + "attention.output.dense", d, d),
            ln(p + "attention.output.LayerNorm"), cfg.num_attention_heads,
        )
        blocks.append(BertBlock(
            attn, lin(p + "intermediate.dense", cfg.intermediate_size, d),
            lin(p + "output.dense", d, cfg.intermediate_size),
            ln(p + "output.LayerNorm"), cfg.hidden_act,
        ))
    return BertModel(
        jnp.asarray(loader.load(e + "word_embeddings.weight", (cfg.vocab_size, d)), dtype),
        jnp.asarray(loader.load(e + "position_embeddings.weight", (cfg.max_position_embeddings, d)), dtype),
        jnp.asarray(loader.load(e + "token_type_embeddings.weight", (cfg.type_vocab_size, d)), dtype),
        ln(e + "LayerNorm"),
        ModuleList(blocks), cfg,
    )
