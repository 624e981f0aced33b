"""OPT — counterpart of /root/reference/mllm/models/opt/ (modeling_opt.hpp):
decoder-only with learned positional embeddings (offset 2), LayerNorm, ReLU
FFN, no rope.  Loads HF OPT checkpoints."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..kv.cache import KVCache
from ..nn.attention import attend
from ..nn.layers import Embedding, LayerNorm, Linear
from ..nn.module import Module, ModuleList


@dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 768
    ffn_dim: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 2048
    do_layer_norm_before: bool = True
    eos_token_id: int = 2
    bos_token_id: int = 2
    word_embed_proj_dim: int = 0  # 0 => == hidden_size


class OPTAttention(Module):
    def __init__(self, q_proj, k_proj, v_proj, out_proj, n_heads: int, layer_idx: int):
        self.q_proj = q_proj
        self.k_proj = k_proj
        self.v_proj = v_proj
        self.out_proj = out_proj
        self.n_heads = n_heads
        self.layer_idx = layer_idx

    def __call__(self, x, cache: KVCache):
        b, s, d = x.shape
        hd = d // self.n_heads
        scale = hd**-0.5
        q = (self.q_proj(x) * scale).reshape(b, s, self.n_heads, hd)
        k = self.k_proj(x).reshape(b, s, self.n_heads, hd)
        v = self.v_proj(x).reshape(b, s, self.n_heads, hd)
        cache = cache.update_layer(self.layer_idx, k, v)
        k_full, v_full = cache.layer(self.layer_idx)
        out = attend(q, k_full, v_full, q_offset=cache.pos, kv_valid_len=cache.pos + s,
                     causal=True, scale=1.0)
        return self.out_proj(out.reshape(b, s, d)), cache


class OPTBlock(Module):
    def __init__(self, ln1, attn, ln2, fc1, fc2, pre_norm: bool):
        self.ln1 = ln1
        self.attn = attn
        self.ln2 = ln2
        self.fc1 = fc1
        self.fc2 = fc2
        self.pre_norm = pre_norm

    def __call__(self, x, cache):
        res = x
        h = self.ln1(x) if self.pre_norm else x
        h, cache = self.attn(h, cache)
        x = res + h
        if not self.pre_norm:
            x = self.ln1(x)
        res = x
        h = self.ln2(x) if self.pre_norm else x
        h = self.fc2(jax.nn.relu(self.fc1(h)))
        x = res + h
        if not self.pre_norm:
            x = self.ln2(x)
        return x, cache


class OPTForCausalLM(Module):
    POS_OFFSET = 2  # HF OPTLearnedPositionalEmbedding offset

    def __init__(self, embed_tokens, embed_positions, blocks, final_ln, cfg: OPTConfig):
        self.embed_tokens = embed_tokens
        self.embed_positions = embed_positions  # [max_pos+2, D]
        self.blocks = blocks
        self.final_ln = final_ln
        self.cfg = cfg

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16):
        hd = self.cfg.hidden_size // self.cfg.num_attention_heads
        return KVCache.init(self.cfg.num_hidden_layers, batch, max_len,
                            self.cfg.num_attention_heads, hd, dtype)

    def __call__(self, input_ids, cache: KVCache, last_only: bool = True):
        b, s = input_ids.shape
        pos = cache.pos + jnp.arange(s) + self.POS_OFFSET
        x = self.embed_tokens(input_ids) + jnp.take(self.embed_positions, pos, axis=0)[None]
        for blk in self.blocks:
            x, cache = blk(x, cache)
        if self.final_ln is not None:
            x = self.final_ln(x)
        if last_only:
            x = x[:, -1:, :]
        logits = self.embed_tokens.as_lm_head(x)
        return logits, cache.advance(s)


def opt_config_from_hf(path_or_dict) -> OPTConfig:
    import json, os

    c = path_or_dict
    if not isinstance(c, dict):
        p = os.fspath(c)
        if os.path.isdir(p):
            p = os.path.join(p, "config.json")
        with open(p) as f:
            c = json.load(f)
    return OPTConfig(
        vocab_size=c.get("vocab_size", 50272),
        hidden_size=c.get("hidden_size", 768),
        ffn_dim=c.get("ffn_dim", 3072),
        num_hidden_layers=c.get("num_hidden_layers", 12),
        num_attention_heads=c.get("num_attention_heads", 12),
        max_position_embeddings=c.get("max_position_embeddings", 2048),
        do_layer_norm_before=c.get("do_layer_norm_before", True),
        eos_token_id=c.get("eos_token_id", 2),
    )


def load_opt(loader, cfg: OPTConfig, dtype=jnp.float32) -> OPTForCausalLM:
    d = cfg.hidden_size

    def lin(prefix, out_f, in_f):
        w = jnp.asarray(loader.load(prefix + ".weight", (out_f, in_f)), dtype)
        b = None
        if prefix + ".bias" in loader:
            b = jnp.asarray(loader.load(prefix + ".bias", (out_f,)), dtype)
        return Linear(w, b)

    def ln(prefix):
        return LayerNorm(
            jnp.asarray(loader.load(prefix + ".weight", (d,)), dtype),
            jnp.asarray(loader.load(prefix + ".bias", (d,)), dtype),
            1e-5,
        )

    pre = "model.decoder."
    embed = Embedding(jnp.asarray(loader.load(pre + "embed_tokens.weight", (cfg.vocab_size, d)), dtype))
    pos = jnp.asarray(loader.load(pre + "embed_positions.weight",
                                  (cfg.max_position_embeddings + 2, d)), dtype)
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"{pre}layers.{i}."
        attn = OPTAttention(
            lin(p + "self_attn.q_proj", d, d), lin(p + "self_attn.k_proj", d, d),
            lin(p + "self_attn.v_proj", d, d), lin(p + "self_attn.out_proj", d, d),
            cfg.num_attention_heads, i,
        )
        blocks.append(OPTBlock(
            ln(p + "self_attn_layer_norm"), attn, ln(p + "final_layer_norm"),
            lin(p + "fc1", cfg.ffn_dim, d), lin(p + "fc2", d, cfg.ffn_dim),
            cfg.do_layer_norm_before,
        ))
    final_ln = ln(pre + "final_layer_norm") if (pre + "final_layer_norm.weight") in loader else None
    return OPTForCausalLM(embed, pos, ModuleList(blocks), final_ln, cfg)
