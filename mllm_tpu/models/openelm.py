"""OpenELM — counterpart of /root/reference/mllm/models/openelm/.

Distinctive architecture: per-layer head counts and FFN widths
(layer-wise scaling), fused qkv with per-head RMSNorm on q/k, fused
gate+up FFN, rope on head_dim 64.  Our per-layer block construction handles
non-uniform layers naturally (each block carries its own shapes).

Weight names follow apple/OpenELM: transformer.layers.{i}.attn.qkv_proj /
attn.out_proj / ffn.proj_1 / ffn.proj_2 / attn_norm / ffn_norm,
transformer.token_embeddings, transformer.norm.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..kv.cache import KVCache
from ..nn.attention import attend
from ..nn.layers import Embedding, Linear, RMSNorm, RotaryEmbedding
from ..nn.module import Module, ModuleList


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


@dataclass(frozen=True)
class OpenELMConfig:
    vocab_size: int = 32000
    model_dim: int = 1280
    num_layers: int = 16
    head_dim: int = 64
    num_query_heads: tuple = ()
    num_kv_heads: tuple = ()
    ffn_dims: tuple = ()
    max_context: int = 2048
    rope_theta: float = 10000.0
    eps: float = 1e-6
    eos_token_id: int = 2
    bos_token_id: int = 1

    @staticmethod
    def from_hf(c: dict) -> "OpenELMConfig":
        n = c.get("num_transformer_layers", 16)
        dim = c.get("model_dim", 1280)
        qh = tuple(c.get("num_query_heads", [12] * n))
        kvh = tuple(c.get("num_kv_heads", [3] * n))
        mult = c.get("ffn_multipliers", [2.0] * n)
        div = c.get("ffn_dim_divisor", 256)
        ffn = tuple(_make_divisible(m * dim, div) for m in mult)
        return OpenELMConfig(
            vocab_size=c.get("vocab_size", 32000),
            model_dim=dim, num_layers=n, head_dim=c.get("head_dim", 64),
            num_query_heads=qh, num_kv_heads=kvh, ffn_dims=ffn,
            max_context=c.get("max_context_length", 2048),
            rope_theta=float(c.get("rope_freq_constant", 10000)),
        )


class OpenELMAttention(Module):
    def __init__(self, qkv, out_proj, q_norm, k_norm, n_q: int, n_kv: int,
                 head_dim: int, layer_idx: int):
        self.qkv = qkv
        self.out_proj = out_proj
        self.q_norm = q_norm
        self.k_norm = k_norm
        self.n_q = n_q
        self.n_kv = n_kv
        self.head_dim = head_dim
        self.layer_idx = layer_idx

    def __call__(self, x, rope, cache, positions, n_kv_max: int):
        b, s, _ = x.shape
        hd = self.head_dim
        qkv = self.qkv(x).reshape(b, s, self.n_q + 2 * self.n_kv, hd)
        q = qkv[:, :, : self.n_q]
        k = qkv[:, :, self.n_q : self.n_q + self.n_kv]
        v = qkv[:, :, self.n_q + self.n_kv :]
        q = self.q_norm(q)
        k = self.k_norm(k)
        q = rope(q, positions)
        k = rope(k, positions)
        # pad kv heads to the model-wide max so one cache serves all layers
        if self.n_kv < n_kv_max:
            pad = n_kv_max - self.n_kv
            k = jnp.concatenate([k, jnp.zeros((b, s, pad, hd), k.dtype)], axis=2)
            v = jnp.concatenate([v, jnp.zeros((b, s, pad, hd), v.dtype)], axis=2)
        cache = cache.update_layer(self.layer_idx, k, v)
        k_full, v_full = cache.layer(self.layer_idx)
        k_full = k_full[:, : self.n_kv]
        v_full = v_full[:, : self.n_kv]
        # GQA: repeat kv to n_q (n_q % n_kv == 0 in OpenELM)
        out = attend(q, k_full, v_full, q_offset=cache.pos, kv_valid_len=cache.pos + s,
                     causal=True)
        return self.out_proj(out.reshape(b, s, self.n_q * hd)), cache


class OpenELMBlock(Module):
    def __init__(self, attn_norm, attn, ffn_norm, proj_1, proj_2, ffn_dim: int):
        self.attn_norm = attn_norm
        self.attn = attn
        self.ffn_norm = ffn_norm
        self.proj_1 = proj_1  # fused [2*ffn, d]: gate | up
        self.proj_2 = proj_2
        self.ffn_dim = ffn_dim

    def __call__(self, x, rope, cache, positions, n_kv_max):
        h, cache = self.attn(self.attn_norm(x), rope, cache, positions, n_kv_max)
        x = x + h
        h = self.proj_1(self.ffn_norm(x))
        gate, up = h[..., : self.ffn_dim], h[..., self.ffn_dim :]
        x = x + self.proj_2(jax.nn.silu(gate) * up)
        return x, cache


class OpenELMForCausalLM(Module):
    def __init__(self, embed, blocks, norm, rope, cfg: OpenELMConfig):
        self.embed_tokens = embed
        self.blocks = blocks
        self.norm = norm
        self.rope = rope
        self.cfg = cfg

    @property
    def n_kv_max(self) -> int:
        return max(self.cfg.num_kv_heads)

    def init_cache(self, batch, max_len, dtype=jnp.bfloat16) -> KVCache:
        return KVCache.init(self.cfg.num_layers, batch, max_len, self.n_kv_max,
                            self.cfg.head_dim, dtype)

    def __call__(self, input_ids, cache, last_only=True):
        b, s = input_ids.shape
        x = self.embed_tokens(input_ids)
        positions = cache.pos + jnp.arange(s, dtype=jnp.int32)[None, :]
        for blk in self.blocks:
            x, cache = blk(x, self.rope, cache, positions, self.n_kv_max)
        x = self.norm(x)
        if last_only:
            x = x[:, -1:, :]
        return self.embed_tokens.as_lm_head(x), cache.advance(s)


def load_openelm(loader, cfg: OpenELMConfig, dtype=jnp.float32):
    d = cfg.model_dim
    hd = cfg.head_dim

    def lin(name, o, i):
        return Linear(jnp.asarray(loader.load(name + ".weight", (o, i)), dtype), None)

    def rms(name, dim):
        return RMSNorm(jnp.asarray(loader.load(name + ".weight", (dim,)), dtype), cfg.eps)

    blocks = []
    for i in range(cfg.num_layers):
        p = f"transformer.layers.{i}."
        nq, nkv, ffn = cfg.num_query_heads[i], cfg.num_kv_heads[i], cfg.ffn_dims[i]
        attn = OpenELMAttention(
            lin(p + "attn.qkv_proj", (nq + 2 * nkv) * hd, d),
            lin(p + "attn.out_proj", d, nq * hd),
            rms(p + "attn.q_norm", hd), rms(p + "attn.k_norm", hd),
            nq, nkv, hd, i,
        )
        blocks.append(OpenELMBlock(
            rms(p + "attn_norm", d), attn, rms(p + "ffn_norm", d),
            lin(p + "ffn.proj_1", 2 * ffn, d), lin(p + "ffn.proj_2", d, ffn), ffn,
        ))
    return OpenELMForCausalLM(
        Embedding(jnp.asarray(loader.load("transformer.token_embeddings.weight",
                                          (cfg.vocab_size, d)), dtype)),
        ModuleList(blocks), rms("transformer.norm", d),
        RotaryEmbedding.make(hd, cfg.max_context, cfg.rope_theta, "hf"),
        cfg,
    )
