"""Shared decoder-only transformer: the TPU-native twin of the reference's
models/transformer/modeling_transformer.hpp (MultiHeadAttention :35-219,
FeedForward :221-239) and the per-family modeling_*.hpp built on it.

One parameterized `CausalLM` covers most text families (qwen/llama/mistral/
gemma/smollm/...) — family differences are config + weight-name maps, exactly
as in the reference where families share `MultiHeadAttention`.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import TextConfig
from ..kv.cache import KVCache
from ..nn.attention import attend, attend_from_cache
from ..nn.layers import (
    ACT_FN,
    Embedding,
    LayerNorm,
    Linear,
    RMSNorm,
    RotaryEmbedding,
)
from ..nn.module import Module, ModuleList


def _make_norm(cfg: TextConfig, dim: int):
    if cfg.norm_type == "layernorm":
        return LayerNorm.init(dim, eps=cfg.rms_norm_eps)
    return RMSNorm.init(dim, eps=cfg.rms_norm_eps, add_unit_offset=cfg.model_type.startswith("gemma"))


class Attention(Module):
    """MHA/GQA with RoPE and functional KV cache.

    Mirrors reference MultiHeadAttention (modeling_transformer.hpp:35-219):
    split QKV projections, optional QK-norm, RoPE, cache append, SDPA/flash.
    """

    def __init__(self, q_proj, k_proj, v_proj, o_proj, q_norm, k_norm, cfg: TextConfig, layer_idx: int,
                 qkv_proj=None):
        self.q_proj = q_proj
        self.k_proj = k_proj
        self.v_proj = v_proj
        self.o_proj = o_proj
        self.q_norm = q_norm
        self.k_norm = k_norm
        self.cfg = cfg
        self.layer_idx = layer_idx
        # fused QKV (reference MultiHeadAttention fused-QKV mode,
        # modeling_transformer.hpp:35-219): one projection, split after.
        # Exactness-preserving vs split projections (per-output-channel
        # quantization commutes with concatenation); set by fuse_projections.
        self.qkv_proj = qkv_proj

    @staticmethod
    def init(key, cfg: TextConfig, layer_idx: int, dtype=jnp.float32):
        ks = jax.random.split(key, 4)
        h, hd = cfg.num_attention_heads, cfg.head_dim_
        hkv = cfg.num_key_value_heads
        d = cfg.hidden_size
        qn = kn = None
        if cfg.qk_norm:
            qn = RMSNorm.init(hd, cfg.rms_norm_eps)
            kn = RMSNorm.init(hd, cfg.rms_norm_eps)
        return Attention(
            Linear.init(ks[0], d, h * hd, cfg.attention_bias, dtype),
            Linear.init(ks[1], d, hkv * hd, cfg.attention_bias, dtype),
            Linear.init(ks[2], d, hkv * hd, cfg.attention_bias, dtype),
            Linear.init(ks[3], h * hd, d, cfg.o_proj_bias, dtype),
            qn, kn, cfg, layer_idx,
        )

    def _window(self):
        cfg = self.cfg
        if cfg.sliding_window is not None:
            # every `pattern`-th layer is global (gemma2/gemma3 convention);
            # pattern==1 -> all layers sliding (mistral)
            if cfg.sliding_window_pattern <= 1 or (self.layer_idx + 1) % cfg.sliding_window_pattern != 0:
                return cfg.sliding_window
        return None

    def __call__(self, x, rope: RotaryEmbedding, cache: Optional[KVCache], positions,
                 kv_start=None, layer_idx=None, bias=None, causal=True, ring=None):
        """bias/causal: tree speculative decoding passes an explicit attention
        bias (CausalTreeMask counterpart) with causal=False — all other
        config-driven behavior (QK-norm, windows, softcaps) stays identical.

        ring: optional (mesh, axis) — cacheless long-context path runs exact
        ring attention with the sequence sharded over that mesh axis
        (sequence parallelism; no reference counterpart, SURVEY §2.11)."""
        cfg = self.cfg
        if layer_idx is None:
            layer_idx = self.layer_idx
        b, s, _ = x.shape
        h, hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_

        if self.qkv_proj is not None:  # one GEMM, fewer kernel launches
            qkv = self.qkv_proj(x)
            q = qkv[..., : h * hd].reshape(b, s, h, hd)
            k = qkv[..., h * hd : (h + hkv) * hd].reshape(b, s, hkv, hd)
            v = qkv[..., (h + hkv) * hd :].reshape(b, s, hkv, hd)
        else:
            q = self.q_proj(x).reshape(b, s, h, hd)
            k = self.k_proj(x).reshape(b, s, hkv, hd)
            v = self.v_proj(x).reshape(b, s, hkv, hd)
        if self.q_norm is not None:
            q = self.q_norm(q)
            k = self.k_norm(k)
        q = rope(q, positions)
        k = rope(k, positions)

        scale = None
        if cfg.query_pre_attn_scalar:
            scale = cfg.query_pre_attn_scalar**-0.5
        if cache is not None:
            cache = cache.update_layer(layer_idx, k, v)
            out = attend_from_cache(
                q, cache, layer_idx,
                q_offset=cache.pos,
                kv_valid_len=cache.pos + s,
                kv_start=kv_start,
                causal=causal,
                window=self._window(),
                bias=bias,
                scale=scale,
                logit_softcap=cfg.attn_logit_softcap,
            )
        elif ring is not None:  # sequence-parallel exact attention
            assert bias is None and self._window() is None and cfg.attn_logit_softcap is None, \
                "sequence-parallel attention supports plain causal/dense attention only"
            mesh, axis, *mode = ring
            if mode and mode[0] == "ulysses":  # all-to-all head/seq reshard
                from ..parallel.ulysses import ulysses_attention

                out = ulysses_attention(q, k, v, mesh, axis=axis, causal=causal, scale=scale)
            else:  # K/V blocks rotate around the ring
                from ..parallel.ring_attention import ring_attention

                out = ring_attention(q, k, v, mesh, axis=axis, causal=causal, scale=scale)
        else:  # cacheless (training / scoring) path
            k_full = jnp.transpose(k, (0, 2, 1, 3))
            v_full = jnp.transpose(v, (0, 2, 1, 3))
            out = attend(
                q, k_full, v_full,
                q_offset=0,
                kv_valid_len=None,
                kv_start=kv_start,
                causal=causal,
                window=self._window(),
                bias=bias,
                scale=scale,
                logit_softcap=cfg.attn_logit_softcap,
            )
        out = out.reshape(b, s, h * hd)
        return self.o_proj(out), cache


class MLP(Module):
    """Gated FFN (reference FeedForward, modeling_transformer.hpp:221-239)."""

    def __init__(self, gate_proj, up_proj, down_proj, act: str, gateup_proj=None):
        self.gate_proj = gate_proj
        self.up_proj = up_proj
        self.down_proj = down_proj
        self.act = act
        self.gateup_proj = gateup_proj  # fused gate||up (see fuse_projections)

    @staticmethod
    def init(key, cfg: TextConfig, dtype=jnp.float32):
        ks = jax.random.split(key, 3)
        d, i = cfg.hidden_size, cfg.intermediate_size
        return MLP(
            Linear.init(ks[0], d, i, cfg.mlp_bias, dtype),
            Linear.init(ks[1], d, i, cfg.mlp_bias, dtype),
            Linear.init(ks[2], i, d, cfg.mlp_bias, dtype),
            cfg.hidden_act,
        )

    def __call__(self, x):
        if self.gateup_proj is not None:
            gu = self.gateup_proj(x)
            ff = gu.shape[-1] // 2
            h = ACT_FN[self.act](gu[..., :ff]) * gu[..., ff:]
            return self.down_proj(h)
        h = ACT_FN[self.act](self.gate_proj(x))
        if self.up_proj is not None:  # non-gated MLP (persimmon/opt-style)
            h = h * self.up_proj(x)
        return self.down_proj(h)


class DecoderBlock(Module):
    def __init__(self, input_norm, attn, post_attn_norm, mlp,
                 pre_ffn_norm=None, post_ffn_norm=None):
        self.input_norm = input_norm
        self.attn = attn
        self.post_attn_norm = post_attn_norm  # pre-FFN norm in standard pre-LN
        self.mlp = mlp
        self.pre_ffn_norm = pre_ffn_norm  # gemma2 extra norms
        self.post_ffn_norm = post_ffn_norm

    @staticmethod
    def init(key, cfg: TextConfig, layer_idx: int, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        pre_ffn = post_ffn = None
        if cfg.post_norm:  # gemma2: post_attention + post_ffn norms
            pre_ffn = _make_norm(cfg, cfg.hidden_size)
            post_ffn = _make_norm(cfg, cfg.hidden_size)
        return DecoderBlock(
            _make_norm(cfg, cfg.hidden_size),
            Attention.init(k1, cfg, layer_idx, dtype),
            _make_norm(cfg, cfg.hidden_size),
            MLP.init(k2, cfg, dtype),
            pre_ffn, post_ffn,
        )

    def __call__(self, x, rope, cache, positions, kv_start=None, layer_idx=None,
                 bias=None, causal=True, ring=None):
        rm = self.attn.cfg.residual_multiplier  # MiniCPM scale_depth/sqrt(L)
        h = self.input_norm(x)
        h, cache = self.attn(h, rope, cache, positions, kv_start=kv_start,
                             layer_idx=layer_idx, bias=bias, causal=causal, ring=ring)
        if self.pre_ffn_norm is not None:  # gemma2 ordering
            h = self.pre_ffn_norm(h)
        x = x + (h if rm == 1.0 else h * jnp.asarray(rm, h.dtype))
        h = self.post_attn_norm(x)
        h = self.mlp(h)
        if self.post_ffn_norm is not None:
            h = self.post_ffn_norm(h)
        x = x + (h if rm == 1.0 else h * jnp.asarray(rm, h.dtype))
        return x, cache


class CausalLM(Module):
    """Decoder-only LM with functional KV cache.

    Equivalent surface to reference `XForCausalLM` model classes
    (e.g. models/qwen/modeling_qwen.hpp:131-179).
    """

    def __init__(self, embed_tokens, blocks: ModuleList, norm, lm_head, rope, cfg: TextConfig):
        self.embed_tokens = embed_tokens
        self.blocks = blocks
        self.norm = norm
        self.lm_head = lm_head  # None => tied embeddings
        self.rope = rope
        self.cfg = cfg

    @staticmethod
    def init(key, cfg: TextConfig, dtype=jnp.float32):
        keys = jax.random.split(key, cfg.num_hidden_layers + 2)
        embed = Embedding.init(keys[0], cfg.vocab_size, cfg.hidden_size, dtype)
        blocks = ModuleList(
            [DecoderBlock.init(keys[i + 1], cfg, i, dtype) for i in range(cfg.num_hidden_layers)]
        )
        norm = _make_norm(cfg, cfg.hidden_size)
        lm_head = None
        if not cfg.tie_word_embeddings:
            lm_head = Linear.init(keys[-1], cfg.hidden_size, cfg.vocab_size, False, dtype)
        if cfg.rope_int8:  # reference IRoPE (int8 tables) — PhoneLM NPU path
            from ..nn.layers import IRotaryEmbedding

            rope = IRotaryEmbedding.make(
                cfg.head_dim_, cfg.max_position_embeddings, cfg.rope_theta,
                cfg.rope_style, cfg.rope_partial,
            )
        else:
            rope = RotaryEmbedding.make(
                cfg.head_dim_, cfg.max_position_embeddings, cfg.rope_theta,
                cfg.rope_style, cfg.rope_partial, cfg.rope_scaling_dict(),
            )
        return CausalLM(embed, blocks, norm, lm_head, rope, cfg)

    @staticmethod
    def init_stacked(key, cfg: TextConfig, dtype=jnp.float32,
                     with_rope: bool = True) -> "CausalLM":
        """O(1)-trace init: ONE DecoderBlock traced, `vmap`ped over layers.

        Produces a leaf-stacked model (as .stack() would).  The unrolled
        `init` traces every layer, which makes its jitted program O(L) in
        size — catastrophic through a remote-compile relay (313 s for a
        0.5B build vs seconds this way).  Use .unstack() for the unrolled
        block list.  Requires structurally-uniform blocks (same restriction
        as .stack()).

        with_rope=False skips the sin/cos table build (rope=None): the
        host-numpy tables become multi-MB inline CONSTANTS when init runs
        under jit (32k positions = 16 MB -> slow remote compiles); callers
        that install their own in-program tables (bench.py) opt out."""
        k_embed, k_blocks, k_head = jax.random.split(key, 3)
        blk_keys = jax.random.split(k_blocks, cfg.num_hidden_layers)
        stacked = jax.vmap(lambda kk: DecoderBlock.init(kk, cfg, 0, dtype))(blk_keys)
        embed = Embedding.init(k_embed, cfg.vocab_size, cfg.hidden_size, dtype)
        norm = _make_norm(cfg, cfg.hidden_size)
        lm_head = None
        if not cfg.tie_word_embeddings:
            lm_head = Linear.init(k_head, cfg.hidden_size, cfg.vocab_size, False, dtype)
        rope = None
        if with_rope:
            rope = RotaryEmbedding.make(
                cfg.head_dim_, cfg.max_position_embeddings, cfg.rope_theta,
                cfg.rope_style, cfg.rope_partial, cfg.rope_scaling_dict(),
            )
        out = CausalLM(embed, ModuleList([]), norm, lm_head, rope, cfg)
        out.__dict__["stacked_blocks"] = stacked
        out.__dict__["n_stacked"] = cfg.num_hidden_layers
        return out

    def unstack(self) -> "CausalLM":
        """Inverse of .stack(): leaf-stacked blocks -> unrolled block list."""
        stacked = getattr(self, "stacked_blocks", None)
        if stacked is None:
            return self
        n = getattr(self, "n_stacked")
        mods = []
        for i in range(n):
            blk = jax.tree.map(lambda x: x[i], stacked)
            mods.append(blk.replace(attn=blk.attn.replace(layer_idx=i)))
        out = self.replace(blocks=ModuleList(mods))
        out.__dict__.pop("stacked_blocks", None)
        out.__dict__.pop("n_stacked", None)
        return out

    def init_cache(self, batch: int, max_len: int, dtype=jnp.bfloat16,
                   kv_dtype: str = "bf16"):
        """kv_dtype: 'bf16'/'f32' (dense, from `dtype`), 'int8'/'q8' (the
        reference's KVCache_TYPE knob, /root/reference/mllm/Types.hpp:26-33:
        2x context per chip) or 'int4'/'q4' (4x context, beyond the
        reference's q8 floor) — both stream through the fused quant
        attention kernels."""
        cfg = self.cfg
        if kv_dtype in ("int4", "q4", "q4_0"):
            from ..kv.cache import Quant4KVCache

            return Quant4KVCache.init(
                cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim_
            )
        if kv_dtype in ("int8", "q8", "q8_0"):
            from ..kv.cache import QuantKVCache

            return QuantKVCache.init(
                cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim_
            )
        return KVCache.init(
            cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim_, dtype
        )

    def stack(self) -> "CausalLM":
        """Return a copy whose decoder blocks are leaf-stacked for `lax.scan`.

        Compile time becomes O(1) in depth (one traced block instead of L).
        Requires structurally-uniform blocks — not for per-layer sliding
        window patterns (gemma2 keeps the unrolled path).
        """
        if self.cfg.sliding_window is not None and self.cfg.sliding_window_pattern > 1:
            return self  # per-layer window pattern needs static layer ids
        mods = [m.replace(attn=m.attn.replace(layer_idx=0)) for m in self.blocks.mods]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *mods)
        out = self.replace(blocks=ModuleList([]))
        out.__dict__["stacked_blocks"] = stacked
        out.__dict__["n_stacked"] = len(mods)
        return out

    def hidden_states(self, input_ids, cache: Optional[KVCache], inputs_embeds=None,
                      pad_lens=None, ring=None, remat=False):
        """Run the trunk; returns (hidden [B,S,D], cache with pos advanced).

        pad_lens: [B] number of left-pad tokens per sequence (ragged batching);
        rope positions shift back by pad_lens and the pad prefix is masked.
        ring: (mesh, axis) — cacheless sequence-parallel trunk via ring
        attention (mllm_tpu/parallel/ring_attention.py).
        remat: rematerialize per-block activations in the backward pass
        (`jax.checkpoint`) — training memory drops from O(layers x S x D)
        activations to O(1 block) at ~1/3 extra FLOPs (the standard TPU
        HBM-for-FLOPs trade; cacheless/training paths only).
        """
        x = inputs_embeds if inputs_embeds is not None else self.embed_tokens(input_ids)
        if self.cfg.embedding_multiplier != 1.0:
            x = x * jnp.asarray(self.cfg.embedding_multiplier, x.dtype)
        s = x.shape[1]
        pos0 = cache.pos if cache is not None else jnp.zeros((), jnp.int32)
        if getattr(pos0, "ndim", 0) == 1:  # SlotKVCache: per-slot heads [B]
            pos0 = pos0[:, None]
        positions = pos0 + jnp.arange(s, dtype=jnp.int32)[None, :]  # [1 or B, S]
        kv_start = None
        if pad_lens is not None:
            positions = jnp.maximum(positions - pad_lens[:, None], 0)  # [B, S]
            kv_start = jnp.asarray(pad_lens, jnp.int32)
        stacked = getattr(self, "stacked_blocks", None)
        if stacked is not None:
            n = getattr(self, "n_stacked")
            if cache is not None:
                def body(carry, inp):
                    xc, cc = carry
                    blk, idx = inp
                    xc, cc = blk(xc, self.rope, cc, positions, kv_start=kv_start,
                                 layer_idx=idx)
                    return (xc, cc), None
                (x, cache), _ = jax.lax.scan(body, (x, cache),
                                             (stacked, jnp.arange(n, dtype=jnp.int32)))
            else:
                def blk_fn(xc, blk, idx):
                    out, _ = blk(xc, self.rope, None, positions, kv_start=kv_start,
                                 layer_idx=idx, ring=ring)
                    return out

                if remat:
                    blk_fn = jax.checkpoint(blk_fn)

                def body(carry, inp):
                    blk, idx = inp
                    return blk_fn(carry, blk, idx), None
                x, _ = jax.lax.scan(body, x, (stacked, jnp.arange(n, dtype=jnp.int32)))
        else:
            def blk_fn2(xc, blk):
                out, _ = blk(xc, self.rope, None, positions, kv_start=kv_start,
                             ring=ring)
                return out

            if remat and cache is None:
                blk_fn2 = jax.checkpoint(blk_fn2)
            for blk in self.blocks:
                if cache is None:
                    x = blk_fn2(x, blk)
                else:
                    x, cache = blk(x, self.rope, cache, positions,
                                   kv_start=kv_start, ring=ring)
        x = self.norm(x)
        return x, (cache.advance(s) if cache is not None else None)

    def loss(self, input_ids, targets, mask=None, ring=None, remat=False):
        """Next-token cross-entropy (cacheless forward) — the training path.
        ring: (mesh, axis) runs the trunk with sequence-parallel ring attention.
        remat: per-block activation rematerialization (see hidden_states)."""
        hidden, _ = self.hidden_states(input_ids, None, ring=ring, remat=remat)
        logits = self.logits(hidden)  # [B, S, V] f32
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        if mask is not None:
            return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        return jnp.mean(nll)

    def logits(self, hidden):
        if self.cfg.logit_divisor != 1.0:  # MiniCPM hidden/dim_model_base
            hidden = hidden / jnp.asarray(self.cfg.logit_divisor, hidden.dtype)
        if self.lm_head is not None:
            out = self.lm_head(hidden).astype(jnp.float32)
        else:
            out = self.embed_tokens.as_lm_head(hidden)
        if self.cfg.logit_softcap:
            out = jnp.tanh(out / self.cfg.logit_softcap) * self.cfg.logit_softcap
        return out

    def __call__(self, input_ids, cache: KVCache, last_only: bool = True, inputs_embeds=None,
                 pad_lens=None):
        """Returns (logits, cache). last_only clips to the final position
        (reference modeling_qwen.hpp:157-159)."""
        hidden, cache = self.hidden_states(input_ids, cache, inputs_embeds, pad_lens=pad_lens)
        if last_only:
            hidden = hidden[:, -1:, :]
        return self.logits(hidden), cache
