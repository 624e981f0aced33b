"""Whole-model post-training quantization.

Counterpart of the reference's offline quantizer (tools/quantizer/,
main_quantize.cpp) — but applied in-memory to a loaded pytree: every dense
`Linear` becomes a `QuantLinear` (int8 per-channel) or `Int4Linear`
(group-32), including tied-embedding LM heads via `QuantEmbedHead`.

Skip rules mirror the reference quantizer's per-tensor skips
(QuantWriter.cpp): norms, biases, small projections stay float.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import (Embedding, Int4Linear, Int4LinearXLA, Linear,
                         QuantLinear, QuantLinearA8)
from ..nn.module import Module
from . import quant_matmul as qm


class QuantEmbedHead(Module):
    """Tied-embedding lm_head with int8 weights for the projection
    (embedding lookup stays on the float table)."""

    def __init__(self, embedding: Embedding, qweight_t, scales):
        self.embedding = embedding
        self.qweight_t = qweight_t  # int8 [D, V]
        self.scales = scales  # [V]

    def __call__(self, ids):
        return self.embedding(ids)

    @property
    def weight(self):
        return self.embedding.weight

    def as_lm_head(self, x):
        return qm.int8_matmul(x, self.qweight_t, self.scales)


@jax.jit
def _q8_device(w):
    """Per-out-channel symmetric int8, computed on-device (no host round trip):
    float [..., N, K] -> (int8 [..., K, N], scales f32 [..., N]).
    Leading dims pass through (lax.scan leaf-stacked layers)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-1)
    sc = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / sc[..., None]), -127, 127).astype(jnp.int8)
    return jnp.swapaxes(q, -1, -2), sc


class Int4EmbedHead(Module):
    """Tied-embedding lm_head with n-axis int4 weights for the projection.

    The lm_head GEMV is the single biggest per-step weight read at large
    vocab (151936 x 1536 = 233 MB in int8 on the flagship); int4 halves it.
    Embedding lookup stays on the float table."""

    def __init__(self, embedding: Embedding, packed_n, scales_g, group: int = 32):
        self.embedding = embedding
        self.packed_n = packed_n  # uint8 [D, V/2]
        self.scales_g = scales_g  # f32 [D/G, V]
        self.group = group

    def __call__(self, ids):
        return self.embedding(ids)

    @property
    def weight(self):
        return self.embedding.weight

    def as_lm_head(self, x):
        return qm.int4_xla_matmul(x, self.packed_n, self.scales_g, None, self.group)


@jax.jit
def _q4n_device(w):
    """Group-32 symmetric int4 n-axis pack on-device:
    float [..., N, K] -> (packed_n uint8 [..., K, N/2], scales f32 [..., K/32, N]).
    zshift is identically zero for symmetric weights (value = qs*scale)."""
    n, k = w.shape[-2], w.shape[-1]
    lead = w.shape[:-2]
    wg = w.astype(jnp.float32).reshape(*lead, n, k // 32, 32)
    amax = jnp.max(jnp.abs(wg), axis=-1)
    sc = jnp.where(amax > 0, amax / 7.0, 1.0)
    v = jnp.clip(jnp.round(wg / sc[..., None]), -8, 7).astype(jnp.int8).reshape(*lead, n, k)
    return qm.pack_int4_n(jnp.swapaxes(v, -1, -2)), jnp.swapaxes(sc, -1, -2)


class Int4EmbedHeadPallas(Module):
    """Tied-embedding lm_head on the Pallas int4 group kernel.

    Pallas-impl counterpart of `Int4EmbedHead`: the lm_head GEMV is the
    biggest per-step weight read (233 MB int8 at vocab 151936), and on the
    Pallas path the XLA n-axis formulation is VPU-dequant-bound (~3x the
    kernel's streaming rate over 233M weights), so the head goes through
    the same group-partial kernel as the trunk projections.  The vocab axis
    is zero-padded to a 512 multiple so the kernel gets large n-blocks
    (zero weights dequant to exactly 0 in the excess-8 layout); padded
    logits are sliced off.  Embedding lookup stays on the float table."""

    def __init__(self, embedding: Embedding, proj: Int4Linear, vocab: int):
        self.embedding = embedding
        self.proj = proj
        self.vocab = vocab

    def __call__(self, ids):
        return self.embedding(ids)

    @property
    def weight(self):
        return self.embedding.weight

    def as_lm_head(self, x):
        return self.proj(x)[..., : self.vocab]


@functools.partial(jax.jit, static_argnums=1)
def _q4_device(w, group: int = 32):
    """Symmetric int4 planar pack on-device:
    float [..., N, K] -> (packed uint8 [..., K/2, N], scales f32 [..., K/G, N]
    in natural k-group order)."""
    n, k = w.shape[-2], w.shape[-1]
    lead = w.shape[:-2]
    wg = w.astype(jnp.float32).reshape(*lead, n, k // group, group)
    amax = jnp.max(jnp.abs(wg), axis=-1)
    sc = jnp.where(amax > 0, amax / 7.0, 1.0)
    v = jnp.clip(jnp.round(wg / sc[..., None]), -8, 7).astype(jnp.int8).reshape(*lead, n, k)
    vt = jnp.swapaxes(v, -1, -2)  # [..., K, N]
    lo = (vt[..., : k // 2, :] & 0x0F).astype(jnp.uint8)
    hi = (vt[..., k // 2 :, :] & 0x0F).astype(jnp.uint8)
    return lo | (hi << 4), jnp.swapaxes(sc, -1, -2)


# Below this weight count, int4's HBM saving is smaller than the Pallas
# kernel's fixed launch cost at decode shapes — use the int8 XLA fused-convert
# dot instead (measured: [1,1536]x[1536,2048] int4 kernel ~= int8 + overhead).
INT4_MIN_PARAMS = 6 << 20


def _quant_linear(lin: Linear, mode: str, min_size: int, on_device: bool):
    shape = lin.weight.shape
    if np.prod(shape) < min_size or shape[-1] % 64 != 0:
        return lin
    n_params = int(np.prod(shape[-2:]))
    if mode == "int4" and n_params < INT4_MIN_PARAMS and qm.int4_impl() != "xla":
        # mixed precision: small projections stay int8 on the Pallas path,
        # whose fixed launch cost rivals the tiny-GEMV byte saving; the XLA
        # n-axis path has no custom-call boundary so int4 wins at any size
        mode = "int8"
    if on_device or lin.weight.ndim > 2:  # stacked layers always quantize on-device
        if mode in ("int8", "int8-a8"):
            qv, sc = _q8_device(lin.weight)
            cls = QuantLinearA8 if mode == "int8-a8" else QuantLinear
            return cls(qv, sc, lin.bias)
        if qm.int4_impl() == "xla":
            packed_n, scales = _q4n_device(lin.weight)
            return Int4LinearXLA(packed_n, scales, None, 32, lin.bias)
        packed, scales = _q4_device(lin.weight)
        packed, scales, _ = qm.prepare_int4(packed, scales, 32)
        return Int4Linear(packed, scales, 32, None, lin.bias)  # symmetric
    w = np.asarray(lin.weight, np.float32)
    if mode in ("int8", "int8-a8"):
        qv, sc = qm.repack_float_to_int8(w)
        cls = QuantLinearA8 if mode == "int8-a8" else QuantLinear
        return cls(jnp.asarray(qv), jnp.asarray(sc), lin.bias)
    packed, scales, zeros = qm.prepare_int4(*qm.repack_float_to_int4(w, 32), group=32)
    return make_int4_linear(packed, scales, zeros, lin.bias, k=w.shape[-1],
                            symmetric=True)


def make_int4_linear(packed, scales, zeros, bias, k: int,
                     symmetric: bool = False):
    """Canonical planar int4 operands (numpy or jnp) -> the Int4Linear
    flavor selected by MLLM_INT4_IMPL (lossless layout conversion).

    symmetric=True (weights quantized from float, or Q4_0 whose law is
    value = (q-8)*d): the Pallas flavor drops the zeros operand and runs
    the zeros-elided kernel; the XLA flavor already elides its zshift."""
    if qm.int4_impl() == "xla":
        pn, sg, zg = qm.canonical_to_n_layout(packed, scales, zeros, 32, k)
        if symmetric:
            zg = None  # zshift identically zero
        return Int4LinearXLA(jnp.asarray(pn), jnp.asarray(sg),
                             None if zg is None else jnp.asarray(zg), 32, bias)
    return Int4Linear(jnp.asarray(packed), jnp.asarray(scales), 32,
                      None if symmetric else jnp.asarray(zeros), bias)


class FusedInt4MLP(Module):
    """Gated MLP executed by the single-launch fused int4 kernel
    (ops/fused_mlp.py).  Created by quantize_model(mode='int4') when the MLP
    is gated with a supported activation."""

    def __init__(self, gate_ops, up_ops, down_ops, act: str, block_f: int,
                 bias=None):
        self.gate_ops = tuple(gate_ops)
        self.up_ops = tuple(up_ops)
        self.down_ops = tuple(down_ops)
        self.act = act
        self.block_f = block_f
        self.bias = bias  # down_proj bias (rare)

    def __call__(self, x):
        from .fused_mlp import fused_int4_mlp

        y = fused_int4_mlp(x, self.gate_ops, self.up_ops, self.down_ops,
                           act=self.act, block_f=self.block_f)
        if self.bias is not None:
            y = y + self.bias
        return y.astype(x.dtype)


def _fuse_int4_mlp(mlp, min_size: int, on_device: bool):
    """MLP -> FusedInt4MLP when eligible, else None."""
    from .fused_mlp import _ACT, pick_block_f

    if qm.int4_impl() == "xla":
        return None  # XLA schedules/fuses the n-axis path itself
    if mlp.act not in _ACT:
        return None
    if getattr(mlp, "gateup_proj", None) is not None:
        # fuse_projections merged gate||up into one Linear; split it back —
        # per-out-channel group quantization commutes with output-channel
        # concatenation, so quantizing the halves is exact vs the fused form
        gu = mlp.gateup_proj
        if type(gu) is not Linear or gu.bias is not None:
            return None
        ff_half = gu.weight.shape[-2] // 2
        gate_l = Linear(gu.weight[..., :ff_half, :], None)
        up_l = Linear(gu.weight[..., ff_half:, :], None)
    elif mlp.up_proj is not None:
        gate_l, up_l = mlp.gate_proj, mlp.up_proj
    else:
        return None
    for lin in (gate_l, up_l, mlp.down_proj):
        if type(lin) is not Linear or lin.bias is not None and lin is not mlp.down_proj:
            return None
        if np.prod(lin.weight.shape) < min_size or lin.weight.shape[-1] % 64:
            return None
    ff = gate_l.weight.shape[-2]
    d = gate_l.weight.shape[-1]
    block_f = pick_block_f(ff)
    if block_f is None or d % 64 or ff % 64:
        return None

    # float-sourced quantization is always symmetric -> zeros == -8*scales
    # identically: store None and run the zeros-elided kernel variant
    def ops_over_d(lin):
        if on_device or lin.weight.ndim > 2:
            packed, scales = _q4_device(lin.weight)
            p, sc, _ = qm.prepare_int4(packed, scales, 32)
            return p, sc, None
        p, sc = qm.repack_float_to_int4(np.asarray(lin.weight, np.float32), 32)
        p, sc, _ = qm.prepare_int4(p, sc, 32)
        return jnp.asarray(p), jnp.asarray(sc), None

    from .fused_mlp import prepare_int4_ff

    if on_device or mlp.down_proj.weight.ndim > 2:
        dp, dsc = _q4_device(mlp.down_proj.weight)
        dpp, dss, _ = prepare_int4_ff(dp, dsc, None, block_f)
        down_ops = (dpp, dss, None)
    else:
        dp, dsc = qm.repack_float_to_int4(np.asarray(mlp.down_proj.weight, np.float32), 32)
        dpp, dss, _ = prepare_int4_ff(dp, dsc, None, block_f)
        down_ops = (jnp.asarray(dpp), jnp.asarray(dss), None)
    return FusedInt4MLP(ops_over_d(gate_l), ops_over_d(up_l),
                        down_ops, mlp.act, block_f, bias=mlp.down_proj.bias)


def fuse_projections(model):
    """Fuse q/k/v -> one qkv projection and gate/up -> one gateup projection.

    The reference's fused-QKV MultiHeadAttention mode
    (modeling_transformer.hpp:35-219), applied as a whole-model transform.
    Exactness-preserving: per-output-channel quantization commutes with
    output-channel concatenation, so fuse-then-quantize == quantize on the
    split projections.  On TPU this cuts kernel launches per decoder layer
    from 7 to 4 — decisive for the Pallas int4 decode path where per-call
    overhead rivals the (tiny) k/v GEMV cost.  Call BEFORE quantize_model;
    works on unrolled or leaf-stacked (vmapped) models."""
    from ..models.transformer import Attention, MLP

    def fuse_lin(lins):
        w = jnp.concatenate([l.weight for l in lins], axis=-2)
        biases = [l.bias for l in lins]
        if all(b is None for b in biases):
            b = None
        else:
            b = jnp.concatenate(
                [l.bias if l.bias is not None
                 else jnp.zeros(l.weight.shape[:-1], l.weight.dtype)
                 for l in lins], axis=-1)
        return Linear(w, b)

    def walk(obj):
        if isinstance(obj, Attention):
            if (obj.qkv_proj is None
                    and all(type(p) is Linear for p in (obj.q_proj, obj.k_proj, obj.v_proj))):
                fused = fuse_lin([obj.q_proj, obj.k_proj, obj.v_proj])
                return obj.replace(qkv_proj=fused, q_proj=None, k_proj=None, v_proj=None)
            return obj
        if isinstance(obj, MLP):
            if (getattr(obj, "gateup_proj", None) is None and obj.up_proj is not None
                    and type(obj.gate_proj) is Linear and type(obj.up_proj) is Linear):
                fused = fuse_lin([obj.gate_proj, obj.up_proj])
                return obj.replace(gateup_proj=fused, gate_proj=None, up_proj=None)
            return obj
        if isinstance(obj, Module):
            updates = {}
            for k, v in list(obj.__dict__.items()):
                nv = walk(v)
                if nv is not v:
                    updates[k] = nv
            return obj.replace(**updates) if updates else obj
        if isinstance(obj, list):
            new = [walk(v) for v in obj]
            return new if any(a is not b for a, b in zip(new, obj)) else obj
        if isinstance(obj, tuple):
            new = tuple(walk(v) for v in obj)
            return new if any(a is not b for a, b in zip(new, obj)) else obj
        return obj

    return walk(model)


def quantize_model(model, mode: Literal["int8", "int8-a8", "int4"] = "int8",
                   min_size: int = 1 << 16, quant_embed_head: bool = True,
                   on_device: bool = False, attn_quant: str | None = None):
    """Return a copy of `model` with big Linears quantized.

    on_device=True quantizes with jitted jnp programs where the weights live
    (no host round trips) — the fast path when weights were generated or
    loaded straight onto the chip.

    attn_quant overrides `mode` for Linears inside Attention modules
    ("mixed placement").  Rationale on TPU: attention projections are the
    SMALL per-step GEMVs (qkv+o ≈ 8 MB int8/layer vs ~21 MB for the MLP),
    so under the Pallas int4 impl their custom-call boundaries cost more
    than their bandwidth saves — int8 keeps them inside the one fused XLA
    graph (native int8 dot, cross-op prefetch) while the MLP mega-kernel
    and lm_head still stream int4.  `mode="int4", attn_quant="int8"` is the
    `-q int4-mixed` surface in the demos/bench."""

    from ..models.transformer import MLP as _MLP, Attention as _Attn

    def walk(obj, lin_mode=mode):
        if isinstance(obj, Linear):
            return _quant_linear(obj, lin_mode, min_size, on_device)
        if attn_quant is not None and isinstance(obj, _Attn):
            updates = {}
            for k, v in list(obj.__dict__.items()):
                nv = walk(v, attn_quant)
                if nv is not v:
                    updates[k] = nv
            return obj.replace(**updates) if updates else obj
        if type(obj).__name__ == "MoEMLP":
            # routed expert stacks quantize to int8 per-(expert, out-channel)
            # (the reference quantizes its MoE models' expert FFNs like any
            # Linear; int4 mode also uses int8 here — ragged_dot streams
            # int8 natively, packed nibbles would need a custom grouped dot);
            # then fall through so the shared expert / router children walk
            from ..models.moe import QuantMoEMLP

            if np.prod(obj.w_gate.shape[-3:]) >= min_size:  # per-layer [E,K,N]
                obj = QuantMoEMLP.from_moe(obj)
        if mode == "int4" and type(obj) is _MLP:
            fused = _fuse_int4_mlp(obj, min_size, on_device)
            if fused is not None:
                return fused
            # fall through: quantize the individual projections
        if isinstance(obj, Module):
            updates = {}
            for k, v in list(obj.__dict__.items()):
                nv = walk(v)
                if nv is not v:
                    updates[k] = nv
            return obj.replace(**updates) if updates else obj
        if isinstance(obj, list):
            new = [walk(v) for v in obj]
            return new if any(a is not b for a, b in zip(new, obj)) else obj
        if isinstance(obj, tuple):
            new = tuple(walk(v) for v in obj)
            return new if any(a is not b for a, b in zip(new, obj)) else obj
        return obj

    model = walk(model)
    # tied-embedding lm_head: quantize the projection path (the float table
    # stays for lookups).  int4-xla mode halves the biggest per-step read.
    if quant_embed_head and getattr(model, "lm_head", 1) is None and hasattr(model, "embed_tokens"):
        emb = model.embed_tokens
        if isinstance(emb, Embedding):
            if mode == "int4" and qm.int4_impl() == "xla":
                if on_device:
                    pn, sg = _q4n_device(emb.weight)
                else:
                    w = np.asarray(emb.weight, np.float32)  # [V, D]
                    pc, sc_, zc = qm.prepare_int4(*qm.repack_float_to_int4(w, 32))
                    pn, sg, _ = qm.canonical_to_n_layout(pc, sc_, zc, 32, w.shape[-1])
                    pn, sg = jnp.asarray(pn), jnp.asarray(sg)
                model = model.replace(embed_tokens=Int4EmbedHead(emb, pn, sg))
            elif mode == "int4":
                # Pallas impl: route the head through the group kernel (the
                # XLA n-axis head is VPU-dequant-bound at vocab scale)
                v, d = emb.weight.shape
                vp = -(-v // 512) * 512
                if on_device:
                    wp = jnp.pad(emb.weight, ((0, vp - v), (0, 0)))
                    packed, scales = _q4_device(wp)
                    packed, scales, _ = qm.prepare_int4(packed, scales, 32)
                else:
                    w = np.pad(np.asarray(emb.weight, np.float32),
                               ((0, vp - v), (0, 0)))
                    packed, scales, _ = qm.prepare_int4(
                        *qm.repack_float_to_int4(w, 32), group=32)
                    packed, scales = jnp.asarray(packed), jnp.asarray(scales)
                proj = Int4Linear(packed, scales, 32, None, None)  # symmetric
                model = model.replace(
                    embed_tokens=Int4EmbedHeadPallas(emb, proj, v))
            else:
                if on_device:
                    qv, sc = _q8_device(emb.weight)
                else:
                    w = np.asarray(emb.weight, np.float32)  # [V, D]
                    q_np, s_np = qm.repack_float_to_int8(w)  # [D, V], [V]
                    qv, sc = jnp.asarray(q_np), jnp.asarray(s_np)
                model = model.replace(embed_tokens=QuantEmbedHead(emb, qv, sc))
    return model
