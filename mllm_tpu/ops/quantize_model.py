"""Whole-model post-training quantization.

Counterpart of the reference's offline quantizer (tools/quantizer/,
main_quantize.cpp) — but applied in-memory to a loaded pytree: every dense
`Linear` becomes a `QuantLinear` (int8 per-channel) or `Int4Linear`
(group-32), including tied-embedding LM heads via `QuantEmbedHead`.

Skip rules mirror the reference quantizer's per-tensor skips
(QuantWriter.cpp): norms, biases, small projections stay float.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import Embedding, Int4Linear, Linear, QuantLinear
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


def _quant_linear(lin: Linear, mode: str, min_size: int):
    w = np.asarray(lin.weight, np.float32)
    if w.size < min_size or w.shape[1] % 64 != 0:
        return lin
    if mode == "int8":
        qv, sc = qm.repack_float_to_int8(w)
        return QuantLinear(jnp.asarray(qv), jnp.asarray(sc), lin.bias)
    packed, scales = qm.repack_float_to_int4(w, 32)
    return Int4Linear(jnp.asarray(packed), jnp.asarray(scales), 32, None, lin.bias)


def quantize_model(model, mode: Literal["int8", "int4"] = "int8",
                   min_size: int = 1 << 16, quant_embed_head: bool = True):
    """Return a copy of `model` with big Linears quantized."""

    def walk(obj):
        if isinstance(obj, Linear):
            return _quant_linear(obj, mode, min_size)
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
    # tied-embedding lm_head: quantize the projection path
    if quant_embed_head and getattr(model, "lm_head", 1) is None and hasattr(model, "embed_tokens"):
        emb = model.embed_tokens
        if isinstance(emb, Embedding):
            w = np.asarray(emb.weight, np.float32)  # [V, D]
            qv, sc = qm.repack_float_to_int8(w)  # [D, V], [V]
            model = model.replace(embed_tokens=QuantEmbedHead(emb, jnp.asarray(qv), jnp.asarray(sc)))
    return model
