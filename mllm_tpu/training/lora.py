"""LoRA (low-rank adaptation) fine-tuning.

Beyond the reference (inference-only); the standard parameter-efficient
fine-tuning recipe realized on the Module pytree: `add_lora` swaps target
`Linear` layers for `LoRALinear` (frozen base weight + rank-r delta),
`lora_params_filter` restricts the optimizer to the adapter leaves, and
`merge_lora` folds the trained delta back into plain `Linear`s so inference
(including quantization and tp sharding) sees an ordinary model.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp

from ..nn.layers import Linear
from ..nn.module import Module, ModuleList

DEFAULT_TARGETS = r"(q_proj|k_proj|v_proj|o_proj)"


class LoRALinear(Module):
    """y = x W^T + scale * (x A^T) B^T + bias.

    weight/bias are the frozen base; lora_a [r, in] and lora_b [out, r] are
    the adapters (B zero-initialized, so the wrapped layer starts exactly
    equal to the base)."""

    def __init__(self, weight, bias, lora_a, lora_b, scale: float):
        self.weight = weight
        self.bias = bias
        self.lora_a = lora_a
        self.lora_b = lora_b
        self.scale = scale

    @staticmethod
    def wrap(lin: Linear, key, rank: int, alpha: float) -> "LoRALinear":
        out_f, in_f = lin.weight.shape
        a = jax.random.normal(key, (rank, in_f), jnp.float32) * (1.0 / rank)
        b = jnp.zeros((out_f, rank), jnp.float32)
        return LoRALinear(lin.weight, lin.bias, a, b, alpha / rank)

    def __call__(self, x):
        y = jax.lax.dot_general(x, self.weight, (((x.ndim - 1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        xa = jax.lax.dot_general(x.astype(jnp.float32), self.lora_a,
                                 (((x.ndim - 1,), (1,)), ((), ())))
        y = y + self.scale * jax.lax.dot_general(xa, self.lora_b,
                                                 (((xa.ndim - 1,), (1,)), ((), ())))
        y = y.astype(x.dtype)
        if self.bias is not None:
            y = y + self.bias.astype(y.dtype)
        return y

    def merged(self) -> Linear:
        delta = self.scale * (self.lora_b @ self.lora_a)  # [out, in]
        return Linear((self.weight.astype(jnp.float32) + delta).astype(self.weight.dtype),
                      self.bias)


def _map_linears(obj, fn, path=""):
    """Recursively rebuild the Module tree, applying fn(path, Linear)."""
    if isinstance(obj, Linear) and type(obj) is Linear:
        return fn(path, obj)
    if isinstance(obj, LoRALinear):
        return fn(path, obj)
    if isinstance(obj, ModuleList):
        return ModuleList([_map_linears(m, fn, f"{path}.{i}") for i, m in enumerate(obj.mods)])
    if isinstance(obj, Module):
        updates = {}
        for name, val in obj.__dict__.items():
            if isinstance(val, (Module, ModuleList)):
                new = _map_linears(val, fn, f"{path}.{name}")
                if new is not val:
                    updates[name] = new
        return obj.replace(**updates) if updates else obj
    return obj


def add_lora(model, key, rank: int = 8, alpha: float = 16.0,
             targets: str = DEFAULT_TARGETS):
    """Swap every target Linear (path regex) for a LoRALinear.

    Works on an UNROLLED model (call model.unstack() first if stacked)."""
    if getattr(model, "stacked_blocks", None) is not None:
        model = model.unstack()
    pat = re.compile(targets)
    counter = [0]

    def fn(path, lin):
        if isinstance(lin, LoRALinear) or not pat.search(path):
            return lin
        counter[0] += 1
        return LoRALinear.wrap(lin, jax.random.fold_in(key, counter[0]), rank, alpha)

    out = _map_linears(model, fn)
    if counter[0] == 0:
        raise ValueError(f"no Linear matched targets {targets!r}")
    return out


def merge_lora(model):
    """Fold every LoRALinear back into a plain Linear (inference form)."""
    def fn(path, lin):
        return lin.merged() if isinstance(lin, LoRALinear) else lin

    return _map_linears(model, fn)


def lora_params_filter(path: str) -> bool:
    """`trainable` predicate for make_train_step: adapters only."""
    return "lora_a" in path or "lora_b" in path
