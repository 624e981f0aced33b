"""Multi-chip sharding over a `jax.sharding.Mesh`.

The reference is single-process by design (SURVEY.md §2.11) — its parallelism
is OpenMP threads + a CPU/NPU pipeline.  On TPU, scaling past one chip is a
first-class capability: we lay out parameters/caches with `NamedSharding`s
over a (dp, tp) mesh and let GSPMD insert the ICI collectives
(all-gather/reduce-scatter/psum), per the standard scaling-book recipe.

Axes:
  dp — data parallel (batch)
  tp — tensor parallel (attention heads / MLP intermediate / vocab)

Partition rules (megatron-style):
  q/k/v/gate/up [out, in]  -> P('tp', None)   (column parallel)
  o/down        [out, in]  -> P(None, 'tp')   (row parallel; psum on output)
  embedding     [V, D]     -> P('tp', None)   (vocab parallel)
  norms / biases of row-parallel layers -> replicated
  KV cache      [L, B, H_kv, S, D] -> P(None, 'dp', 'tp', None, None)
"""

from __future__ import annotations

import re
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kv.cache import KVCache


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if len(devices) < dp * tp:
            devices = jax.devices("cpu")
    devices = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(devices, axis_names=("dp", "tp"))


# path-regex -> PartitionSpec for the weight leaf (weights are [out, in])
_COLUMN = re.compile(r"(q_proj|k_proj|v_proj|gate_proj|up_proj|lm_head|qkv_proj)\.weight")
_ROW = re.compile(r"(o_proj|down_proj)\.weight")
_COLUMN_BIAS = re.compile(r"(q_proj|k_proj|v_proj|gate_proj|up_proj|lm_head|qkv_proj)\.bias")
_EMBED = re.compile(r"embed_tokens\.weight")
_EXPERT = re.compile(r"experts\..*\.weight")


def param_spec(path: str, ndim: int) -> P:
    if _EMBED.search(path):
        return P("tp", None)
    if _COLUMN.search(path):
        return P("tp", None)
    if _ROW.search(path):
        return P(None, "tp")
    if _COLUMN_BIAS.search(path):
        return P("tp")
    return P()  # replicated


def shard_model(model, mesh: Mesh):
    """device_put every parameter leaf with its NamedSharding."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(model)
    out = []
    for path, leaf in flat:
        pstr = _path_to_str(path)
        if hasattr(leaf, "ndim"):
            spec = param_spec(pstr, leaf.ndim)
            # guard: axis size must divide the sharded dim
            spec = _validate_spec(spec, leaf.shape, mesh)
            out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    spec = _validate_spec(P(None, "dp", "tp", None, None), cache.k.shape, mesh)
    sh = NamedSharding(mesh, spec)
    return KVCache(
        jax.device_put(cache.k, sh),
        jax.device_put(cache.v, sh),
        jax.device_put(cache.pos, NamedSharding(mesh, P())),
    )


def shard_batch(x, mesh: Mesh):
    spec = _validate_spec(P("dp"), x.shape, mesh)
    return jax.device_put(x, NamedSharding(mesh, spec))


def _validate_spec(spec: P, shape, mesh: Mesh) -> P:
    new = []
    for i, ax in enumerate(spec):
        if ax is None:
            new.append(None)
            continue
        size = mesh.shape[ax]
        if i < len(shape) and shape[i] % size == 0:
            new.append(ax)
        else:
            new.append(None)
    return P(*new)


def _path_to_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(p.name)
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
    return ".".join(parts)


# ---------------------------------------------------------------------------
# Sharded step functions
# ---------------------------------------------------------------------------


def sgd_train_step(model, batch_ids, batch_targets, lr: float = 1e-3):
    """One SPMD training step: CE loss, grads, SGD update.  All collectives
    (grad psum over dp, activation all-reduce over tp) are inserted by GSPMD
    from the parameter/batch shardings."""
    def loss_fn(m):
        return m.loss(batch_ids, batch_targets)

    loss, grads = jax.value_and_grad(loss_fn)(model)
    new_model = jax.tree.map(
        lambda p, g: p - lr * g.astype(p.dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        model, grads,
    )
    return new_model, loss


def sharded_forward(model, input_ids, cache: Optional[KVCache]):
    """Sharded inference forward (prefill or decode depending on S)."""
    return model(input_ids, cache, last_only=True)
