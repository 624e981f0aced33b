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

# quantized layouts: int8 QuantLinear holds qweight_t [in, out] + scales [out];
# n-axis int4 (Int4LinearXLA) holds packed_n [in, out/2] + scales_g/zshift_g
# [in/G, out].  All are "out-last", so column-parallel shards the LAST axis
# and row-parallel the first.  (The canonical planar Pallas int4 layout stays
# replicated: its lo/hi k-halves + custom call don't GSPMD-partition.)
_COL_NAMES = r"(q_proj|k_proj|v_proj|gate_proj|up_proj|lm_head)"
_ROW_NAMES = r"(o_proj|down_proj)"
_COLUMN_QLEAF = re.compile(_COL_NAMES + r"\.(qweight_t|packed_n|scales_g|zshift_g)")
_ROW_QLEAF = re.compile(_ROW_NAMES + r"\.(qweight_t|packed_n|scales_g|zshift_g)")
_COLUMN_QSCALE = re.compile(_COL_NAMES + r"\.scales$")  # int8 per-out [out]


def param_spec(path: str, ndim: int) -> P:
    if _EMBED.search(path):
        spec = P("tp", None)
    elif _COLUMN.search(path):
        spec = P("tp", None)
    elif _ROW.search(path):
        spec = P(None, "tp")
    elif _COLUMN_QLEAF.search(path):
        spec = P(None, "tp")
    elif _ROW_QLEAF.search(path):
        spec = P("tp", None)
    elif _COLUMN_BIAS.search(path) or _COLUMN_QSCALE.search(path):
        spec = P("tp")
    else:
        return P()  # replicated
    if ndim == len(spec) + 1:  # leaf-stacked (lax.scan) layers: [L, ...]
        spec = P(None, *spec)
    return spec


def shard_model(model, mesh: Mesh):
    """device_put every parameter leaf with its NamedSharding."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(model)
    out = []
    for path, leaf in flat:
        pstr = _path_to_str(path)
        if hasattr(leaf, "ndim"):
            spec = param_spec(pstr, leaf.ndim)
            # guard: axis size must divide the sharded dim
            spec = _validate_spec(spec, leaf.shape, mesh, path=pstr)
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


def shard_slot_cache(cache, mesh: Mesh):
    """Shard a SlotKVCache (or quant/paged variant) for tensor parallelism:
    KV heads (axis 2 of the 5-D [L, B, Hkv, S, hd] leaves) split over 'tp',
    per-slot write heads and block tables replicated.  Composes the serving
    engine with tp: each device holds its kv-head shard of every slot, so
    admits/window decodes write device-locally and GSPMD inserts the o/down
    all-reduces from the model's megatron specs."""
    def sh(a):
        if getattr(a, "ndim", 0) == 5:
            spec = _validate_spec(P(None, None, "tp", None, None), a.shape, mesh)
        else:
            spec = P()
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(sh, cache)


def shard_batch(x, mesh: Mesh):
    spec = _validate_spec(P("dp"), x.shape, mesh)
    return jax.device_put(x, NamedSharding(mesh, spec))


def _validate_spec(spec: P, shape, mesh: Mesh, path: str = "") -> P:
    new = []
    for i, ax in enumerate(spec):
        if ax is None:
            new.append(None)
            continue
        size = mesh.shape[ax]
        if i < len(shape) and shape[i] % size == 0:
            new.append(ax)
        else:
            # correctness-preserving but a perf cliff: surface it
            from ..utils.log import log_warn

            log_warn("sharding dropped: dim not divisible by mesh axis",
                     param=path or "<anon>", dim=i,
                     size=int(shape[i]) if i < len(shape) else -1,
                     axis=str(ax), axis_size=int(size))
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


def sharded_generate(model, input_ids, mesh: Mesh, max_new_tokens: int,
                     max_len: int, eos_token_id: int = -1,
                     cache_dtype=jnp.float32):
    """Greedy generation of a REAL CausalLM under a (dp, tp) mesh: tp-sharded
    prefill + a fully-compiled decode loop over the tp-sharded KV cache.
    GSPMD inserts the ICI collectives from the parameter/cache shardings.

    Returns tokens [B, max_new_tokens] (-1 padded after EOS).  Token-exact vs
    the single-device path (tests/test_parallel.py).

    Geometries whose head counts don't divide tp (e.g. the flagship's
    12 q / 2 kv on tp=8) are first rewritten exactly by pad_heads_for_tp
    (GQA expansion + zero-pad q heads) so the KV cache and every projection
    shard with nothing silently replicated."""
    import functools

    from .heads import pad_heads_for_tp

    tp = mesh.shape.get("tp", 1)
    model = pad_heads_for_tp(model, tp)
    model = shard_model(model, mesh)
    b, true_len = input_ids.shape
    cache = shard_cache(model.init_cache(b, max_len, cache_dtype), mesh)

    @functools.partial(jax.jit, static_argnames=("steps",), donate_argnames=("cache",))
    def run(model, cache, ids, steps):
        logits, cache = model(ids, cache, last_only=True)
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        tokens = jnp.full((b, steps), -1, jnp.int32).at[:, 0].set(tok)
        done = tok == eos_token_id

        def body(state):
            i, tok, cache, tokens, done = state
            logits, cache = model(tok[:, None], cache, last_only=True)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, -1, nxt)
            tokens = tokens.at[:, i].set(nxt)
            return i + 1, nxt, cache, tokens, done | (nxt == eos_token_id)

        def cond(state):
            i, tok, cache, tokens, done = state
            return (i < steps) & ~jnp.all(done)

        _, _, cache, tokens, _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(1), tok, cache, tokens, done))
        return tokens

    with jax.set_mesh(mesh):
        ids = shard_batch(jnp.asarray(input_ids, jnp.int32), mesh)
        return run(model, cache, ids, max_new_tokens)
