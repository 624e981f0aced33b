"""Ulysses (DeepSpeed-style) sequence parallelism: all-to-all head/sequence
resharding around attention.

Absent in the reference by design (SURVEY §2.11 — sequence never crosses a
device there).  Complements ring attention (`ring_attention.py`): Ulysses
moves activations twice with `all_to_all` (O(S·H·D/p) per device) instead of
rotating K/V p times, so for moderate head counts it is the lower-traffic
exact long-context schedule; ring wins when H < p or when K/V reuse across
steps matters.  Both ride ICI via XLA collectives inside `shard_map`.

Dataflow per device (p = mesh.shape[axis]):
    [B, S/p, H, D]  --all_to_all-->  [B, S, H/p, D]
    full-sequence causal attention over the local head group
    [B, S, H/p, D]  --all_to_all-->  [B, S/p, H, D]
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

NEG_INF = -1e30


def _local_attention(q, k, v, causal: bool, scale: float):
    """Plain exact attention, f32 accumulate.  q/k/v: [B, S, h, D]."""
    b, s, h, d = q.shape
    qf = q.astype(jnp.float32) * scale
    scores = jnp.einsum("bqhd,bkhd->bhqk", qf, k.astype(jnp.float32))
    if causal:
        mask = jnp.tril(jnp.ones((s, s), bool))
        scores = jnp.where(mask[None, None], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32)).astype(q.dtype)


def ulysses_attention(
    q: jax.Array,  # [B, S, H, D]   (S = full sequence, sharded over `axis`)
    k: jax.Array,  # [B, S, H_kv, D]
    v: jax.Array,
    mesh: Mesh,
    axis: str = "sp",
    causal: bool = True,
    scale: Optional[float] = None,
) -> jax.Array:
    """Exact attention over the full sequence with seq-sharded inputs.

    Requires H % p == 0.  GQA K/V whose head count doesn't divide p are
    expanded to the query head count first (comm grows accordingly; use
    ring attention when that matters)."""
    b, s, h, d = q.shape
    hkv = k.shape[2]
    if scale is None:
        scale = d**-0.5
    p = mesh.shape[axis]
    assert h % p == 0, f"Ulysses needs q heads {h} % mesh axis {p} == 0"
    if hkv % p != 0:  # expand GQA kv heads so the head split divides
        # (when hkv % p == 0 the consecutive-head grouping already aligns
        # query group g with kv group g, handled by the local repeat below)
        k = jnp.repeat(k, h // hkv, axis=2)
        v = jnp.repeat(v, h // hkv, axis=2)

    def per_device(ql, kl, vl):
        # ql: [B, S/p, H, D] -> [B, S, H/p, D]: split heads, gather sequence
        qg = jax.lax.all_to_all(ql, axis, split_axis=2, concat_axis=1, tiled=True)
        kg = jax.lax.all_to_all(kl, axis, split_axis=2, concat_axis=1, tiled=True)
        vg = jax.lax.all_to_all(vl, axis, split_axis=2, concat_axis=1, tiled=True)
        hkv_l = kg.shape[2]
        n_rep = qg.shape[2] // hkv_l
        if n_rep > 1:  # GQA within the local head group
            kg = jnp.repeat(kg, n_rep, axis=2)
            vg = jnp.repeat(vg, n_rep, axis=2)
        out = _local_attention(qg, kg, vg, causal, scale)
        # back: [B, S, H/p, D] -> [B, S/p, H, D]
        return jax.lax.all_to_all(out, axis, split_axis=1, concat_axis=2, tiled=True)

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
        check_rep=False,
    )
    return fn(q, k, v)
