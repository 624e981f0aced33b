"""Ring attention: sequence/context parallelism over a mesh axis.

Absent in the reference by design (SURVEY §2.11 — sequence never crosses a
device there); this is the TPU-native long-context capability: Q/K/V are
sharded over the 'sp' axis on the sequence dim, K/V blocks rotate around the
ring with `jax.lax.ppermute` while each device accumulates its queries'
online-softmax state — attention over N·S tokens with N·(memory of S).

Causal masking is by absolute position, so the rotation order doesn't matter
for correctness; blocks entirely above the diagonal are still *computed*
(masked) — the standard simple ring schedule.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

NEG_INF = -1e30


def ring_attention(
    q: jax.Array,  # [B, S, H, D]  (S = full sequence, sharded over axis)
    k: jax.Array,  # [B, S, H_kv, D]
    v: jax.Array,
    mesh: Mesh,
    axis: str = "sp",
    causal: bool = True,
    scale: Optional[float] = None,
) -> jax.Array:
    """Exact attention over the full sequence with seq-sharded inputs."""
    b, s, h, d = q.shape
    hkv = k.shape[2]
    n_rep = h // hkv
    if scale is None:
        scale = d**-0.5
    n = mesh.shape[axis]
    s_local = s // n

    def per_device(ql, kl, vl):
        # ql: [B, S/n, H, D]; kl/vl: [B, S/n, H_kv, D]
        idx = jax.lax.axis_index(axis)
        q_pos0 = idx * s_local

        qf = (ql.astype(jnp.float32) * scale)
        m = jnp.full((b, s_local, h, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((b, s_local, h, 1), jnp.float32)
        acc = jnp.zeros((b, s_local, h, d), jnp.float32)

        def step(carry, r):
            m, l, acc, kr, vr = carry
            # kr currently holds the block originally from device (idx - r) mod n
            src = jax.lax.rem(idx - r + n, n)
            k_pos0 = src * s_local

            kk = jnp.repeat(kr, n_rep, axis=2) if n_rep > 1 else kr
            vv = jnp.repeat(vr, n_rep, axis=2) if n_rep > 1 else vr
            sij = jnp.einsum("bqhd,bkhd->bhqk", qf, kk.astype(jnp.float32))
            if causal:
                qp = q_pos0 + jax.lax.broadcasted_iota(jnp.int32, (s_local, s_local), 0)
                kp = k_pos0 + jax.lax.broadcasted_iota(jnp.int32, (s_local, s_local), 1)
                sij = jnp.where((kp <= qp)[None, None], sij, NEG_INF)
            sij_t = jnp.transpose(sij, (0, 2, 1, 3))  # [B, Sq, H, Sk]
            m_cur = jnp.max(sij_t, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, m_cur)
            p = jnp.exp(sij_t - m_new)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.einsum("bqhk,bkhd->bqhd", p, vv.astype(jnp.float32))
            # rotate K/V to the next device (overlapped with next iteration's
            # compute by XLA's async collective scheduling)
            kr = jax.lax.ppermute(kr, axis, [(i, (i + 1) % n) for i in range(n)])
            vr = jax.lax.ppermute(vr, axis, [(i, (i + 1) % n) for i in range(n)])
            return (m_new, l, acc, kr, vr), None

        (m, l, acc, _, _), _ = jax.lax.scan(step, (m, l, acc, kl, vl), jnp.arange(n))
        l = jnp.where(l == 0.0, 1.0, l)
        return (acc / l).astype(ql.dtype)

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
        check_rep=False,
    )
    return fn(q, k, v)
