"""Expert parallelism: MoE expert weights sharded over a mesh axis.

The reference keeps experts on one device and streams them from disk (MBP,
SURVEY §2.6); multi-chip expert parallelism is the TPU-native upgrade: each
device owns E/ep experts, computes its local experts' contributions for all
tokens, and a `psum` over the 'ep' axis combines them (all-to-all-free
dense-dispatch formulation — right for the small expert counts of
MiniCPM-MoE/Qwen2-MoE class models).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models.moe import MoEMLP
from ..nn.layers import ACT_FN


def moe_forward_ep(moe: MoEMLP, x: jax.Array, mesh: Mesh, axis: str = "ep"):
    """Expert-parallel MoE forward: x [B, S, d] -> [B, S, d].

    Router runs replicated; expert FFNs run sharded over `axis` with a final
    psum.  Weights w_gate/w_up/w_down are sharded on their leading (expert)
    dim; router stays replicated.
    """
    e = moe.w_gate.shape[0]
    ep = mesh.shape[axis]
    assert e % ep == 0, f"{e} experts not divisible by ep={ep}"
    e_local = e // ep
    k = moe.top_k

    def per_device(w_gate, w_up, w_down, router_w, xin):
        # w_*: [E/ep, ...] local experts; xin: [B, S, d] replicated
        b, s, d = xin.shape
        t = b * s
        xf = xin.reshape(t, d)
        logits = jax.lax.dot_general(xf, router_w, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        top_p, top_i = jax.lax.top_k(probs, k)
        if moe.norm_topk_prob:
            top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)

        shard = jax.lax.axis_index(axis)
        base = shard * e_local
        y = jnp.zeros((t, d), jnp.float32)
        for le in range(e_local):  # small expert counts: unrolled
            ge = base + le
            # routing weight of expert ge per token (0 if not routed)
            w_tok = jnp.sum(jnp.where(top_i == ge, top_p, 0.0), axis=-1)  # [t]
            h = xf @ w_gate[le].astype(xf.dtype)
            u = xf @ w_up[le].astype(xf.dtype)
            o = (ACT_FN[moe.act](h) * u) @ w_down[le].astype(xf.dtype)
            y = y + o.astype(jnp.float32) * w_tok[:, None]
        y = jax.lax.psum(y, axis)
        return y.reshape(b, s, d).astype(xin.dtype)

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(),
        check_rep=False,
    )
    out = fn(moe.w_gate, moe.w_up, moe.w_down, moe.router_weight, x)
    if moe.shared_expert is not None:
        sh = moe.shared_expert(x.reshape(-1, x.shape[-1]))
        out = out + sh.reshape(x.shape).astype(out.dtype)
    return out
