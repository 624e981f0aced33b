"""Pipeline parallelism over a mesh axis (GPipe-style microbatching).

The reference's "pipeline parallelism" is a 2-deep CPU/NPU chunk pipeline
(/root/reference/mllm/Parallel.hpp:25-112).  The TPU-native generalization:
layers are split into S stages, one per device along the 'pp' mesh axis;
microbatches flow stage-to-stage over ICI with `jax.lax.ppermute` inside
`shard_map`.  S + M - 1 ticks for M microbatches (GPipe schedule).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def pipeline_forward(
    stage_params,  # pytree; every leaf has leading axis S (one slice per stage)
    x,  # [M, mb, ...] microbatched input
    stage_fn: Callable,  # (params_slice, h) -> h
    mesh: Mesh,
    axis: str = "pp",
    last_fn: Callable = None,  # (h, aux_mb) -> y, applied by the LAST stage
    aux=None,  # [M, ...] per-microbatch side input for last_fn (e.g. targets)
):
    """Run x through S pipeline stages living on S devices.

    stage_params leaves are sharded over `axis` on their leading dim; x is
    replicated in (microbatch-major) and the result comes out replicated.

    With `last_fn`, the final stage maps each finished microbatch through it
    (lm_head / loss live on the last device, GPipe-style) and the pipeline
    returns stacked `last_fn` outputs [M, ...] instead of hidden states.
    Fully differentiable: `jax.grad` through this function yields the 1F1B-
    equivalent gradients (XLA schedules the backward ppermutes).
    """
    s = mesh.shape[axis]
    m = x.shape[0]
    if aux is None:
        aux = jnp.zeros((m, 1), x.dtype)  # unused placeholder (uniform pytree)

    def per_device(params, xin, aux_in):
        # params: leaves [1, ...] (this stage); xin: full [M, mb, ...]
        params = jax.tree.map(lambda p: p[0], params)
        idx = jax.lax.axis_index(axis)
        n_ticks = m + s - 1

        def tick(carry, t):
            outputs, recv = carry
            # stage 0 feeds itself from the input stream; others from recv
            mb_idx = jnp.clip(t, 0, m - 1)
            feed = jax.lax.dynamic_index_in_dim(xin, mb_idx, axis=0, keepdims=False)
            h_in = jnp.where(idx == 0, feed, recv)
            h_out = stage_fn(params, h_in)
            # pass h_out to the next stage (ring; last->0 wraps, ignored)
            recv_next = jax.lax.ppermute(h_out, axis, [(i, (i + 1) % s) for i in range(s)])
            # last stage writes its finished microbatch t-(s-1)
            out_idx = t - (s - 1)
            do_write = (idx == s - 1) & (out_idx >= 0)

            def write(o):
                # last_fn (e.g. lm_head + CE over the full vocab) runs INSIDE
                # the taken branch only: non-last stages and warm-up ticks
                # skip its FLOPs entirely (real conditional, not a select)
                if last_fn is None:
                    y_out = h_out
                else:
                    aux_mb = jax.lax.dynamic_index_in_dim(
                        aux_in, jnp.clip(out_idx, 0, m - 1), axis=0, keepdims=False)
                    y_out = last_fn(h_out, aux_mb)
                return jax.lax.dynamic_update_index_in_dim(
                    o, y_out, jnp.clip(out_idx, 0, m - 1), axis=0)

            outputs = jax.lax.cond(do_write, write, lambda o: o, outputs)
            return (outputs, recv_next), None

        if last_fn is None:
            outputs0 = jnp.zeros_like(xin)
        else:
            y0 = jax.eval_shape(last_fn, jax.eval_shape(lambda a: a[0], xin),
                                jax.eval_shape(lambda a: a[0], aux_in))
            outputs0 = jnp.zeros((m,) + y0.shape, y0.dtype)
        recv0 = jnp.zeros_like(xin[0])
        (outputs, _), _ = jax.lax.scan(tick, (outputs0, recv0), jnp.arange(n_ticks))
        # broadcast final outputs from the last stage to all (masked psum)
        outputs = jax.lax.psum(
            jnp.where(idx == s - 1, outputs, jnp.zeros_like(outputs)), axis
        )
        return outputs

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=P(),
        check_rep=False,
    )
    return fn(stage_params, x, aux)


def stack_stages(block_params_list, n_stages: int):
    """Group per-layer params into `n_stages` stacked stage params.

    Returns a pytree with leading axes [S, layers_per_stage, ...].
    """
    n = len(block_params_list)
    per = n // n_stages
    assert per * n_stages == n, f"{n} layers not divisible into {n_stages} stages"
    stages = []
    for si in range(n_stages):
        chunk = block_params_list[si * per : (si + 1) * per]
        stages.append(jax.tree.map(lambda *xs: jnp.stack(xs), *chunk))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stages)


def pipeline_lm_hidden(model, input_ids, mesh: Mesh, axis: str = "pp",
                       n_microbatches: int = 4):
    """Cacheless CausalLM trunk as a GPipe pipeline of REAL DecoderBlocks.

    The model's decoder layers are split into mesh.shape[axis] stages (one
    per device); the batch is split into microbatches that flow stage-to-
    stage over ICI.  Embedding / final norm / lm_head stay replicated.
    Returns hidden states [B, S, D] identical to model.hidden_states."""
    b, s = input_ids.shape
    assert b % n_microbatches == 0, f"batch {b} % microbatches {n_microbatches}"
    n_stages = mesh.shape[axis]

    # uniform static aux required for leaf-stacking (layer_idx differs)
    blocks = [blk.replace(attn=blk.attn.replace(layer_idx=0)) for blk in model.blocks]
    stage_params = stack_stages(blocks, n_stages)

    x = model.embed_tokens(input_ids)
    if model.cfg.embedding_multiplier != 1.0:
        x = x * jnp.asarray(model.cfg.embedding_multiplier, x.dtype)
    positions = jnp.arange(s, dtype=jnp.int32)[None, :]
    rope = model.rope

    def stage_fn(stage_blocks, h):
        # stage_blocks: DecoderBlock pytree stacked [layers_per_stage, ...]
        def body(hc, blk):
            out, _ = blk(hc, rope, None, positions)
            return out, None
        h, _ = jax.lax.scan(body, h, stage_blocks)
        return h

    xmb = x.reshape(n_microbatches, b // n_microbatches, s, x.shape[-1])
    out = pipeline_forward(stage_params, xmb, stage_fn, mesh, axis=axis)
    return model.norm(out.reshape(b, s, -1))


def pipeline_lm_loss(model, input_ids, targets, mesh: Mesh, axis: str = "pp",
                     n_microbatches: int = 4):
    """Full GPipe training loss: trunk stages on the 'pp' axis, norm +
    lm_head + cross-entropy computed BY THE LAST STAGE per microbatch (the
    [mb, S, V] logits never leave that device), mean over microbatches.

    Differentiable end-to-end: jax.grad through this == jax.grad through
    model.loss (tested).  TPU-native generalization of the reference's
    2-stage chunk pipeline (/root/reference/mllm/Parallel.hpp:25-112) to a
    training step over a device mesh."""
    b, s = input_ids.shape
    assert b % n_microbatches == 0, f"batch {b} % microbatches {n_microbatches}"
    n_stages = mesh.shape[axis]

    blocks = [blk.replace(attn=blk.attn.replace(layer_idx=0)) for blk in model.blocks]
    stage_params = stack_stages(blocks, n_stages)

    x = model.embed_tokens(input_ids)
    if model.cfg.embedding_multiplier != 1.0:
        x = x * jnp.asarray(model.cfg.embedding_multiplier, x.dtype)
    positions = jnp.arange(s, dtype=jnp.int32)[None, :]
    rope = model.rope

    def stage_fn(stage_blocks, h):
        def body(hc, blk):
            out, _ = blk(hc, rope, None, positions)
            return out, None
        h, _ = jax.lax.scan(body, h, stage_blocks)
        return h

    def last_fn(h, tgt_mb):
        logits = model.logits(model.norm(h))  # [mb, S, V] f32, last stage only
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt_mb[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    mb = b // n_microbatches
    xmb = x.reshape(n_microbatches, mb, s, x.shape[-1])
    tmb = targets.reshape(n_microbatches, mb, s)
    losses = pipeline_forward(stage_params, xmb, stage_fn, mesh, axis=axis,
                              last_fn=last_fn, aux=tmb)
    return jnp.mean(losses)
