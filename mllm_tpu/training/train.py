"""Training loop primitives: optimizer state + checkpoint/resume.

The reference is inference-only (SURVEY.md §5: "Checkpoint/resume:
model-load only") — on TPU, training/fine-tuning is a first-class
capability of the same model stack: `CausalLM.loss` is differentiable,
the parallel layer provides SPMD/GPipe gradients, and this module adds
the missing pieces — an optax optimizer wrapper and orbax-backed
checkpoint save/restore (params + opt state + step), all pytree-native
so sharded models checkpoint without gathering.

Mechanics: the model pytree is flattened once and partitioned into a
trainable list (float leaves, optionally path-filtered) and a frozen
remainder; grads/optimizer state live on the trainable list (None entries
are empty subtrees for JAX and optax alike), and the updated leaves are
zipped back through `tree_unflatten`.  This sidesteps treedef mismatches
between "params-only" and "full-model" pytrees.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..nn.module import Module


class TrainState(Module):
    """Model + optimizer state + step as ONE pytree (jit/shard/checkpoint
    as a unit).  The optimizer transform itself (static) stays outside the
    pytree and is re-supplied by `make_train_step`."""

    def __init__(self, model, opt_state, step):
        self.model = model
        self.opt_state = opt_state
        self.step = step

    @staticmethod
    def create(model, tx, trainable: Optional[Callable[[str], bool]] = None) -> "TrainState":
        params, _ = partition(model, trainable)
        return TrainState(model, tx.init(params), jnp.zeros((), jnp.int32))


def _is_float(x) -> bool:
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)


def partition(model, trainable: Optional[Callable[[str], bool]] = None):
    """Split the model's leaves into (trainable list, frozen list).

    Both lists have one entry per leaf; the off entries are None (an empty
    subtree to JAX, so grads/optimizer state skip them).  Trainable = float
    dtype, further restricted by `trainable(path_str)` when given (e.g.
    LoRA-only fine-tuning)."""
    flat = jax.tree_util.tree_flatten_with_path(model)[0]
    train, frozen = [], []
    for path, leaf in flat:
        on = _is_float(leaf) and (trainable is None or trainable(jax.tree_util.keystr(path)))
        train.append(leaf if on else None)
        frozen.append(None if on else leaf)
    return train, frozen


def combine(model, train_list, frozen_list):
    """Rebuild the model pytree from the two leaf lists."""
    treedef = jax.tree_util.tree_structure(model)
    leaves = [t if f is None else f for t, f in zip(train_list, frozen_list)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_train_step(tx, loss_fn: Optional[Callable] = None,
                    trainable: Optional[Callable[[str], bool]] = None):
    """Returns a jitted `step(state, batch_ids, batch_targets) -> (state, loss)`.

    tx:        an optax GradientTransformation (e.g. optax.adamw(1e-4))
    loss_fn:   (model, ids, targets) -> scalar; defaults to model.loss
    trainable: optional predicate(path_str) -> bool restricting updates to a
               parameter subset (e.g. `lora_params_filter`); the optimizer
               state then only materializes moments for that subset.
    """
    import optax

    def _loss(model, ids, targets):
        if loss_fn is not None:
            return loss_fn(model, ids, targets)
        return model.loss(ids, targets)

    @jax.jit
    def step(state: TrainState, batch_ids, batch_targets):
        params, frozen = partition(state.model, trainable)

        def wrapped(train_list):
            return _loss(combine(state.model, train_list, frozen),
                         batch_ids, batch_targets)

        loss, grads = jax.value_and_grad(wrapped)(params)
        grads = [g.astype(p.dtype) if g is not None else None
                 for g, p in zip(grads, params)]
        updates, opt_state = tx.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        model = combine(state.model, params, frozen)
        return TrainState(model, opt_state, state.step + 1), loss

    return step


# ---------------------------------------------------------------------------
# Checkpointing (orbax): params + opt state + step; resumable mid-run.
# Counterpart-and-beyond of the reference's immutable .mllm weight files
# (ParamLoader.cpp:14-31 — load-only, no training state).
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state: TrainState) -> None:
    """Serialized as the flat leaf list: orbax sees only a plain list pytree
    (Module custom nodes carry static metadata orbax's placeholder passes
    can't reconstruct); the treedef comes from the restore-side template."""
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    tmp = path + ".saving"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp, jax.tree.leaves(state))
    ckptr.wait_until_finished()
    if os.path.exists(path):
        # overwrite semantics: only replace something that IS an orbax
        # checkpoint (refuse to clobber an arbitrary directory)
        if not os.path.isdir(path) or not os.path.exists(
                os.path.join(path, "_CHECKPOINT_METADATA")):
            shutil.rmtree(tmp)
            raise ValueError(f"{path} exists and is not a checkpoint")
        shutil.rmtree(path)
    os.replace(tmp, path)


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """`template` supplies the pytree structure/shapes (e.g. a freshly
    `TrainState.create`d state); values are replaced from disk."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    leaves = ckptr.restore(os.path.abspath(path), target=jax.tree.leaves(template))
    return jax.tree_util.tree_unflatten(jax.tree_util.tree_structure(template), leaves)
