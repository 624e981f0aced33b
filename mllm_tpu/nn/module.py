"""Pytree-registered Module system: PyTorch-like authoring, purely functional
under `jax.jit`.

This replaces the reference's Module/Layer/Op/Backend eager executor
(/root/reference/mllm/Module.hpp, Layer.hpp, Backend.hpp) the TPU-native way:
a Module *is* a pytree whose leaves are its parameters, so any function taking
a Module can be `jax.jit`-ed / `jax.grad`-ed / sharded with `jax.device_put`
directly — there is no op registry, no reshape/setUp/execute lifecycle, and no
allocator: XLA owns scheduling and memory.

Semantics:
  - Attributes holding jax/numpy arrays, Modules, or (nested) list/tuple/dict
    of those are pytree children.
  - Everything else (ints, strings, configs, callables) is static metadata and
    participates in the jit cache key; it must be hashable.
  - `ModuleList` mirrors the reference's `Module::List<T>` stacked blocks.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterable

import jax
import numpy as np


def _is_array(x) -> bool:
    # ShapeDtypeStruct included so abstract modules (jax.eval_shape output)
    # flatten with the same child structure as concrete ones.
    return (isinstance(x, (jax.Array, np.ndarray, jax.ShapeDtypeStruct))
            or hasattr(x, "__jax_array__"))


def _is_child(x) -> bool:
    if _is_array(x) or isinstance(x, Module):
        return True
    if isinstance(x, (list, tuple)):
        return any(_is_child(v) for v in x)
    if isinstance(x, dict):
        return any(_is_child(v) for v in x.values())
    return False


class _Static:
    """Hashable wrapper for static aux data, compared by equality."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def __eq__(self, other):
        return type(other) is _Static and _eq_static(self.value, other.value)

    def __hash__(self):
        try:
            return hash(_freeze(self.value))
        except TypeError:
            return 0


def _freeze(v):
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, set):
        return frozenset(_freeze(x) for x in v)
    return v


def _eq_static(a, b):
    try:
        return bool(a == b)
    except Exception:
        return a is b


class Module:
    """Base class. Subclasses are automatically pytree-registered."""

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        jax.tree_util.register_pytree_with_keys(
            cls,
            flatten_with_keys=_flatten_with_keys,
            unflatten_func=lambda aux, children: _unflatten(cls, aux, children),
            flatten_func=_flatten,
        )

    # -- convenience -------------------------------------------------------
    def replace(self, **updates) -> "Module":
        """Functional update: returns a copy with the given attrs replaced."""
        new = object.__new__(type(self))
        new.__dict__.update(self.__dict__)
        new.__dict__.update(updates)
        return new

    def parameters(self) -> dict[str, jax.Array]:
        """Flat {dotted.name: array} view of all parameter leaves."""
        out = {}
        flat = jax.tree_util.tree_flatten_with_path(self)[0]
        for path, leaf in flat:
            out[_path_str(path)] = leaf
        return out

    def num_params(self) -> int:
        return sum(int(np.prod(v.shape)) for v in jax.tree.leaves(self) if hasattr(v, "shape"))

    def astype(self, dtype) -> "Module":
        """Cast all floating-point leaves (TPU: use jnp.bfloat16)."""
        import jax.numpy as jnp

        def cast(x):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
            return x

        return jax.tree.map(cast, self)

    def __repr__(self):
        n = self.num_params()
        return f"{type(self).__name__}(params={n:,})"


def _partition(obj: Module):
    keys = sorted(obj.__dict__.keys())
    child_keys = tuple(k for k in keys if _is_child(obj.__dict__[k]))
    static_items = tuple((k, _Static(obj.__dict__[k])) for k in keys if k not in set(child_keys))
    return child_keys, static_items


def _flatten(obj: Module):
    child_keys, static_items = _partition(obj)
    children = tuple(obj.__dict__[k] for k in child_keys)
    return children, (child_keys, static_items)


def _flatten_with_keys(obj: Module):
    child_keys, static_items = _partition(obj)
    children = tuple((jax.tree_util.GetAttrKey(k), obj.__dict__[k]) for k in child_keys)
    return children, (child_keys, static_items)


def _unflatten(cls, aux, children):
    child_keys, static_items = aux
    obj = object.__new__(cls)
    for k, v in zip(child_keys, children):
        obj.__dict__[k] = v
    for k, sv in static_items:
        obj.__dict__[k] = sv.value
    return obj


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(p.name)
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return ".".join(parts)


class ModuleList(Module):
    """Stacked sub-blocks; mirrors reference `Module::List<T>` (Module.hpp:264-283)."""

    def __init__(self, mods: Iterable[Module]):
        self.mods = list(mods)

    def __iter__(self):
        return iter(self.mods)

    def __len__(self):
        return len(self.mods)

    def __getitem__(self, i):
        return self.mods[i]


def stack_modules(mods: list[Module]) -> Module:
    """Stack N structurally-identical modules leaf-wise for `lax.scan` layers.

    Returns a single module whose every leaf has a new leading axis of size N.
    Using scan over stacked blocks keeps compile time O(1) in depth.
    """
    import jax.numpy as jnp

    return jax.tree.map(lambda *xs: jnp.stack(xs), *mods)
