"""KV-cache / generation-state persistence.

The reference's checkpoint surface is weights-only (immutable `.mllm` files
+ the QNN compiled-context cache, SURVEY §5); generation state dies with the
process.  For a serving deployment, snapshotting the KV state lets a
restarted server resume mid-conversation without re-prefilling — this module
adds that: any cache variant (KVCache / QuantKVCache / SlotKVCache) round-
trips through one .npz file, and resuming decode from a restored cache is
token-identical to an uninterrupted run (tested).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .cache import KVCache, Quant4KVCache, QuantKVCache, SlotKVCache

_TYPES = {c.__name__: c for c in (KVCache, Quant4KVCache, QuantKVCache, SlotKVCache)}


def save_cache(path, cache, extra: dict | None = None) -> None:
    """Snapshot a cache pytree (plus optional metadata arrays) to `path`."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(cache)[0]
    arrs, names, dtypes = {}, [], []
    for i, (kpath, x) in enumerate(flat):
        name = kpath[-1].name if hasattr(kpath[-1], "name") else str(kpath[-1])
        names.append(name)
        dtypes.append(str(x.dtype))
        a = np.asarray(x.astype(jnp.float32)) if str(x.dtype) == "bfloat16" else np.asarray(x)
        arrs[f"leaf_{i}"] = a  # bf16 has no numpy dtype: widen, restore on load
    arrs["__type__"] = np.asarray(type(cache).__name__)
    arrs["__names__"] = np.asarray(names)
    arrs["__dtypes__"] = np.asarray(dtypes)
    if extra:
        for k, v in extra.items():
            arrs[f"extra_{k}"] = np.asarray(v)
    np.savez(path, **arrs)


def load_cache(path, extra_keys: tuple = ()):
    """Restore a cache saved by save_cache; returns (cache, extras dict)."""
    z = np.load(path, allow_pickle=False)
    cls = _TYPES[str(z["__type__"])]
    names = [str(n) for n in z["__names__"]]
    dtypes = [str(d) for d in z["__dtypes__"]]
    out = object.__new__(cls)
    for i, (name, dt) in enumerate(zip(names, dtypes)):
        a = z[f"leaf_{i}"]
        out.__dict__[name] = jnp.asarray(a, jnp.bfloat16 if dt == "bfloat16" else a.dtype)
    extras = {k: z[f"extra_{k}"] for k in extra_keys if f"extra_{k}" in z}
    return out, extras
