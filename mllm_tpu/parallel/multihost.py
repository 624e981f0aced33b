"""Multi-host (multi-slice / DCN) scale-out helpers.

The reference is single-process by design — no NCCL/MPI/sockets (SURVEY.md
§2.11: "Distributed communication backend: none").  The TPU-native scale-out
story has two tiers of interconnect:

  ICI  — the intra-slice torus: fast, where tensor/pipeline/sequence
         parallelism must live;
  DCN  — the data-center network between slices/hosts: ~10-100x slower,
         only suitable for data parallelism (gradient all-reduce once per
         step) per the scaling-book recipe.

This module wires the standard JAX multi-process setup around that split:
`initialize()` (jax.distributed), `hybrid_mesh()` (DCN axes leading, ICI
axes trailing, so GSPMD routes each collective over the right fabric), and
`host_local_batch()` (per-process shards -> one global array).

On a single slice/process everything degrades to the ordinary device mesh —
which is how the CPU test suite exercises it.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the JAX multi-process runtime (call BEFORE any other jax API).

    On Cloud TPU all three arguments auto-detect from the metadata server;
    pass them explicitly elsewhere (e.g. GKE: coordinator 'host0:1234')."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def _num_slices(devices) -> int:
    ids = {getattr(d, "slice_index", 0) for d in devices}
    return len(ids)


def hybrid_mesh(ici: dict[str, int], dcn: Optional[dict[str, int]] = None,
                devices=None) -> Mesh:
    """Build a mesh whose DCN axes (slices) lead and ICI axes trail.

    ici:  axis -> size within a slice, e.g. {"tp": 4} or {"pp": 2, "tp": 4}
    dcn:  axis -> size across slices, e.g. {"dp": 2}; None/{} = single slice

    Leading-axis placement puts each DCN axis across slice boundaries and
    keeps every ICI axis inside a slice, so tp/pp/sp collectives ride the
    torus and only the dp gradient reduction crosses the DCN
    (mesh_utils.create_hybrid_device_mesh's contract).  On a single slice
    the DCN axes are laid out over ICI too (correct, just unnecessary)."""
    dcn = dcn or {}
    if devices is None:
        devices = jax.devices()
    ici_shape = tuple(ici.values()) or (1,)
    dcn_shape = tuple(dcn.values()) or (1,)
    names = tuple(dcn.keys()) + tuple(ici.keys())
    need = int(np.prod(ici_shape) * np.prod(dcn_shape))
    if need > len(devices):
        raise ValueError(f"mesh needs {need} devices, have {len(devices)}")
    from jax.experimental import mesh_utils

    if _num_slices(devices) > 1:
        dmesh = mesh_utils.create_hybrid_device_mesh(
            ici_shape, dcn_shape, devices=devices)
        dmesh = dmesh.reshape(dcn_shape + ici_shape)
    else:  # single slice (or CPU test mesh): plain device mesh
        dmesh = np.asarray(devices[:need]).reshape(dcn_shape + ici_shape)
    shape = dict(zip(names, dcn_shape + ici_shape))
    return Mesh(dmesh.reshape(tuple(shape.values())), axis_names=tuple(shape))


def host_local_batch(global_batch: np.ndarray, mesh: Mesh, axis: str = "dp"):
    """Assemble a global batch array from per-process host data.

    Each process passes ITS slice of the global batch (data loaders shard
    by jax.process_index()); the result is one jax.Array sharded over
    `axis` that any pjit program consumes directly — the TPU-native
    replacement for a distributed data loader's scatter."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(global_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, global_batch)


def process_batch_slice(n_global: int, axis_size: Optional[int] = None) -> slice:
    """Row range of the global batch this process should load.

    Standard contract: the global batch divides evenly over processes in
    process_index order."""
    pc, pi = jax.process_count(), jax.process_index()
    if n_global % pc:
        raise ValueError(f"global batch {n_global} not divisible by {pc} processes")
    per = n_global // pc
    return slice(pi * per, (pi + 1) * per)
