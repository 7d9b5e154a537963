"""Multi-host (multi-process) execution: bootstrap + global-array placement.

The BASELINE.json north star is a multi-host v5p slice — same program on every
host, ICI collectives within a slice, DCN across hosts. JAX's model for that
is: each host process calls `jax.distributed.initialize`, after which
`jax.devices()` is the GLOBAL device list and one `Mesh` spans all hosts; data
each host loads locally becomes part of one global `jax.Array` via
`jax.make_array_from_process_local_data`. This module wraps both steps so the
rest of the framework (ShardedTrainer, the SPMD steps) is process-count
agnostic: every helper degrades to plain `device_put` in a single process.

Bootstrap is env/flag driven (the TPU-VM pattern: the same script launched on
every host of the slice):

    PLOTPOINTE_COORDINATOR=host0:12345   # coordinator address
    PLOTPOINTE_NUM_PROCESSES=2
    PLOTPOINTE_PROCESS_ID=0              # unique per host

On Cloud TPU pods these are auto-detected (initialize() with no args); the env
vars are for CPU simulation and bare-metal DCN runs. Tested without a pod by
tests/test_multihost.py: 2 processes x 4 virtual CPU devices each, collectives
over the distributed runtime — the DCN-style split the driver cannot give us
in hardware.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def maybe_initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Call jax.distributed.initialize from args or PLOTPOINTE_* env vars.
    Returns True when running multi-process. Idempotent; no-ops when neither
    args nor env are set (single-process mode)."""
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    coordinator = coordinator or os.environ.get("PLOTPOINTE_COORDINATOR")
    if coordinator is None:
        return False
    num_processes = int(num_processes or os.environ.get("PLOTPOINTE_NUM_PROCESSES", "1"))
    process_id = int(process_id if process_id is not None
                     else os.environ.get("PLOTPOINTE_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    return num_processes > 1


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def put_sharded(data: np.ndarray, mesh: Mesh, spec: P) -> jax.Array:
    """Place a GLOBAL host array onto the mesh with `spec`.

    Single-process: plain device_put. Multi-process: each process slices out
    its own rows and contributes them via make_array_from_process_local_data —
    the per-host data-loading story (each host only needs to materialize its
    slice; here callers hold the full array, so we slice locally)."""
    sharding = NamedSharding(mesh, spec)
    if not is_multiprocess():
        return jax.device_put(data, sharding)
    if spec == P() or all(a is None for a in spec):
        return jax.make_array_from_process_local_data(sharding, np.asarray(data))
    sharded_dims = [d for d, a in enumerate(spec) if a is not None]
    if len(sharded_dims) != 1:
        raise NotImplementedError(f"put_sharded supports one sharded dim, got {spec}")
    dim = sharded_dims[0]
    # local slice of the sharded dim (the only sharded layouts the framework
    # uses for host-loaded arrays: tables / edge lists / batches on dim 0,
    # per-layer dropout masks on dim 1)
    lo, n = process_slice(data.shape[dim], mesh, P(spec[dim]))
    idx = [slice(None)] * data.ndim
    idx[dim] = slice(lo, lo + n)
    return jax.make_array_from_process_local_data(sharding, np.asarray(data[tuple(idx)]))


def put_replicated(data, mesh: Mesh) -> jax.Array:
    return put_sharded(np.asarray(data), mesh, P())


def process_slice(n_rows: int, mesh: Mesh, spec: P) -> tuple:
    """(offset, length) of this process's contiguous dim-0 rows under `spec`.
    Assumes dim 0 maps to mesh axes whose device order follows process order
    (true for make_mesh over jax.devices())."""
    axes = spec[0]
    if axes is None:
        return 0, n_rows
    if isinstance(axes, str):
        axes = (axes,)
    n_shards = 1
    for a in axes:
        n_shards *= int(mesh.shape[a])
    if n_rows % n_shards:
        raise ValueError(f"rows ({n_rows}) must divide shards ({n_shards})")
    mesh_devs = list(mesh.devices.reshape(-1))
    if n_shards != len(mesh_devs):
        raise NotImplementedError(
            "process_slice assumes dim 0 is sharded over the whole mesh "
            "(the framework's 1-D 'data' meshes)")
    per_shard = n_rows // n_shards
    # shard i lives on flat device i; this process's devices are contiguous
    # for make_mesh over jax.devices()
    mine = [i for i, d in enumerate(mesh_devs) if d.process_index == jax.process_index()]
    if mine != list(range(min(mine), min(mine) + len(mine))):
        raise NotImplementedError("non-contiguous process device blocks")
    return min(mine) * per_shard, len(mine) * per_shard


def host_gather(x: jax.Array) -> np.ndarray:
    """Fetch a (possibly cross-host-sharded) array to EVERY host as numpy.
    Single-process: np.asarray. Multi-process: process_allgather."""
    if not is_multiprocess():
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
