"""Device mesh bootstrap.

The reference has no intra-job parallelism at all (SURVEY.md section 2.3); this
module is its TPU-native replacement: a named `jax.sharding.Mesh` over which
pjit/shard_map place the row-sharded embedding tables, edge-parallel message
passing and data-parallel scoring. Axis convention:

  "data"  — batch / edge-partition axis (ICI within a slice, DCN across hosts)
  "model" — reserved for tensor-sharding wide hidden dims (unused at 128d)
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_shape(spec: str) -> Dict[str, int]:
    """Parse "data:4,model:2" -> {"data": 4, "model": 2}."""
    out: Dict[str, int] = {}
    for part in spec.split(","):
        name, _, size = part.strip().partition(":")
        out[name] = int(size)
    return out


def make_mesh(
    shape: Optional[Dict[str, int] | str] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a named mesh. Default: 1-D "data" mesh over all local devices."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = {"data": len(devices)}
    elif isinstance(shape, str):
        shape = parse_mesh_shape(shape)
    sizes = list(shape.values())
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh shape {shape} needs {total} devices, have {len(devices)}")
    dev_array = np.array(devices[:total]).reshape(sizes)
    return Mesh(dev_array, tuple(shape.keys()))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (table rows / batch) across `axis`."""
    return NamedSharding(mesh, P(axis))
