"""Row-sharded embedding tables with collective ID/embedding exchange.

TPU-native replacement for the reference's CUDA `nn.Embedding` lookups
(`scripts/train_gat_custom.py:100`, `scripts/train_lightgcn.py:56-57`, via
SURVEY.md section 2.2): the user (192k x d) and item (498k x d) tables are
sharded by row across the mesh's data axis so per-chip HBM holds 1/n of the
table, and lookups exchange ids/rows with XLA collectives over ICI instead of
pointer-chasing one device's memory.

Two exchange schemes, both exact:

  - replicated-batch lookup (`lookup_replicated`): every device sees the full
    id batch; each masks-and-gathers the rows it owns and one `psum` combines
    them. Cost: one [B, d] all-reduce.
  - sharded-batch lookup (`lookup_batch_sharded`): ids arrive batch-sharded
    [B/n]; an `all_gather` of the (tiny, int32) id vector + local masked
    gather + `psum_scatter` returns rows for the local batch shard only.
    all_gather-then-reduce_scatter is the standard TPU ring decomposition of
    the all-to-all id/embedding exchange, with no ragged routing — static
    shapes keep everything one XLA trace.

Ids are deliberately NOT deduplicated before the exchange: dedup requires
data-dependent shapes (`jnp.unique`) which break the compile-once model, and
the masked gather is already a dense contraction XLA lays out well; at the
batch sizes here (hundreds of k rows max) the exchange is ICI-trivial next to
the propagation/attention matmuls.

Gradients need no extra code and no extra communication pattern: inside
`shard_map`, autodiff transposes the masked local gather into a masked
scatter-add onto the owning shard, `psum` into identity, and tiled
`all_gather` into `psum_scatter` — so each device receives exactly its own
rows' gradients, already reduced.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def shard_size(n_rows: int, n_shards: int) -> int:
    """Rows per shard after padding to an even split."""
    return (n_rows + n_shards - 1) // n_shards


def padded_rows(n_rows: int, n_shards: int) -> int:
    return shard_size(n_rows, n_shards) * n_shards


def pad_table(table: jax.Array | np.ndarray, n_shards: int) -> jax.Array:
    """Zero-pad dim 0 so the row count divides n_shards evenly."""
    n = table.shape[0]
    target = padded_rows(n, n_shards)
    if target == n:
        return jnp.asarray(table)
    pad = jnp.zeros((target - n,) + tuple(table.shape[1:]), table.dtype)
    return jnp.concatenate([jnp.asarray(table), pad], axis=0)


def device_put_row_sharded(table: jax.Array | np.ndarray, mesh: Mesh, axis: str = "data") -> jax.Array:
    """Pad + place a table with rows sharded over `axis` (1/n per device HBM)."""
    t = pad_table(table, int(mesh.shape[axis]))
    return jax.device_put(t, NamedSharding(mesh, P(axis)))


def local_lookup(table_l: jax.Array, ids: jax.Array, rows_per_shard: int, axis: str) -> jax.Array:
    """This device's contribution to a lookup: rows it owns, zeros elsewhere.

    For use INSIDE a shard_map body. table_l: [rs, d] local shard; ids: [B]
    global row ids (identical on every device). Caller combines with `psum`.
    """
    s = jax.lax.axis_index(axis)
    loc = ids - s * rows_per_shard
    hit = (loc >= 0) & (loc < rows_per_shard)
    rows = table_l[jnp.clip(loc, 0, rows_per_shard - 1)]
    return jnp.where(hit[:, None], rows, jnp.zeros_like(rows))


def lookup_replicated(mesh: Mesh, table: jax.Array, ids: jax.Array, axis: str = "data") -> jax.Array:
    """table rows sharded over `axis`, ids replicated -> [B, d] replicated."""
    n_shards = int(mesh.shape[axis])
    rs = table.shape[0] // n_shards

    @functools.partial(shard_map, mesh=mesh, in_specs=(P(axis), P()), out_specs=P())
    def f(table_l, ids):
        return jax.lax.psum(local_lookup(table_l, ids, rs, axis), axis)

    return f(table, ids)


def lookup_batch_sharded(mesh: Mesh, table: jax.Array, ids: jax.Array, axis: str = "data") -> jax.Array:
    """table rows sharded, ids batch-sharded -> [B, d] batch-sharded.

    The all-to-all exchange: all_gather the int32 ids (B*4 bytes), gather the
    locally-owned rows densely, psum_scatter the [B, d] partials so each
    device keeps only its batch shard's rows.
    """
    n_shards = int(mesh.shape[axis])
    rs = table.shape[0] // n_shards

    @functools.partial(shard_map, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(axis))
    def f(table_l, ids_l):
        ids_all = jax.lax.all_gather(ids_l, axis, tiled=True)  # [B]
        rows = local_lookup(table_l, ids_all, rs, axis)  # [B, d] partial
        return jax.lax.psum_scatter(rows, axis, scatter_dimension=0, tiled=True)

    return f(table, ids)
