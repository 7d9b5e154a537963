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
    """Pad + place a table with rows sharded over `axis` (1/n per device HBM).
    Multi-process safe: when the mesh spans hosts, each process contributes
    only its local rows (parallel/multihost.py)."""
    from plotpointe_tpu.parallel.multihost import is_multiprocess, put_sharded

    t = pad_table(table, int(mesh.shape[axis]))
    if is_multiprocess():
        return put_sharded(np.asarray(t), mesh, P(axis))
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


SENTINEL_ID = jnp.int32(2**31 - 1)


def dedup_ids(ids: jax.Array, capacity: int) -> jax.Array:
    """Static-shape in-batch dedup: sorted unique ids first, SENTINEL_ID fill.

    `capacity` bounds how many distinct ids survive (overflow beyond it is
    dropped — callers size capacity to the worst case they tolerate; the
    default in lookup_batch_dedup is len(ids), which never overflows)."""
    s = jnp.sort(ids)
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    u = jnp.where(first, s, SENTINEL_ID)
    return jnp.sort(u)[:capacity]


def lookup_batch_dedup(
    mesh: Mesh,
    table: jax.Array,
    ids: jax.Array,
    axis: str = "data",
    unique_capacity: int | None = None,
) -> jax.Array:
    """Deduplicated all-to-all lookup: rows sharded, ids batch-sharded ->
    [B, d] batch-sharded (SURVEY section 2.3 hard part #2).

    Each device dedups its local id batch (static-shape sort/mask compaction,
    capacity `unique_capacity`, default Bl = B/n), exchanges ONLY the unique
    ids (all_gather of n*U int32s), gathers the rows it owns, and
    psum_scatter returns each device its own unique rows fully reduced; local
    duplicates then resolve with an on-chip searchsorted — no row crosses ICI
    twice for the same id.

    Per-chip traffic accounting (ring collectives, d-wide f32 rows):
      - ids:  all_gather of [n, U] int32  ~= 4*n*U bytes
      - rows: psum_scatter of [n*U, d]    ~= 4*n*U*d bytes out,
              the caller's own [U, d] back
      both proportional to the (deduplicated) BATCH, independent of table
      size — vs the full-table all_gather (4*rows*d bytes/chip/step) this
      replaces. Backward transposes to all_gather([U, d]) + local scatter-add
      into the owning shard: same O(batch) traffic.

    Replaces the reference's single-GPU nn.Embedding lookup
    (scripts/train_gat_custom.py:100) at catalogs too big for one chip's HBM.
    """
    n_shards = int(mesh.shape[axis])
    rs = table.shape[0] // n_shards
    bl = ids.shape[0] // n_shards
    cap = bl if unique_capacity is None else min(unique_capacity, bl)

    @functools.partial(shard_map, mesh=mesh, in_specs=(P(axis), P(axis)), out_specs=P(axis))
    def f(table_l, ids_l):
        u = dedup_ids(ids_l, cap)  # [U] sorted, sentinel-padded
        u_all = jax.lax.all_gather(u, axis, tiled=True)  # [n*U] int32
        rows = local_lookup(table_l, jnp.minimum(u_all, table_l.shape[0] * n_shards - 1), rs, axis)
        rows = jnp.where((u_all < SENTINEL_ID)[:, None], rows, 0.0)
        mine = jax.lax.psum_scatter(rows, axis, scatter_dimension=0, tiled=True)  # [U, d]
        # resolve local duplicates: u is sorted, so searchsorted finds each
        # id's unique slot; ids past capacity (overflow) read zeros
        pos = jnp.searchsorted(u, ids_l)
        pos = jnp.clip(pos, 0, cap - 1)
        out = mine[pos]
        ok = u[pos] == ids_l
        return jnp.where(ok[:, None], out, 0.0)

    return f(table, ids)
