"""TPU-native graph layout: dst-sorted static-shape edge arrays + CSR pointers.

The reference keeps edges as an unsorted [2, E] torch tensor and relies on CUDA
atomic scatter (`train_gat_custom.py:86-92`). On TPU we instead fix the layout
once at build time so every downstream op is regular:

  - edges sorted by destination (then source) -> segment ops see contiguous
    segments, Pallas kernels can walk CSR row ranges;
  - edge count padded to a static multiple, padding edges point at a sentinel
    node id == n_nodes whose contributions land in a throwaway segment;
  - CSR `row_ptr` over destinations for kernel-side segment bookkeeping.

Node id convention matches `build_edge_index` (`train_gat_custom.py:166-177`):
users occupy [0, n_users), items occupy [n_users, n_users + n_items).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Graph:
    """Static-shape directed graph. Arrays may be numpy (host) or jax (device).

    `chunk_base`/`c_max`/`tile_nb`/`tile_eb` are the Pallas attention-kernel
    tiling: for destination-node tile t (covering nodes [t*NB, (t+1)*NB)),
    the tile's incoming edges live in EB-sized edge chunks starting at chunk
    index chunk_base[t]; every tile needs at most c_max chunks. Built by
    `with_tiling` on the host (requires numpy row_ptr)."""

    src: jax.Array  # int32 [E_pad], dst-sorted, padding = n_nodes
    dst: jax.Array  # int32 [E_pad]
    weight: jax.Array  # float32 [E_pad], padding = 0
    row_ptr: jax.Array  # int32 [n_nodes + 2] CSR over dst (last segment = padding)
    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))  # valid (unpadded) count
    chunk_base: jax.Array | None = dataclasses.field(default=None)
    c_max: int = dataclasses.field(default=0, metadata=dict(static=True))
    tile_nb: int = dataclasses.field(default=0, metadata=dict(static=True))
    tile_eb: int = dataclasses.field(default=0, metadata=dict(static=True))
    layout: "AttentionLayout | None" = dataclasses.field(default=None)

    @property
    def n_padded(self) -> int:
        return int(self.src.shape[0])

    def to_device(self) -> "Graph":
        return dataclasses.replace(
            self,
            src=jnp.asarray(self.src),
            dst=jnp.asarray(self.dst),
            weight=jnp.asarray(self.weight),
            row_ptr=jnp.asarray(self.row_ptr),
            chunk_base=None if self.chunk_base is None else jnp.asarray(self.chunk_base),
            layout=None if self.layout is None else self.layout.to_device(),
        )

    def with_layout(self, nb: int = 256, eb: int = 1024) -> "Graph":
        """Attach the tile-aligned AttentionLayout (forward + transpose)."""
        real_src = np.asarray(self.src)[: self.n_edges].astype(np.int64)
        real_dst = np.asarray(self.dst)[: self.n_edges].astype(np.int64)
        n = self.n_nodes

        dst_al, src_al, pos_f, tile_of, is_last = _aligned_edge_layout(real_dst, real_src, n, nb, eb)
        t_src_key, t_other, pos_t, t_tile_of, t_is_last = _aligned_edge_layout(real_src, real_dst, n, nb, eb)

        e_al = len(dst_al)
        fwd_pos_of_orig = np.empty(self.n_edges, dtype=np.int64)
        m = pos_f >= 0
        fwd_pos_of_orig[pos_f[m]] = np.flatnonzero(m)
        t_perm = np.full(len(t_src_key), e_al, dtype=np.int32)  # pad -> zero row at E_al
        mt = pos_t >= 0
        t_perm[mt] = fwd_pos_of_orig[pos_t[mt]].astype(np.int32)

        n_tiles = (n + 1 + nb - 1) // nb
        pos_canon = np.where(pos_f >= 0, pos_f, self.n_edges).astype(np.int32)
        layout = AttentionLayout(
            src=src_al,
            dst=dst_al,
            pos=pos_canon,
            tile_of=tile_of,
            is_last=is_last,
            t_dst=t_src_key,  # transpose's destination = original source
            t_src=t_other,  # transpose's source = original destination
            t_pos=np.where(pos_t >= 0, pos_t, self.n_edges).astype(np.int32),
            t_perm=t_perm,
            t_tile_of=t_tile_of,
            t_is_last=t_is_last,
            nb=int(nb),
            eb=int(eb),
            n_tiles=int(n_tiles),
        )
        return dataclasses.replace(self, layout=layout)

    def with_tiling(self, nb: int = 256, eb: int = 1024) -> "Graph":
        """Attach Pallas attention tiling metadata (host-side, numpy row_ptr)."""
        rp = np.asarray(self.row_ptr)
        e_pad = self.n_padded
        if e_pad % eb != 0:
            raise ValueError(f"padded edge count {e_pad} must be a multiple of eb={eb}")
        n_tiles = (self.n_nodes + 1 + nb - 1) // nb
        # edge range of tile t: [rp[min(t*nb, len-1)], rp[min((t+1)*nb, len-1)])
        starts = rp[np.minimum(np.arange(n_tiles) * nb, len(rp) - 1)]
        ends = rp[np.minimum((np.arange(n_tiles) + 1) * nb, len(rp) - 1)].copy()
        # the tile containing the sentinel row also owns the padding edges
        ends[-1] = e_pad
        cb = starts // eb
        c_end = np.maximum((ends + eb - 1) // eb, cb)  # exclusive chunk end
        c_max = int(np.max(c_end - cb)) if n_tiles else 1
        c_max = max(c_max, 1)
        return dataclasses.replace(
            self,
            chunk_base=cb.astype(np.int32),
            c_max=c_max,
            tile_nb=int(nb),
            tile_eb=int(eb),
        )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AttentionLayout:
    """Tile-aligned edge layout for the fused attention kernels.

    Edges are laid out so each destination-node tile's edge range starts on an
    edge-chunk boundary (per-tile sentinel padding) — every chunk belongs to
    exactly ONE tile, so the kernel grid is a flat list of chunks with no
    skew waste, no shared-chunk re-reads, and exact per-chunk outputs (needed
    by the backward, which writes d(hs) chunk blocks). A mirrored layout over
    the TRANSPOSE graph (sorted by source) drives the backward's scatter of
    edge gradients into nodes, with `t_perm` mapping transpose-aligned edge
    positions to forward-aligned positions.
    """

    # forward (dst-sorted, tile-aligned)
    src: jax.Array  # int32 [E_al]
    dst: jax.Array  # int32 [E_al]
    pos: jax.Array  # int32 [E_al] canonical edge index (pad -> n_edges)
    tile_of: jax.Array  # int32 [C] tile index per chunk
    is_last: jax.Array  # int32 [C] 1 if last chunk of its tile
    # transpose (src-sorted, tile-aligned) for the backward scatter
    t_dst: jax.Array  # int32 [E_al_t] (= original src, sorted)
    t_src: jax.Array  # int32 [E_al_t] (= original dst; pad -> n_nodes sentinel)
    t_pos: jax.Array  # int32 [E_al_t] canonical edge index (pad -> n_edges)
    t_perm: jax.Array  # int32 [E_al_t] -> forward-aligned position (pad -> E_al, a zero row)
    t_tile_of: jax.Array  # int32 [C_t]
    t_is_last: jax.Array  # int32 [C_t]
    nb: int = dataclasses.field(metadata=dict(static=True))
    eb: int = dataclasses.field(metadata=dict(static=True))
    n_tiles: int = dataclasses.field(metadata=dict(static=True))
    # multi-shard stacks only (parallel/spmd.shard_layout_by_tiles): the tile
    # partition bounds [b_0..b_n], shard d owning tiles [b_d, b_{d+1}) — the
    # gather-overlay combine needs true ownership (every shard's local chunk
    # list covers ALL tiles, so tile_of can't recover it)
    tile_bounds: tuple = dataclasses.field(default=(), metadata=dict(static=True))

    @property
    def n_chunks(self) -> int:
        return int(self.tile_of.shape[0])

    @property
    def n_chunks_t(self) -> int:
        return int(self.t_tile_of.shape[0])

    @property
    def e_aligned(self) -> int:
        return int(self.src.shape[0])

    def to_device(self) -> "AttentionLayout":
        return dataclasses.replace(
            self,
            **{
                f: jnp.asarray(getattr(self, f))
                for f in ("src", "dst", "pos", "tile_of", "is_last", "t_dst", "t_src", "t_pos", "t_perm", "t_tile_of", "t_is_last")
            },
        )


def _aligned_edge_layout(sort_key: np.ndarray, other: np.ndarray, n_nodes: int, nb: int, eb: int):
    """Core aligned-layout builder. sort_key drives the tiling (dst for the
    forward layout, src for the transpose). Returns (key_al, other_al,
    pos_al [E_al] original-edge-position or -1 for padding, tile_of, is_last)."""
    order = np.lexsort((other, sort_key))
    sk, ot = sort_key[order], other[order]
    n_tiles = (n_nodes + 1 + nb - 1) // nb

    counts = np.bincount(np.minimum(sk // nb, n_tiles - 1), minlength=n_tiles)
    chunks_per_tile = np.maximum((counts + eb - 1) // eb, 1)
    starts_al = np.zeros(n_tiles + 1, dtype=np.int64)
    np.cumsum(chunks_per_tile * eb, out=starts_al[1:])
    e_al = int(starts_al[-1])

    key_al = np.full(e_al, n_nodes, dtype=np.int32)
    other_al = np.full(e_al, n_nodes, dtype=np.int32)
    pos_al = np.full(e_al, -1, dtype=np.int64)
    # scatter each tile's sorted edges to its aligned start
    tile_begin = np.zeros(n_tiles + 1, dtype=np.int64)
    np.cumsum(counts, out=tile_begin[1:])
    idx_within = np.arange(len(sk)) - np.repeat(tile_begin[:-1], counts)
    dest = np.repeat(starts_al[:-1], counts) + idx_within
    key_al[dest] = sk
    other_al[dest] = ot
    pos_al[dest] = order

    tile_of = np.repeat(np.arange(n_tiles, dtype=np.int32), chunks_per_tile)
    last_chunk = np.cumsum(chunks_per_tile) - 1
    is_last = np.zeros(len(tile_of), dtype=np.int32)
    is_last[last_chunk] = 1
    return key_al, other_al, pos_al, tile_of, is_last


def build_graph(
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    weight: np.ndarray | None = None,
    pad_multiple: int = 1024,
) -> Graph:
    """Sort edges by (dst, src), pad to a static multiple, build CSR row_ptr.
    Uses the native O(E) counting-sort builder (plotpointe_tpu.native) with a
    numpy lexsort fallback."""
    from plotpointe_tpu import native

    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    e = len(src)
    e_pad = max(_round_up(e, pad_multiple), pad_multiple)
    out_src, out_dst, out_w, row_ptr = native.build_csr(src, dst, weight, n_nodes, e_pad)
    return Graph(src=out_src, dst=out_dst, weight=out_w, row_ptr=row_ptr, n_nodes=n_nodes, n_edges=e)


def build_bipartite_graph(
    train_u: np.ndarray,
    train_i: np.ndarray,
    n_users: int,
    n_items: int,
    weight: np.ndarray | None = None,
    pad_multiple: int = 1024,
) -> Graph:
    """Symmetric user<->item graph in the unified node space
    (semantics of train_gat_custom.py:166-177: u -> n_users+i and back)."""
    ui_src = np.asarray(train_u, dtype=np.int64)
    ui_dst = np.asarray(train_i, dtype=np.int64) + n_users
    src = np.concatenate([ui_src, ui_dst])
    dst = np.concatenate([ui_dst, ui_src])
    w = None
    if weight is not None:
        w = np.concatenate([weight, weight]).astype(np.float32)
    return build_graph(src, dst, n_users + n_items, weight=w, pad_multiple=pad_multiple)


def degrees(graph: Graph) -> np.ndarray:
    """In-degree per real node (padding segment excluded)."""
    rp = np.asarray(graph.row_ptr)
    return (rp[1 : graph.n_nodes + 1] - rp[: graph.n_nodes]).astype(np.int64)


def symmetric_normalized_weights(graph: Graph) -> np.ndarray:
    """LightGCN-style D^{-1/2} A D^{-1/2} edge values over the dst-sorted layout
    (semantics of scripts/train_lightgcn.py:130-157, but vectorized)."""
    src = np.asarray(graph.src)
    dst = np.asarray(graph.dst)
    deg = np.bincount(dst[: graph.n_edges], minlength=graph.n_nodes + 1).astype(np.float32)
    deg = np.clip(deg, 1.0, None)
    vals = 1.0 / np.sqrt(deg[src] * deg[dst])
    vals[graph.n_edges :] = 0.0
    return vals.astype(np.float32)
