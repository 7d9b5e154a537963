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
        )

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
