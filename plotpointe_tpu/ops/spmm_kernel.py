"""Pallas CSR SpMM over the tile-aligned layout.

LightGCN propagation (`scripts/train_lightgcn.py:64-76`: cuSPARSE
torch.sparse.mm of a 255k x 255k, nnz~3.4M matrix) as a streaming weighted
one-hot MXU reduction: y[d] = sum_{(s->d)} v_e * x[s].

Perf notes (measured on TPU v5e, Amazon scale 3.4M nnz x 128d):
  - the hot cost is the per-edge row gather, NOT the one-hot matmul: casting
    x to bf16 BEFORE the gather (256B rows) runs ~4.5x faster than gathering
    f32 rows and casting after — XLA's fused gather+convert falls off the
    fast path;
  - the per-edge VALUE gather (4M random scalars) costs more than the whole
    kernel, so `make_spmm` pre-aligns the edge weights ONCE on the host
    (LightGCN's normalized adjacency is static across training);
  - backward w.r.t. x is the same kernel over the TRANSPOSE layout (swap
    src/dst roles) — no XLA scatter fallback in the training path.
"""
from __future__ import annotations

import functools
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from plotpointe_tpu.graphs.csr import Graph
from plotpointe_tpu.ops import segment as _seg


def _wreduce_kernel(nb: int, eb: int, d: int):
    def kernel(tile_of, is_last, xs_ref, w_ref, d_ref, out_ref, acc):
        i = pl.program_id(0)
        t = tile_of[i]
        prev = tile_of[jnp.maximum(i - 1, 0)]

        @pl.when(jnp.logical_or(i == 0, t != prev))
        def _():
            acc[:] = jnp.zeros_like(acc)

        dst = d_ref[:].reshape(1, eb)
        w = w_ref[:].reshape(1, eb)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0) + t * nb
        W = jnp.where(rows == dst, w, 0.0)
        acc[:] += jnp.dot(W, xs_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)

        @pl.when(is_last[i] == 1)
        def _():
            out_ref[:] = acc[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "eb", "n_tiles", "n_chunks"))
def _wreduce_call(xs, w2, dst2, tile_of, is_last, nb, eb, n_tiles, n_chunks):
    d = xs.shape[1]
    sub = eb // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((eb, d), lambda i, to, il: (i, 0)),
            pl.BlockSpec((sub, 128), lambda i, to, il: (i, 0)),
            pl.BlockSpec((sub, 128), lambda i, to, il: (i, 0)),
        ],
        out_specs=pl.BlockSpec((nb, d), lambda i, to, il: (to[i], 0)),
        scratch_shapes=[pltpu.VMEM((nb, d), jnp.float32)],
    )
    return pl.pallas_call(
        _wreduce_kernel(nb, eb, d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * nb, d), jnp.float32),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_chunks * nb * eb * d,
            bytes_accessed=n_chunks * eb * d * xs.dtype.itemsize + n_tiles * nb * d * 4,
            transcendentals=0,
        ),
    )(tile_of, is_last, xs, w2, dst2)


def _round_up_128(d: int) -> int:
    return ((d + 127) // 128) * 128


def _gather_rows(x, idx, n_rows, dtype):
    """Sentinel-pad x to n_rows+1 rows, cast FIRST, then gather (fast path)."""
    xp = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    return xp.astype(dtype)[idx]


def _pad_cols(x, d_al):
    """Zero-pad the feature dim to the lane-aligned width (no-op if aligned)."""
    d = x.shape[1]
    return x if d == d_al else jnp.pad(x, ((0, 0), (0, d_al - d)))


def _host_aligned_values(graph: Graph, values: np.ndarray):
    """Pre-align edge values to the forward AND transpose layouts (host, once).

    Returns (w2, w2_t, t_src) device arrays:
      w2   [E_al/128, 128]  values in forward (dst-sorted) aligned order
      w2_t [E_al_t/128,128] values in transpose (src-sorted) aligned order
      t_src [E_al_t]        ORIGINAL dst (= transpose's source) per t-position,
                            for gathering cotangent rows in the backward.
    """
    L = graph.layout
    v = np.asarray(values, dtype=np.float32)[: graph.n_edges]
    pos = np.asarray(L.pos).astype(np.int64)
    w_al = np.where(pos < graph.n_edges, v[np.minimum(pos, max(graph.n_edges - 1, 0))], 0.0).astype(np.float32)
    if graph.n_edges == 0:
        w_al[:] = 0.0

    # transpose order: t_perm maps t-positions -> forward positions (pad -> E_al)
    t_perm = np.asarray(L.t_perm).astype(np.int64)
    w_pad = np.concatenate([w_al, np.zeros(1, np.float32)])
    w_t = w_pad[np.minimum(t_perm, len(w_al))]
    dst_pad = np.concatenate([np.asarray(L.dst), np.asarray([graph.n_nodes], np.int32)])
    t_src = dst_pad[np.minimum(t_perm, len(w_al))].astype(np.int32)

    return (
        jnp.asarray(w_al.reshape(-1, 128)),
        jnp.asarray(w_t.reshape(-1, 128)),
        jnp.asarray(t_src),
    )


def make_spmm(graph: Graph, values, xs_dtype=jnp.bfloat16) -> Callable:
    """Build fn(x) -> y for a FIXED (graph, values) pair — the LightGCN
    propagation operator (values = normalized adjacency, static across
    training). Edge weights are host-aligned once; forward and backward both
    run the streaming one-hot kernel (backward over the transpose layout)."""
    L = graph.layout
    if L is None:
        raise ValueError("graph needs the aligned layout: call graph.with_layout()")
    n = graph.n_nodes
    w2, w2_t, t_src = _host_aligned_values(graph, values)
    dst2 = jnp.asarray(L.dst).reshape(-1, 128)
    tdst2 = jnp.asarray(L.t_dst).reshape(-1, 128)
    lay = {
        "tile_of": jnp.asarray(L.tile_of), "is_last": jnp.asarray(L.is_last),
        "t_tile_of": jnp.asarray(L.t_tile_of), "t_is_last": jnp.asarray(L.t_is_last),
        "src": jnp.asarray(L.src),
    }
    nb, eb, n_tiles = L.nb, L.eb, L.n_tiles
    n_chunks, n_chunks_t = L.n_chunks, L.n_chunks_t

    @jax.custom_vjp
    def op(x):
        d = x.shape[1]
        xs = _gather_rows(_pad_cols(x, _round_up_128(d)), lay["src"], n, xs_dtype)
        out = _wreduce_call(xs, w2, dst2, lay["tile_of"], lay["is_last"], nb, eb, n_tiles, n_chunks)
        return out[:n, :d]

    def op_fwd(x):
        return op(x), None

    def op_bwd(_, g):
        # dL/dx[s] = sum_{e: src_e = s} v_e * g[dst_e] — SpMM over the
        # transpose layout: gather cotangent rows at t_src, reduce per source
        # tile with the transpose chunk bookkeeping.
        d = g.shape[1]
        gs = _gather_rows(_pad_cols(g, _round_up_128(d)), t_src, n, xs_dtype)
        dx = _wreduce_call(gs, w2_t, tdst2, lay["t_tile_of"], lay["t_is_last"], nb, eb, n_tiles, n_chunks_t)
        return (dx[:n, :d],)

    op.defvjp(op_fwd, op_bwd)
    return op


def spmm_pallas(graph: Graph, values: jax.Array, x: jax.Array, xs_dtype=jnp.bfloat16) -> jax.Array:
    """y[d] = sum over incoming edges of values_e * x[src_e]; [N, F] -> [N, F].
    `values` in canonical (dst,src)-sorted edge order, like ops.segment.spmm.

    Generic (values traced) variant: aligns values per call on device. For the
    LightGCN training path prefer `make_spmm` (static values, aligned once)."""
    L = graph.layout
    if L is None:
        raise ValueError("graph needs the aligned layout: call graph.with_layout()")
    n = graph.n_nodes
    d = x.shape[1]
    if d % 128 != 0:
        return _seg.spmm(graph, values, x)

    @jax.custom_vjp
    def op(values, x):
        xs = _gather_rows(x, L.src, n, xs_dtype)
        vpad = jnp.concatenate([values[: graph.n_edges], jnp.zeros((1,), values.dtype)])
        v_al = vpad[jnp.minimum(L.pos, graph.n_edges)]
        w2 = v_al.astype(jnp.float32).reshape(-1, 128)
        out = _wreduce_call(xs, w2, L.dst.reshape(-1, 128), L.tile_of, L.is_last,
                            L.nb, L.eb, L.n_tiles, L.n_chunks)
        return out[:n]

    def op_fwd(values, x):
        return op(values, x), (values, x)

    def op_bwd(res, g):
        values, x = res
        # linear op: transpose via the XLA reference implementation
        _, vjp = jax.vjp(lambda v, xx: _seg.spmm(graph, v, xx), values, x)
        return vjp(g)

    op.defvjp(op_fwd, op_bwd)
    return op(values, x)
