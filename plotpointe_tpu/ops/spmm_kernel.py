"""Pallas CSR SpMM over the tile-aligned layout.

LightGCN propagation (`scripts/train_lightgcn.py:64-76`: cuSPARSE
torch.sparse.mm of a 255k x 255k, nnz~3.4M matrix) as a streaming weighted
one-hot MXU reduction: y[d] = sum_{(s->d)} v_e * x[s]. Same machinery as the
attention kernels — one bf16 row gather of x[src] in aligned edge order, then
per-chunk `acc += W @ xs` with W the value-weighted incidence block.
Linear in (values, x), so autodiff gets a custom transpose for free via the
XLA reference (jax.linear_transpose through ops.segment.spmm).
"""
from __future__ import annotations

import functools

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


def spmm_pallas(graph: Graph, values: jax.Array, x: jax.Array, xs_dtype=jnp.bfloat16) -> jax.Array:
    """y[d] = sum over incoming edges of values_e * x[src_e]; [N, F] -> [N, F].
    `values` in canonical (dst,src)-sorted edge order, like ops.segment.spmm."""
    L = graph.layout
    if L is None:
        raise ValueError("graph needs the aligned layout: call graph.with_layout()")
    n = graph.n_nodes
    d = x.shape[1]
    if d % 128 != 0:
        return _seg.spmm(graph, values, x)

    @jax.custom_vjp
    def op(values, x):
        xp = jnp.concatenate([x, jnp.zeros((1, d), x.dtype)], axis=0)
        xs = xp[L.src].astype(xs_dtype)
        vpad = jnp.concatenate([values[: graph.n_edges], jnp.zeros((1,), values.dtype)])
        v_al = vpad[jnp.minimum(L.pos, graph.n_edges)]
        w2 = v_al.astype(jnp.float32).reshape(-1, 128)
        dst2 = L.dst.reshape(-1, 128)
        out = _wreduce_call(xs, w2, dst2, L.tile_of, L.is_last, L.nb, L.eb, L.n_tiles, L.n_chunks)
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
