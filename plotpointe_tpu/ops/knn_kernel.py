"""Pallas TPU kernel: fused blocked cosine-kNN — the graph-construction hot op.

Replaces the XLA path in graphs/knn.py (`_knn_blocks`: per-row-block
[BR, N] similarity matrix materialized in HBM + hierarchical lax.top_k) with
a single streaming kernel: a 2-D grid over (row blocks x column blocks) where
each step computes one [BR, BC] similarity tile on the MXU (f32) and folds it
into a running per-row top-k kept in VMEM scratch across the column sweep.
The [BR, N] score strip never leaves VMEM and the feature matrix is read at
HBM bandwidth — selection cost is K rounds of (max, argmax-via-onehot, mask)
per tile, the same scheme as ops/topk_kernel.py.

This is the TPU-shaped replacement for the reference's CPU sklearn
cosine_similarity + argpartition build (`graphs/build_ii_knn.py:54-99`,
100.40 s at 63,001 x 384 on n1-highmem-8).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_PAD = 128  # running top-K lane width
NEG_INF = -1e30


def merge_topk(cand_v: jax.Array, cand_i: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """K rounds of (max, argmax-via-onehot, mask) over [B, W] candidates.
    Returns ([B, K_PAD] values desc-sorted in lanes 0..k-1, [B, K_PAD] ids).
    Pure jnp — usable inside Pallas kernels and in plain XLA."""
    b, width = cand_v.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (b, K_PAD), 1)
    new_v = jnp.full((b, K_PAD), NEG_INF, jnp.float32)
    new_i = jnp.zeros((b, K_PAD), jnp.int32)
    for kk in range(k):
        m = jnp.max(cand_v, axis=1, keepdims=True)  # [B, 1]
        am = jnp.argmax(cand_v, axis=1)[:, None]  # [B, 1]
        onehot = pos == am
        sel_i = jnp.sum(jnp.where(onehot, cand_i, 0), axis=1)  # [B]
        new_v = jnp.where(kcol == kk, m, new_v)
        new_i = jnp.where(kcol == kk, sel_i[:, None], new_i)
        cand_v = jnp.where(onehot, NEG_INF, cand_v)
    return new_v, new_i


def _knn_kernel(br: int, bc: int, k: int, n: int):
    def kernel(xr_ref, xc_ref, out_v_ref, out_i_ref, run_v, run_i):
        r = pl.program_id(0)
        c = pl.program_id(1)
        n_cols = pl.num_programs(1)

        @pl.when(c == 0)
        def _():
            run_v[:] = jnp.full((br, K_PAD), NEG_INF, jnp.float32)
            run_i[:] = jnp.zeros((br, K_PAD), jnp.int32)

        # HIGHEST precision (multi-pass bf16 = f32-faithful): graph
        # construction must not lose neighbours to bf16 MXU rounding (same
        # rationale as knn.py Precision.HIGH on the XLA path; Mosaic's default
        # f32 dot is lower-precision)
        scores = jnp.dot(xr_ref[:], xc_ref[:].T, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)  # [BR, BC]
        row_g = jax.lax.broadcasted_iota(jnp.int32, (br, bc), 0) + r * br
        col_g = jax.lax.broadcasted_iota(jnp.int32, (br, bc), 1) + c * bc
        scores = jnp.where(col_g == row_g, NEG_INF, scores)  # exclude self
        scores = jnp.where(col_g < n, scores, NEG_INF)  # mask padding columns

        cand_v = jnp.concatenate([run_v[:], scores], axis=1)
        cand_i = jnp.concatenate([run_i[:], col_g], axis=1)
        nv, ni = merge_topk(cand_v, cand_i, k)
        run_v[:] = nv
        run_i[:] = ni

        @pl.when(c == n_cols - 1)
        def _():
            out_v_ref[:] = run_v[:]
            out_i_ref[:] = run_i[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "block_rows", "block_cols"))
def knn_topk_pallas(
    xn: jax.Array, k: int, block_rows: int = 256, block_cols: int = 2048
) -> Tuple[jax.Array, jax.Array]:
    """Streaming top-k cosine neighbours. xn: [N, d] L2-normalized rows.
    Returns (idx [N, k] int32, sim [N, k] f32) with self excluded, rows
    desc-sorted. Pads internally; padding never appears as a neighbour."""
    n, d = xn.shape
    assert k <= K_PAD
    n_pad_r = ((n + block_rows - 1) // block_rows) * block_rows
    n_pad_c = ((n + block_cols - 1) // block_cols) * block_cols
    n_pad = max(n_pad_r, n_pad_c)
    # one padded copy serves both the row and column streams
    n_pad = ((n_pad + block_cols - 1) // block_cols) * block_cols
    n_pad = ((n_pad + block_rows - 1) // block_rows) * block_rows
    if n_pad != n:
        xn = jnp.concatenate([xn, jnp.zeros((n_pad - n, d), xn.dtype)], axis=0)
    grid = (n_pad // block_rows, n_pad // block_cols)

    out_v, out_i = pl.pallas_call(
        _knn_kernel(block_rows, block_cols, k, n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda r, c: (r, 0)),
            pl.BlockSpec((block_cols, d), lambda r, c: (c, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, K_PAD), lambda r, c: (r, 0)),
            pl.BlockSpec((block_rows, K_PAD), lambda r, c: (r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, K_PAD), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, K_PAD), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_rows, K_PAD), jnp.float32),
            pltpu.VMEM((block_rows, K_PAD), jnp.int32),
        ],
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_pad * d,
            bytes_accessed=n_pad * d * 4 * (1 + grid[0]),
            transcendentals=0,
        ),
    )(xn, xn)
    return out_i[:n, :k], out_v[:n, :k]
