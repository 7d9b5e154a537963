"""Pallas TPU kernel: fused MIPS top-K retrieval over a large item catalog.

Serving hot path (`serving/runtime.py:56-76` in the reference: full [N, d] @
[d] GEMV + argpartition on CPU). The kernel streams the item matrix through
VMEM in blocks, computes block scores on the MXU, and maintains a running
top-K (values + indices) in VMEM scratch across the sequential TPU grid — the
[N] score vector never materializes in HBM and the item matrix is read exactly
once at HBM bandwidth.

Selection is K rounds of (max, argmax-via-onehot, mask) over the concatenated
[running K | block] candidates — K*(NBI+K) VPU ops per block, negligible next
to the MXU/DMA work.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_PAD = 128  # running top-K lane width (>= any practical serving K)
NEG_INF = -1e30


def _topk_kernel(nbi: int, b: int, k: int, n_items: int):
    def kernel(items_ref, q_ref, out_v_ref, out_i_ref, run_v, run_i):
        c = pl.program_id(0)
        n_blocks = pl.num_programs(0)

        @pl.when(c == 0)
        def _():
            run_v[:] = jnp.full((b, K_PAD), NEG_INF, jnp.float32)
            run_i[:] = jnp.zeros((b, K_PAD), jnp.int32)

        scores = jnp.dot(q_ref[:], items_ref[:].T, preferred_element_type=jnp.float32)  # [B, NBI]
        col = jax.lax.broadcasted_iota(jnp.int32, (b, nbi), 1) + c * nbi
        # mask padding rows (beyond n_items)
        scores = jnp.where(col < n_items, scores, NEG_INF)

        cand_v = jnp.concatenate([run_v[:], scores], axis=1)  # [B, K_PAD + NBI]
        cand_i = jnp.concatenate([run_i[:], col], axis=1)
        width = K_PAD + nbi
        pos = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)

        new_v = jnp.full((b, K_PAD), NEG_INF, jnp.float32)
        new_i = jnp.zeros((b, K_PAD), jnp.int32)
        for kk in range(k):
            m = jnp.max(cand_v, axis=1, keepdims=True)  # [B, 1]
            am = jnp.argmax(cand_v, axis=1)[:, None]  # [B, 1]
            onehot = pos == am
            sel_i = jnp.sum(jnp.where(onehot, cand_i, 0), axis=1)  # [B]
            kcol = jax.lax.broadcasted_iota(jnp.int32, (b, K_PAD), 1)
            new_v = jnp.where(kcol == kk, m, new_v)
            new_i = jnp.where(kcol == kk, sel_i[:, None], new_i)
            cand_v = jnp.where(onehot, NEG_INF, cand_v)
        run_v[:] = new_v
        run_i[:] = new_i

        @pl.when(c == n_blocks - 1)
        def _():
            out_v_ref[:] = run_v[:]
            out_i_ref[:] = run_i[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "block_items"))
def topk_mips_pallas(item_vecs: jax.Array, queries: jax.Array, k: int, block_items: int = 2048):
    """Top-k inner-product search. item_vecs: [N, D]; queries: [B, D].
    Returns (indices [B, k] int32, scores [B, k]) sorted descending."""
    n, d = item_vecs.shape
    b = queries.shape[0]
    assert k <= K_PAD
    n_pad = ((n + block_items - 1) // block_items) * block_items
    if n_pad != n:
        item_vecs = jnp.concatenate([item_vecs, jnp.zeros((n_pad - n, d), item_vecs.dtype)], axis=0)
    n_blocks = n_pad // block_items

    out_v, out_i = pl.pallas_call(
        _topk_kernel(block_items, b, k, n),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_items, d), lambda c: (c, 0)),
            pl.BlockSpec((b, d), lambda c: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, K_PAD), lambda c: (0, 0)),
            pl.BlockSpec((b, K_PAD), lambda c: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, K_PAD), jnp.float32),
            jax.ShapeDtypeStruct((b, K_PAD), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, K_PAD), jnp.float32),
            pltpu.VMEM((b, K_PAD), jnp.int32),
        ],
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * b, bytes_accessed=n_pad * d * 4, transcendentals=0
        ),
    )(item_vecs, queries)
    return out_i[:, :k], out_v[:, :k]


def topk_mips_xla(item_vecs: jax.Array, queries: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """XLA golden reference: full matmul + hierarchical top_k."""
    from plotpointe_tpu.graphs.knn import _hierarchical_topk

    scores = jnp.dot(queries, item_vecs.T, preferred_element_type=jnp.float32)
    v, i = _hierarchical_topk(scores, k)
    return i, v
