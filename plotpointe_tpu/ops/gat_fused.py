"""Fully fused Pallas GAT attention — forward AND backward (v3).

Built on the tile-aligned edge layout (graphs/csr.py AttentionLayout): the
grid is a flat list of edge chunks, each owned by exactly one destination
tile, so there is no skew waste and every chunk maps to exactly one output
block. Per layer:

forward:  one bf16 source-row gather (XLA), then one kernel pass computing
          logits (in-kernel dot products), the per-destination denominator
          (a dst's edges are contained in its tile's chunks), dropout-masked
          weighted one-hot MXU aggregation, and the final normalization.
          Residuals: gathered rows hs, per-node denominator, output.
backward: kernel B1 re-derives per-edge attention quantities from the
          residuals and emits per-edge input-row gradients d(hs) (exact
          chunk-block writes) plus per-destination sums; the d(hs) stream is
          permuted to the TRANSPOSE layout (one more row gather) and kernel
          B2 reduces it per source tile — turning the CUDA-style random
          scatter-add into two more streaming one-hot MXU passes.

This replaces the reference's scatter_add_/index_add_ (forward,
train_gat_custom.py:86-92) and their autograd transposes (backward) with
TPU-shaped compute. Math parity: LeakyReLU(0.2), logit clamp +-10, eps 1e-9.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from plotpointe_tpu.graphs.csr import AttentionLayout, Graph

EPS = 1e-9


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _gather_fence(x: jax.Array) -> jax.Array:
    """Opaque completion fence: a Pallas call that consumes the WHOLE buffer
    but reads one block. Used to order consecutive big XLA row gathers:
    two [3.4M, 128] gathers allowed to proceed concurrently destroy each
    other's DMA streams (measured 65 ms vs 25 ms when strictly separated at
    the bench graph), and a plain optimization_barrier dependency does NOT
    separate them — only an opaque custom-call consumer does. The returned
    [8, 128] scalar block is folded into the next gather's table at 1e-30
    scale (numerically invisible) to carry the dependency."""
    bs = min(4096, x.shape[0] // 8 * 8) or 8
    lanes = min(128, x.shape[1])

    def kern(x_ref, o_ref):
        blk = x_ref[:8, :lanes].astype(jnp.float32)
        m = jnp.sum(blk, axis=0, keepdims=True)  # stay 2D: Mosaic scalar
        o_ref[:] = jnp.broadcast_to(jnp.sum(m, axis=1, keepdims=True), (8, 128))

    return pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((bs, x.shape[1]), lambda c: (0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda c: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(x)


def _hash_mask(seed: jax.Array, ids: jax.Array, rate: float) -> jax.Array:
    """Stateless per-edge dropout mask: a splitmix32-style hash of the
    canonical edge id xor a per-call seed decides keep/drop. Order
    independent, so the forward (dst-order chunks), B1, and the transpose
    kernel B2 (src-order chunks) reconstruct IDENTICAL masks from their own
    static id arrays (layout.pos / layout.t_pos) — no [E]-element mask
    stream ever gets permuted (a 1D permutation gather measured 29 ms at
    the bench graph; recomputing the hash is ~5 elementwise passes)."""
    x = ids.astype(jnp.uint32) ^ seed
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    thresh = jnp.uint32(min(int((1.0 - rate) * 4294967296.0), 4294967295))
    return jnp.where(x < thresh, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(nb: int, eb: int, d: int):
    def kernel(tile_of, is_last, hs_ref, ht_ref, d_ref, m_ref, as_ref, ad_ref,
               out_ref, den_ref, acc, dacc):
        i = pl.program_id(0)
        t = tile_of[i]
        prev = tile_of[jnp.maximum(i - 1, 0)]
        first = jnp.logical_or(i == 0, t != prev)

        @pl.when(first)
        def _():
            acc[:] = jnp.zeros_like(acc)
            dacc[:] = jnp.zeros_like(dacc)

        hs = hs_ref[:].astype(jnp.float32)  # [EB, D]
        gs = jnp.sum(hs * as_ref[0][None, :], axis=1)  # [EB]
        gd_tile = jnp.sum(ht_ref[:].astype(jnp.float32) * ad_ref[0][None, :], axis=1)  # [NB]

        dst = d_ref[:].reshape(1, eb)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0) + t * nb
        # ONE [NB, EB] compare+select pass builds the f32 incidence; every
        # per-destination broadcast/reduction below rides the MXU against it
        # instead of paying its own [NB, EB] VPU masked-reduce pass (the
        # kernel is VPU-bound — see docs/KERNELS.md tile-sweep note)
        oh = jnp.where(rows == dst, 1.0, 0.0)  # [NB, EB]

        # gd[e] = gd_tile[dst_e]: [1, NB] @ [NB, EB] MXU contraction
        gd = jnp.dot(gd_tile[None, :], oh, preferred_element_type=jnp.float32)[0]
        x = gs + gd
        lx = jnp.where(x > 0, x, 0.2 * x)
        e = jnp.clip(lx, -10.0, 10.0)
        num = jnp.exp(e)
        num_m = num * m_ref[:].reshape(eb)

        # den[r] += sum_e oh[r,e]*num[e]: [NB, EB] @ [EB, 1] MXU contraction
        dacc[0, :] += jnp.dot(oh, num[:, None], preferred_element_type=jnp.float32)[:, 0]
        w = oh * num_m[None, :]
        acc[:] += jnp.dot(w, hs, preferred_element_type=jnp.float32)

        @pl.when(is_last[i] == 1)
        def _():
            den = dacc[0, :]
            out_ref[:] = acc[:] / (den[:, None] + EPS)
            den_ref[:] = jnp.zeros_like(den_ref)
            den_ref[0, :] = den

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "eb", "n_tiles", "n_chunks", "vma"))
def _fwd_call(hs, h_tiles, dst2, mask2, a_src, a_dst, tile_of, is_last, nb, eb, n_tiles, n_chunks, vma=()):
    d = hs.shape[1]
    _vma = frozenset(vma) if vma else None
    sub = eb // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((eb, d), lambda i, to, il: (i, 0)),
            pl.BlockSpec((nb, d), lambda i, to, il: (to[i], 0)),
            pl.BlockSpec((sub, 128), lambda i, to, il: (i, 0)),
            pl.BlockSpec((sub, 128), lambda i, to, il: (i, 0)),
            pl.BlockSpec((1, d), lambda i, to, il: (0, 0)),
            pl.BlockSpec((1, d), lambda i, to, il: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nb, d), lambda i, to, il: (to[i], 0)),
            # Mosaic needs >=8 sublanes per non-full block: den rides in row 0
            # of an 8-row group per tile
            pl.BlockSpec((8, nb), lambda i, to, il: (to[i], 0)),
        ],
        scratch_shapes=[pltpu.VMEM((nb, d), jnp.float32), pltpu.VMEM((8, nb), jnp.float32)],
    )
    return pl.pallas_call(
        _fwd_kernel(nb, eb, d),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * nb, d), jnp.float32, vma=_vma),
            jax.ShapeDtypeStruct((n_tiles * 8, nb), jnp.float32, vma=_vma),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_chunks * nb * eb * d,
            bytes_accessed=n_chunks * eb * d * hs.dtype.itemsize + n_tiles * nb * d * 4,
            transcendentals=n_chunks * eb,
        ),
    )(tile_of, is_last, hs, h_tiles, dst2, mask2, a_src, a_dst)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _bwd_kernel(nb: int, eb: int, d: int):
    def kernel(tile_of, is_last, hs_ref, ht_ref, d_ref, m_ref, as_ref, ad_ref,
               g_ref, out_ref, den_ref, desum_ref, dasrc_ref, ds_acc, pa_acc):
        i = pl.program_id(0)
        t = tile_of[i]
        prev = tile_of[jnp.maximum(i - 1, 0)]
        first = jnp.logical_or(i == 0, t != prev)

        @pl.when(first)
        def _():
            ds_acc[:] = jnp.zeros_like(ds_acc)
            pa_acc[:] = jnp.zeros_like(pa_acc)

        hs = hs_ref[:].astype(jnp.float32)  # [EB, D]
        mask = m_ref[:].reshape(eb)
        gs = jnp.sum(hs * as_ref[0][None, :], axis=1)
        gd_tile = jnp.sum(ht_ref[:].astype(jnp.float32) * ad_ref[0][None, :], axis=1)

        # ONE f32 incidence [NB, EB] (fwd orientation); every
        # per-destination pick and sum below is an MXU contraction against
        # it — the round-4 B1 paid 5 masked [NB, EB] VPU passes plus an
        # extra [NB, D] x [D, EB] matmul whose only purpose was a picked row
        dst = d_ref[:].reshape(1, eb)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0) + t * nb
        oh = jnp.where(rows == dst, 1.0, 0.0)  # [NB, EB]

        gd = jnp.dot(gd_tile[None, :], oh, preferred_element_type=jnp.float32)[0]
        x = gs + gd
        lx = jnp.where(x > 0, x, 0.2 * x)
        e = jnp.clip(lx, -10.0, 10.0)
        num = jnp.exp(e)
        deriv = num * jnp.where((lx > -10.0) & (lx < 10.0), 1.0, 0.0) * jnp.where(x > 0, 1.0, 0.2)

        G = g_ref[:]  # [NB, D] cotangent rows for this tile
        den_e = jnp.dot(den_ref[0, :][None, :], oh, preferred_element_type=jnp.float32)[0] + EPS
        # Gg[e] = G[dst_e]: TN contraction over the NB dim of the incidence
        Gg = jax.lax.dot_general(oh, G, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [EB, D]
        ghs = jnp.sum(Gg * hs, axis=1)  # [EB] g[dst_e] . hs_e
        godot = jnp.sum(G * out_ref[:], axis=1)  # [NB] g_n . out_n
        godot_e = jnp.dot(godot[None, :], oh, preferred_element_type=jnp.float32)[0]

        dnum = (mask * ghs - godot_e) / den_e
        de = dnum * deriv  # [EB]

        # NOTE: no per-edge dhs stream is written — the transpose kernel B2
        # (_bwd2_kernel) recomputes dhs_e = alpha_e * G[dst_e] + de_e * a_src
        # in src-order from gathered per-NODE data, which turned out ~2x
        # cheaper than writing + permutation-gathering an [E_al, D] stream
        # (the permutation gather alone measured 51 ms at the bench graph)
        ds_acc[0, :] += jnp.dot(oh, de[:, None], preferred_element_type=jnp.float32)[:, 0]  # [NB]
        pa_acc[0, :] += jnp.dot(de[None, :], hs, preferred_element_type=jnp.float32)[0]  # [D]

        @pl.when(is_last[i] == 1)
        def _():
            desum_ref[:] = jnp.zeros_like(desum_ref)
            desum_ref[0, :] = ds_acc[0, :]
            dasrc_ref[:] = jnp.zeros_like(dasrc_ref)
            dasrc_ref[0, :] = pa_acc[0, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "eb", "n_tiles", "n_chunks", "vma"))
def _bwd_call(hs, h_tiles, dst2, mask2, a_src, a_dst, g_tiles, out_tiles, den,
              tile_of, is_last, nb, eb, n_tiles, n_chunks, vma=()):
    d = hs.shape[1]
    _vma = frozenset(vma) if vma else None
    sub = eb // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((eb, d), lambda i, to, il: (i, 0)),  # hs
            pl.BlockSpec((nb, d), lambda i, to, il: (to[i], 0)),  # h_tiles
            pl.BlockSpec((sub, 128), lambda i, to, il: (i, 0)),  # dst
            pl.BlockSpec((sub, 128), lambda i, to, il: (i, 0)),  # mask
            pl.BlockSpec((1, d), lambda i, to, il: (0, 0)),  # a_src
            pl.BlockSpec((1, d), lambda i, to, il: (0, 0)),  # a_dst
            pl.BlockSpec((nb, d), lambda i, to, il: (to[i], 0)),  # g
            pl.BlockSpec((nb, d), lambda i, to, il: (to[i], 0)),  # out residual
            pl.BlockSpec((8, nb), lambda i, to, il: (to[i], 0)),  # den residual
        ],
        out_specs=[
            pl.BlockSpec((8, nb), lambda i, to, il: (to[i], 0)),  # de per-dst sums
            pl.BlockSpec((8, d), lambda i, to, il: (to[i], 0)),  # da_src partials
        ],
        scratch_shapes=[pltpu.VMEM((8, nb), jnp.float32), pltpu.VMEM((8, d), jnp.float32)],
    )
    return pl.pallas_call(
        _bwd_kernel(nb, eb, d),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * 8, nb), jnp.float32, vma=_vma),
            jax.ShapeDtypeStruct((n_tiles * 8, d), jnp.float32, vma=_vma),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=6 * n_chunks * nb * eb * d,
            bytes_accessed=2 * n_chunks * eb * d * hs.dtype.itemsize,
            transcendentals=n_chunks * eb,
        ),
    )(tile_of, is_last, hs, h_tiles, dst2, mask2, a_src, a_dst, g_tiles, out_tiles, den)


def _reduce_kernel(nb: int, eb: int, d: int):
    """B2: per-source-tile sum of permuted edge gradients (one-hot matmul)."""

    def kernel(tile_of, is_last, x_ref, d_ref, out_ref, acc):
        i = pl.program_id(0)
        t = tile_of[i]
        prev = tile_of[jnp.maximum(i - 1, 0)]

        @pl.when(jnp.logical_or(i == 0, t != prev))
        def _():
            acc[:] = jnp.zeros_like(acc)

        dst = d_ref[:].reshape(1, eb)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0) + t * nb
        onehot = jnp.where(rows == dst, 1.0, 0.0)
        acc[:] += jnp.dot(onehot, x_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)

        @pl.when(is_last[i] == 1)
        def _():
            out_ref[:] = acc[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "eb", "n_tiles", "n_chunks", "vma"))
def _reduce_call(x, dst2, tile_of, is_last, nb, eb, n_tiles, n_chunks, vma=()):
    d = x.shape[1]
    _vma = frozenset(vma) if vma else None
    sub = eb // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((eb, d), lambda i, to, il: (i, 0)),
            pl.BlockSpec((sub, 128), lambda i, to, il: (i, 0)),
        ],
        out_specs=pl.BlockSpec((nb, d), lambda i, to, il: (to[i], 0)),
        scratch_shapes=[pltpu.VMEM((nb, d), jnp.float32)],
    )
    return pl.pallas_call(
        _reduce_kernel(nb, eb, d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * nb, d), jnp.float32, vma=_vma),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_chunks * nb * eb * d,
            bytes_accessed=n_chunks * eb * d * x.dtype.itemsize + n_tiles * nb * d * 4,
            transcendentals=0,
        ),
    )(tile_of, is_last, x, dst2)


def _bwd2_kernel(nb: int, eb: int, d: int, lo: int, row_dtype=jnp.float32):
    """B2 (transpose side): recompute per-edge attention scalars in
    src-order and reduce dh per source tile — all inputs are either
    tile-local (the src rows) or 128-lane-row gathers from per-NODE tables
    (the XLA gather fast path):

      Gt_ref  [EB, D]   gathered cotangent rows G[dst_e] (bf16)
      St_ref  [EB, 128] gathered node-scalar rows: lanes 0..8 are bf16
                        3-way hi/mid/lo splits of (den, godot, gd) — their
                        sums reconstruct f32 to ~2^-24 relative
      ht_ref  [NB, HD]  this src tile's node rows (head slice at lane lo)
      d_ref             in-tile src row ids (transpose layout's t_dst)
      m_ref             dropout mask stream (hash-recomputed in t-order)

    dhs_e = alpha_e * G[dst_e] + de_e * a_src, reduced per src row by the
    one-hot MXU contraction. Replaces the round-4 permute+reduce pipeline
    whose [E_al, D] permutation gather alone cost 51 ms."""

    def kernel(tile_of, is_last, Gt_ref, St_ref, ht_ref, d_ref, m_ref, as_ref,
               out_ref, acc):
        i = pl.program_id(0)
        t = tile_of[i]
        prev = tile_of[jnp.maximum(i - 1, 0)]

        @pl.when(jnp.logical_or(i == 0, t != prev))
        def _():
            acc[:] = jnp.zeros_like(acc)

        dst = d_ref[:].reshape(1, eb)  # src node ids (transpose destinations)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0) + t * nb
        oh = jnp.where(rows == dst, 1.0, 0.0)  # [NB, EB]

        # round src rows to the forward's stream dtype FIRST so B2's
        # recomputed logits match B1's (one consistent gradient in bf16 mode)
        ht = ht_ref[:, lo: lo + d].astype(row_dtype).astype(jnp.float32)
        Hs = jax.lax.dot_general(oh, ht, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # [EB, D] hs_e
        gs = jnp.sum(Hs * as_ref[0][None, :], axis=1)  # [EB]

        St = St_ref[:].astype(jnp.float32)
        den_e = St[:, 0] + St[:, 1] + St[:, 2] + EPS
        godot_e = St[:, 3] + St[:, 4] + St[:, 5]
        gd = St[:, 6] + St[:, 7] + St[:, 8]
        x = gs + gd
        lx = jnp.where(x > 0, x, 0.2 * x)
        e = jnp.clip(lx, -10.0, 10.0)
        num = jnp.exp(e)
        deriv = num * jnp.where((lx > -10.0) & (lx < 10.0), 1.0, 0.0) * jnp.where(x > 0, 1.0, 0.2)

        mask = m_ref[:].reshape(eb)
        Gt = Gt_ref[:].astype(jnp.float32)
        ghs = jnp.sum(Gt * Hs, axis=1)  # [EB]
        dnum = (mask * ghs - godot_e) / den_e
        de = dnum * deriv
        alpha_m = mask * num / den_e

        dhs_t = Gt * alpha_m[:, None] + de[:, None] * as_ref[0][None, :]
        acc[:] += jnp.dot(oh, dhs_t, preferred_element_type=jnp.float32)

        @pl.when(is_last[i] == 1)
        def _():
            out_ref[:] = acc[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "eb", "n_tiles", "n_chunks", "lo", "row_dtype", "vma"))
def _bwd2_call(Gt, St, h_tiles, tdst2, mask2, a_src, tile_of, is_last,
               nb, eb, n_tiles, n_chunks, lo=0, row_dtype=jnp.float32, vma=()):
    d = Gt.shape[1]
    hd = h_tiles.shape[1]
    _vma = frozenset(vma) if vma else None
    sub = eb // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((eb, d), lambda i, to, il: (i, 0)),  # Gt
            pl.BlockSpec((eb, 128), lambda i, to, il: (i, 0)),  # St
            pl.BlockSpec((nb, hd), lambda i, to, il: (to[i], 0)),  # src tile rows
            pl.BlockSpec((sub, 128), lambda i, to, il: (i, 0)),  # t_dst
            pl.BlockSpec((sub, 128), lambda i, to, il: (i, 0)),  # mask
            pl.BlockSpec((1, d), lambda i, to, il: (0, 0)),  # a_src
        ],
        out_specs=pl.BlockSpec((nb, d), lambda i, to, il: (to[i], 0)),
        scratch_shapes=[pltpu.VMEM((nb, d), jnp.float32)],
    )
    return pl.pallas_call(
        _bwd2_kernel(nb, eb, d, lo, row_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * nb, d), jnp.float32, vma=_vma),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_chunks * nb * eb * d,
            bytes_accessed=n_chunks * eb * (d + 128) * 2 + n_tiles * nb * d * 4,
            transcendentals=n_chunks * eb,
        ),
    )(tile_of, is_last, Gt, St, h_tiles, tdst2, mask2, a_src)


def _hilo(v: jax.Array) -> tuple:
    """Split an f32 vector into three bf16 lanes whose sum reconstructs it to
    ~2^-24 relative (f32-faithful): 3x8 mantissa bits cover f32's 24."""
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


# ---------------------------------------------------------------------------
# head-packed multi-head forward (v3-mh)
# ---------------------------------------------------------------------------


def _fwd_kernel_mh(nb: int, eb: int, d: int, heads: int):
    """Multi-head forward with heads PACKED into the lane dim: hs/ht blocks
    are [*, H*D] with head h owning lanes [h*D, (h+1)*D). One stream of the
    gathered rows serves every head (the per-row fetch dominates gather cost
    on TPU). Per-head compute is a static Python unroll (H <= 8) of the
    SINGLE-HEAD kernel body: the f32 incidence is built once per chunk and
    every per-destination broadcast/reduction rides the MXU against it —
    the round-4 version's VPU masked reduces were ~3.8x heads=1; with the
    shared one-hot contractions heads=2 lands ~1.3x."""

    def kernel(tile_of, is_last, *refs):
        hs_refs = refs[:heads]  # one [EB, D] stream per head: the XLA row
        # gather has a fast path at 128-lane rows (measured 7.5 ms at
        # [3.4M, 128] vs 53 ms at [3.4M, 256]), so heads stay SPLIT in HBM
        # and pack only inside VMEM
        ht_ref, d_ref, m_ref, as_ref, ad_ref, out_ref, den_ref, acc, dacc = refs[heads:]
        i = pl.program_id(0)
        t = tile_of[i]
        prev = tile_of[jnp.maximum(i - 1, 0)]
        first = jnp.logical_or(i == 0, t != prev)

        @pl.when(first)
        def _():
            acc[:] = jnp.zeros_like(acc)
            dacc[:] = jnp.zeros_like(dacc)

        dst = d_ref[:].reshape(1, eb)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0) + t * nb
        oh = jnp.where(rows == dst, 1.0, 0.0)  # [NB, EB] shared across heads

        for hh in range(heads):
            lo = hh * d
            hs_h = hs_refs[hh][:].astype(jnp.float32)  # [EB, D]
            ht_h = ht_ref[:, lo: lo + d].astype(jnp.float32)  # [NB, D]
            gs = jnp.sum(hs_h * as_ref[hh][None, :], axis=1)  # [EB]
            gd_tile = jnp.sum(ht_h * ad_ref[hh][None, :], axis=1)  # [NB]
            gd = jnp.dot(gd_tile[None, :], oh, preferred_element_type=jnp.float32)[0]
            x = gs + gd
            lx = jnp.where(x > 0, x, 0.2 * x)
            e = jnp.clip(lx, -10.0, 10.0)
            num = jnp.exp(e)
            num_m = num * m_ref[hh].reshape(eb)
            dacc[hh, :] += jnp.dot(oh, num[:, None], preferred_element_type=jnp.float32)[:, 0]
            w = oh * num_m[None, :]
            acc[:, lo: lo + d] += jnp.dot(w, hs_h, preferred_element_type=jnp.float32)

        @pl.when(is_last[i] == 1)
        def _():
            den_ref[:] = jnp.zeros_like(den_ref)
            for hh in range(heads):
                lo = hh * d
                out_ref[:, lo: lo + d] = acc[:, lo: lo + d] / (dacc[hh, :][:, None] + EPS)
                den_ref[hh, 0, :] = dacc[hh, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "eb", "n_tiles", "n_chunks", "heads"))
def _fwd_call_mh(hs_list, h_tiles, dst2, mask3, a_src, a_dst, tile_of, is_last,
                 nb, eb, n_tiles, n_chunks, heads):
    hd = h_tiles.shape[1]
    d = hd // heads
    sub = eb // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((eb, d), lambda i, to, il: (i, 0)) for _ in range(heads)]
        + [
            pl.BlockSpec((nb, hd), lambda i, to, il: (to[i], 0)),
            pl.BlockSpec((sub, 128), lambda i, to, il: (i, 0)),
            pl.BlockSpec((heads, sub, 128), lambda i, to, il: (0, i, 0)),  # per-head mask
            pl.BlockSpec((heads, d), lambda i, to, il: (0, 0)),
            pl.BlockSpec((heads, d), lambda i, to, il: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((nb, hd), lambda i, to, il: (to[i], 0)),
            pl.BlockSpec((heads, 8, nb), lambda i, to, il: (0, to[i], 0)),
        ],
        scratch_shapes=[pltpu.VMEM((nb, hd), jnp.float32), pltpu.VMEM((8, nb), jnp.float32)],
    )
    return pl.pallas_call(
        _fwd_kernel_mh(nb, eb, d, heads),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles * nb, hd), jnp.float32),
            jax.ShapeDtypeStruct((heads, n_tiles * 8, nb), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_chunks * nb * eb * hd,
            bytes_accessed=n_chunks * eb * hd * hs_list[0].dtype.itemsize + n_tiles * nb * hd * 4,
            transcendentals=n_chunks * eb * heads,
        ),
    )(tile_of, is_last, *hs_list, h_tiles, dst2, mask3, a_src, a_dst)


def _bwd_kernel_mh(nb: int, eb: int, d: int, heads: int):
    """Packed multi-head B1: the single-head backward body unrolled per head
    over the shared incidence, emitting packed [EB, H*D] edge gradients plus
    per-head per-destination sums and a_src partials."""

    def kernel(tile_of, is_last, *refs):
        hs_refs = refs[:heads]  # split per-head streams (see _fwd_kernel_mh)
        (ht_ref, d_ref, m_ref, as_ref, ad_ref, g_ref, out_ref, den_ref) = refs[heads:heads + 8]
        desum_ref, dasrc_ref, ds_acc, pa_acc = refs[heads + 8:]
        i = pl.program_id(0)
        t = tile_of[i]
        prev = tile_of[jnp.maximum(i - 1, 0)]
        first = jnp.logical_or(i == 0, t != prev)

        @pl.when(first)
        def _():
            ds_acc[:] = jnp.zeros_like(ds_acc)
            pa_acc[:] = jnp.zeros_like(pa_acc)

        # ONE f32 incidence [NB, EB] shared by every head; all the
        # per-destination picks/sums ride the MXU against it (see _bwd_kernel)
        dst = d_ref[:].reshape(1, eb)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0) + t * nb
        oh = jnp.where(rows == dst, 1.0, 0.0)  # [NB, EB]

        for hh in range(heads):
            lo = hh * d
            hs_h = hs_refs[hh][:].astype(jnp.float32)  # [EB, D]
            mask = m_ref[hh].reshape(eb)
            gs = jnp.sum(hs_h * as_ref[hh][None, :], axis=1)
            gd_tile = jnp.sum(ht_ref[:, lo: lo + d].astype(jnp.float32) * ad_ref[hh][None, :], axis=1)
            gd = jnp.dot(gd_tile[None, :], oh, preferred_element_type=jnp.float32)[0]
            x = gs + gd
            lx = jnp.where(x > 0, x, 0.2 * x)
            e = jnp.clip(lx, -10.0, 10.0)
            num = jnp.exp(e)
            deriv = num * jnp.where((lx > -10.0) & (lx < 10.0), 1.0, 0.0) * jnp.where(x > 0, 1.0, 0.2)

            G = g_ref[:, lo: lo + d]  # [NB, D] cotangent rows for this tile/head
            den_e = jnp.dot(den_ref[hh, 0, :][None, :], oh,
                            preferred_element_type=jnp.float32)[0] + EPS
            Gg = jax.lax.dot_general(oh, G, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)  # [EB, D]
            ghs = jnp.sum(Gg * hs_h, axis=1)  # [EB]
            godot = jnp.sum(G * out_ref[:, lo: lo + d], axis=1)  # [NB]
            godot_e = jnp.dot(godot[None, :], oh, preferred_element_type=jnp.float32)[0]

            dnum = (mask * ghs - godot_e) / den_e
            de = dnum * deriv

            # no dhs stream (recomputed in src-order by _bwd2_kernel per head)
            ds_acc[hh, :] += jnp.dot(oh, de[:, None], preferred_element_type=jnp.float32)[:, 0]
            pa_acc[hh, :] += jnp.dot(de[None, :], hs_h, preferred_element_type=jnp.float32)[0]

        @pl.when(is_last[i] == 1)
        def _():
            desum_ref[:] = jnp.zeros_like(desum_ref)
            dasrc_ref[:] = jnp.zeros_like(dasrc_ref)
            for hh in range(heads):
                desum_ref[hh, 0, :] = ds_acc[hh, :]
                dasrc_ref[hh, 0, :] = pa_acc[hh, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "eb", "n_tiles", "n_chunks", "heads"))
def _bwd_call_mh(hs_list, h_tiles, dst2, mask3, a_src, a_dst, g_tiles, out_tiles, den,
                 tile_of, is_last, nb, eb, n_tiles, n_chunks, heads):
    hd = h_tiles.shape[1]
    d = hd // heads
    sub = eb // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((eb, d), lambda i, to, il: (i, 0)) for _ in range(heads)]  # hs
        + [
            pl.BlockSpec((nb, hd), lambda i, to, il: (to[i], 0)),  # h_tiles
            pl.BlockSpec((sub, 128), lambda i, to, il: (i, 0)),  # dst
            pl.BlockSpec((heads, sub, 128), lambda i, to, il: (0, i, 0)),  # mask
            pl.BlockSpec((heads, d), lambda i, to, il: (0, 0)),  # a_src
            pl.BlockSpec((heads, d), lambda i, to, il: (0, 0)),  # a_dst
            pl.BlockSpec((nb, hd), lambda i, to, il: (to[i], 0)),  # g
            pl.BlockSpec((nb, hd), lambda i, to, il: (to[i], 0)),  # out residual
            pl.BlockSpec((heads, 8, nb), lambda i, to, il: (0, to[i], 0)),  # den residual
        ],
        out_specs=[
            pl.BlockSpec((heads, 8, nb), lambda i, to, il: (0, to[i], 0)),  # de sums
            pl.BlockSpec((heads, 8, d), lambda i, to, il: (0, to[i], 0)),  # da_src partials
        ],
        scratch_shapes=[pltpu.VMEM((8, nb), jnp.float32), pltpu.VMEM((8, d), jnp.float32)],
    )
    return pl.pallas_call(
        _bwd_kernel_mh(nb, eb, d, heads),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((heads, n_tiles * 8, nb), jnp.float32),
            jax.ShapeDtypeStruct((heads, n_tiles * 8, d), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=6 * n_chunks * nb * eb * hd,
            bytes_accessed=2 * n_chunks * eb * hd * hs_list[0].dtype.itemsize,
            transcendentals=n_chunks * eb * heads,
        ),
    )(tile_of, is_last, *hs_list, h_tiles, dst2, mask3, a_src, a_dst, g_tiles, out_tiles, den)


def attention_v3_mh(
    h: jax.Array,  # [N, H, D]  (D lane-padded by the caller)
    a_src: jax.Array,  # [H, D]
    a_dst: jax.Array,  # [H, D]
    graph: Graph,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    hs_dtype=jnp.bfloat16,
) -> jax.Array:
    """Head-packed fully fused multi-head attention: forward AND backward run
    the packed kernels (one [E_al, H*D] gather stream serves every head in
    both directions; B2's transpose reduce is head-agnostic — one one-hot
    matmul over the packed lanes). Per-head dropout mask streams are drawn
    over aligned edge positions, self-consistent fwd/bwd. Covers the
    reference's --heads ablation (`train_gat_pyg.py:203`) with training
    through TPU kernels, like its CUDA GATConv."""
    L = graph.layout
    if L is None:
        raise ValueError("graph needs the aligned layout: call graph.with_layout() before to_device()")
    n = graph.n_nodes
    _, heads, d = h.shape
    if heads > 8:
        raise ValueError("attention_v3_mh packs heads into the den scratch rows; heads <= 8")
    nb, eb, n_tiles = L.nb, L.eb, L.n_tiles
    n_chunks, n_chunks_t = L.n_chunks, L.n_chunks_t
    e_al = L.e_aligned
    hd = heads * d
    dst2 = L.dst.reshape(e_al // 128, 128)
    tdst2 = L.t_dst.reshape(-1, 128)

    def make_mask3(ids):
        # hash over canonical edge ids, folded per head — the dst-order
        # kernels use layout.pos, the src-order B2 uses layout.t_pos, and
        # both reconstruct the SAME per-(edge, head) mask (see _hash_mask)
        if dropout_rate > 0.0 and rng is not None:
            seed = jax.random.bits(rng, (), jnp.uint32)
            m = jnp.stack([
                _hash_mask(seed, ids + jnp.int32(hh) * jnp.int32(1 << 27), dropout_rate)
                for hh in range(heads)])
        else:
            m = jnp.ones((heads,) + ids.shape, jnp.float32)
        return m.reshape(heads, -1, 128)

    def prep(h):
        hp = jnp.concatenate([h, jnp.zeros((1, heads, d), h.dtype)], axis=0)
        hp2 = hp.reshape(n + 1, hd)  # heads -> lane blocks (kernel-side view)
        # ONE gather PER HEAD at 128-lane row width, strictly SEPARATED by
        # _gather_fence. Two XLA cliffs measured at the bench graph: rows
        # wider than 128 lanes fall off the gather fast path ([3.4M, 256] =
        # 53 ms vs 2 x 9 ms split), and two concurrent big gathers thrash
        # each other (65 ms vs 25 ms separated).
        hs_list = []
        for hh in range(heads):
            t = hp[:, hh, :]
            if hs_list:
                f = _gather_fence(hs_list[-1])
                t = t + f[0, 0].astype(t.dtype) * 1e-30
            hs_list.append(t.astype(hs_dtype)[L.src])
        pad_rows = n_tiles * nb - (n + 1)
        h_tiles = jnp.concatenate([hp2, jnp.zeros((pad_rows, hd), hp2.dtype)], axis=0)
        return tuple(hs_list), h_tiles

    def fwd_only(h, a_src, a_dst):
        hs_list, h_tiles = prep(h)
        out, den = _fwd_call_mh(hs_list, h_tiles, dst2, make_mask3(L.pos), a_src, a_dst,
                                L.tile_of, L.is_last, nb, eb, n_tiles, n_chunks, heads)
        return out, den, hs_list, h_tiles

    @jax.custom_vjp
    def attn(h, a_src, a_dst):
        out, _, _, _ = fwd_only(h, a_src, a_dst)
        return out[:n].reshape(n, heads, d)

    def attn_fwd(h, a_src, a_dst):
        out, den, hs_list, h_tiles = fwd_only(h, a_src, a_dst)
        return out[:n].reshape(n, heads, d), (hs_list, h_tiles, out, den, a_src, a_dst)

    def attn_bwd(res, g):
        hs_list, h_tiles, out_tiles, den, a_src_r, a_dst_r = res
        g2 = g.reshape(n, hd)
        pad_rows = n_tiles * nb - n
        g_tiles = jnp.concatenate([g2, jnp.zeros((pad_rows, hd), g2.dtype)], axis=0)

        de_sum8, da_src_part8 = _bwd_call_mh(
            hs_list, h_tiles, dst2, make_mask3(L.pos), a_src_r, a_dst_r, g_tiles, out_tiles, den,
            L.tile_of, L.is_last, nb, eb, n_tiles, n_chunks, heads)
        de_sum = de_sum8.reshape(heads, n_tiles, 8, nb)[:, :, 0, :]  # [H, T, NB]
        da_src_part = da_src_part8.reshape(heads, n_tiles, 8, d)[:, :, 0, :]

        # transpose pass per head: B2 recomputes dhs_e in src-order from
        # per-NODE tables (see attention_v3's attn_bwd) — fenced gathers
        den_nodes = den.reshape(heads, n_tiles, 8, nb)[:, :, 0, :].reshape(heads, n_tiles * nb)
        mask_t3 = make_mask3(L.t_pos)
        dh_heads = []
        prev = None
        for hh in range(heads):
            lo = hh * d
            g_h = g_tiles[:, lo: lo + d]
            godot_nodes = jnp.sum(g_h * out_tiles[:, lo: lo + d], axis=1)
            gd_nodes = jnp.sum(h_tiles[:, lo: lo + d].astype(jnp.float32)
                               * a_dst_r[hh][None, :], axis=1)
            lanes = jnp.stack(
                _hilo(den_nodes[hh, : n + 1]) + _hilo(godot_nodes[: n + 1])
                + _hilo(gd_nodes[: n + 1]), axis=1)
            S = jnp.pad(lanes, ((0, 0), (0, 119)))
            Gp = jnp.concatenate([g_h[:n], jnp.zeros((1, d), g_h.dtype)], axis=0).astype(hs_dtype)
            if prev is not None:
                f = _gather_fence(prev)
                Gp = Gp + f[0, 0].astype(Gp.dtype) * 1e-30
            Gt = Gp[L.t_src]
            f = _gather_fence(Gt)
            prev = Gt
            St = (S + f[0, 0].astype(S.dtype) * 1e-30)[L.t_src]
            dh_heads.append(_bwd2_call(
                Gt, St, h_tiles, tdst2, mask_t3[hh], a_src_r[hh: hh + 1],
                L.t_tile_of, L.t_is_last, nb, eb, n_tiles, n_chunks_t, lo=lo,
                row_dtype=hs_dtype)[:n])
        de_nodes = de_sum.reshape(heads, n_tiles * nb)[:, :n]  # [H, N]
        dh = jnp.stack(dh_heads, axis=1) + de_nodes.T[:, :, None] * a_dst_r[None, :, :]
        da_src = jnp.sum(da_src_part, axis=1)  # [H, D]
        h_nodes = h_tiles[:n].astype(jnp.float32).reshape(n, heads, d)
        da_dst = jnp.einsum("hn,nhd->hd", de_nodes, h_nodes)
        return dh, da_src, da_dst

    attn.defvjp(attn_fwd, attn_bwd)
    return attn(h, a_src, a_dst)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


def attention_v3(
    h: jax.Array,  # [N, 1, D]
    a_src: jax.Array,  # [1, D]
    a_dst: jax.Array,  # [1, D]
    graph: Graph,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    hs_dtype=jnp.bfloat16,
    vma: tuple = (),
) -> jax.Array:
    """Single-head fused attention layer over the aligned layout. The dropout
    mask is drawn over aligned edge positions (self-consistent fwd/bwd).

    vma: mesh axes this call varies over, for use inside shard_map with
    check_vma (the device-local tile-shard path, parallel/spmd.py); inputs
    must already be pvary'd to the same axes."""
    L = graph.layout
    if L is None:
        raise ValueError("graph needs the aligned layout: call graph.with_layout() before to_device()")
    n = graph.n_nodes
    d = h.shape[-1]
    nb, eb, n_tiles = L.nb, L.eb, L.n_tiles
    n_chunks, n_chunks_t = L.n_chunks, L.n_chunks_t
    e_al = L.e_aligned

    dst2 = L.dst.reshape(e_al // 128, 128)
    tdst2 = L.t_dst.reshape(-1, 128)

    def make_mask(ids):
        # hash-based mask over CANONICAL edge ids so the dst-order (fwd/B1)
        # and src-order (B2) kernels reconstruct identical masks from their
        # own static id arrays — see _hash_mask
        if dropout_rate > 0.0 and rng is not None:
            seed = jax.random.bits(rng, (), jnp.uint32)
            m = _hash_mask(seed, ids, dropout_rate)
        else:
            m = jnp.ones(ids.shape, jnp.float32)
        # under shard_map check_vma, every kernel operand must carry the same
        # varying-axes set; constants (the no-dropout mask) start unvarying
        return jax.lax.pvary(m, vma) if vma else m

    def prep(h):
        h2 = h[:, 0, :]
        hp = jnp.concatenate([h2, jnp.zeros((1, d), h2.dtype)], axis=0)
        # cast FIRST, then gather: XLA's fused gather+convert falls off the
        # fast path, and bf16 rows halve the gather traffic (measured ~4.5x
        # on the spmm kernel's identical gather, ops/spmm_kernel.py)
        hs = hp.astype(hs_dtype)[L.src]  # [E_al, D]
        pad_rows = n_tiles * nb - (n + 1)
        h_tiles = jnp.concatenate([hp, jnp.zeros((pad_rows, d), hp.dtype)], axis=0)
        return hs, h_tiles

    def fwd_only(h, a_src, a_dst):
        hs, h_tiles = prep(h)
        mask2 = make_mask(L.pos).reshape(e_al // 128, 128)
        out, den = _fwd_call(hs, h_tiles, dst2, mask2, a_src, a_dst, L.tile_of, L.is_last,
                             nb, eb, n_tiles, n_chunks, vma=vma)
        return out, den, hs, h_tiles

    @jax.custom_vjp
    def attn(h, a_src, a_dst):
        out, _, _, _ = fwd_only(h, a_src, a_dst)
        return out[:n][:, None, :]

    def attn_fwd(h, a_src, a_dst):
        out, den, hs, h_tiles = fwd_only(h, a_src, a_dst)
        return out[:n][:, None, :], (hs, h_tiles, out, den, a_src, a_dst)

    def attn_bwd(res, g):
        hs, h_tiles, out_tiles, den, a_src_r, a_dst_r = res
        g2 = g[:, 0, :]
        pad_rows = n_tiles * nb - n
        g_tiles = jnp.concatenate([g2, jnp.zeros((pad_rows, d), g2.dtype)], axis=0)
        mask2 = make_mask(L.pos).reshape(e_al // 128, 128)

        de_sum8, da_src_part8 = _bwd_call(
            hs, h_tiles, dst2, mask2, a_src_r, a_dst_r, g_tiles, out_tiles, den,
            L.tile_of, L.is_last, nb, eb, n_tiles, n_chunks, vma=vma,
        )
        de_sum = de_sum8.reshape(n_tiles, 8, nb)[:, 0, :]
        da_src_part = da_src_part8.reshape(n_tiles, 8, d)[:, 0, :]

        # transpose pass: dh[s] = sum over edges with src s of
        # (alpha_e G[dst_e] + de_e a_src), recomputed in src-order by B2 from
        # two 128-lane-row gathers out of per-NODE tables (the gather fast
        # path) — no [E_al, D] stream is permuted (51 ms saved, see B1 note)
        den_nodes = den.reshape(n_tiles, 8, nb)[:, 0, :].reshape(n_tiles * nb)
        godot_nodes = jnp.sum(g_tiles * out_tiles, axis=1)  # [n_tiles*nb]
        gd_nodes = jnp.sum(h_tiles.astype(jnp.float32) * a_dst_r[0][None, :], axis=1)
        lanes = jnp.stack(
            _hilo(den_nodes[: n + 1]) + _hilo(godot_nodes[: n + 1]) + _hilo(gd_nodes[: n + 1]),
            axis=1)  # [n+1, 9] bf16 (3-way splits, f32-faithful)
        S = jnp.pad(lanes, ((0, 0), (0, 119)))
        # Gt rides at hs_dtype, like the forward's hs gather: bf16 halves the
        # gather traffic in production; the f32 mode keeps grads bit-faithful
        Gp = jnp.concatenate([g2, jnp.zeros((1, d), g2.dtype)], axis=0).astype(hs_dtype)
        Gt = Gp[L.t_src]
        f = _gather_fence(Gt)  # keep the two big gathers strictly separated
        St = (S + f[0, 0].astype(S.dtype) * 1e-30)[L.t_src]
        mask_t2 = make_mask(L.t_pos).reshape(-1, 128)
        dh_nodes = _bwd2_call(Gt, St, h_tiles, tdst2, mask_t2, a_src_r,
                              L.t_tile_of, L.t_is_last, nb, eb, n_tiles, n_chunks_t,
                              row_dtype=hs_dtype, vma=vma)

        de_sum_nodes = de_sum.reshape(n_tiles * nb)[: n]
        dh = dh_nodes[:n] + de_sum_nodes[:, None] * a_dst_r[0][None, :]
        da_src = jnp.sum(da_src_part, axis=0, keepdims=True)
        da_dst = (de_sum_nodes[None, :] @ h_tiles[:n].astype(jnp.float32))
        return dh[:, None, :], da_src, da_dst

    attn.defvjp(attn_fwd, attn_bwd)
    return attn(h, a_src, a_dst)
