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


def _bwd_kernel(nb: int, eb: int, d: int, out_dtype):
    def kernel(tile_of, is_last, hs_ref, ht_ref, d_ref, m_ref, as_ref, ad_ref,
               g_ref, out_ref, den_ref, dhs_ref, desum_ref, dasrc_ref, ds_acc, pa_acc):
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

        dst = d_ref[:].reshape(1, eb)
        rows = jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0) + t * nb
        onehot = rows == dst

        gd = jnp.sum(jnp.where(onehot, gd_tile[:, None], 0.0), axis=0)
        x = gs + gd
        lx = jnp.where(x > 0, x, 0.2 * x)
        e = jnp.clip(lx, -10.0, 10.0)
        num = jnp.exp(e)
        deriv = num * jnp.where((lx > -10.0) & (lx < 10.0), 1.0, 0.0) * jnp.where(x > 0, 1.0, 0.2)

        G = g_ref[:]  # [NB, D] cotangent rows for this tile
        den_tile = den_ref[0, :]  # [NB]
        den_e = jnp.sum(jnp.where(onehot, den_tile[:, None], 0.0), axis=0) + EPS  # [EB]

        # per-edge g[dst_e] . hs_e via one MXU matmul + onehot pick
        M = jnp.dot(G, hs.T, preferred_element_type=jnp.float32)  # [NB, EB]
        ghs = jnp.sum(jnp.where(onehot, M, 0.0), axis=0)  # [EB]
        godot = jnp.sum(G * out_ref[:], axis=1)  # [NB] g_n . out_n
        godot_e = jnp.sum(jnp.where(onehot, godot[:, None], 0.0), axis=0)  # [EB]

        dnum = (mask * ghs - godot_e) / den_e
        de = dnum * deriv  # [EB]
        alpha_m = mask * num / den_e

        # dhs = W^T @ G + de * a_src  where W[r, e] = alpha_m_e on the incidence
        W = jnp.where(onehot, alpha_m[None, :], 0.0)  # [NB, EB]
        dhs = jnp.dot(W.T, G, preferred_element_type=jnp.float32) + de[:, None] * as_ref[0][None, :]
        dhs_ref[:] = dhs.astype(out_dtype)

        ds_acc[0, :] += jnp.sum(jnp.where(onehot, de[None, :], 0.0), axis=1)  # [NB]
        pa_acc[0, :] += jnp.dot(de[None, :], hs, preferred_element_type=jnp.float32)[0]  # [D]

        @pl.when(is_last[i] == 1)
        def _():
            desum_ref[:] = jnp.zeros_like(desum_ref)
            desum_ref[0, :] = ds_acc[0, :]
            dasrc_ref[:] = jnp.zeros_like(dasrc_ref)
            dasrc_ref[0, :] = pa_acc[0, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "eb", "n_tiles", "n_chunks", "dhs_dtype", "vma"))
def _bwd_call(hs, h_tiles, dst2, mask2, a_src, a_dst, g_tiles, out_tiles, den,
              tile_of, is_last, nb, eb, n_tiles, n_chunks, dhs_dtype, vma=()):
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
            pl.BlockSpec((eb, d), lambda i, to, il: (i, 0)),  # dhs
            pl.BlockSpec((8, nb), lambda i, to, il: (to[i], 0)),  # de per-dst sums
            pl.BlockSpec((8, d), lambda i, to, il: (to[i], 0)),  # da_src partials
        ],
        scratch_shapes=[pltpu.VMEM((8, nb), jnp.float32), pltpu.VMEM((8, d), jnp.float32)],
    )
    return pl.pallas_call(
        _bwd_kernel(nb, eb, d, dhs_dtype),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_chunks * eb, d), dhs_dtype, vma=_vma),
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


# ---------------------------------------------------------------------------
# head-packed multi-head forward (v3-mh)
# ---------------------------------------------------------------------------


def _fwd_kernel_mh(nb: int, eb: int, d: int, heads: int):
    """Multi-head forward with heads PACKED into the lane dim: hs/ht blocks
    are [*, H*D] with head h owning lanes [h*D, (h+1)*D). One stream of the
    gathered rows serves every head (the per-row fetch dominates gather cost
    on TPU, so heads=2 costs ~1.1x heads=1 — vs 2x for per-head passes).
    Per-head compute is a static Python unroll (H <= 8): logits, in-tile
    denominator (row h of the den scratch), weighted one-hot MXU matmul on
    the head's lane block."""

    def kernel(tile_of, is_last, hs_ref, ht_ref, d_ref, as_ref, ad_ref,
               out_ref, acc, dacc):
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
        onehot = rows == dst  # [NB, EB]

        for hh in range(heads):
            lo = hh * d
            hs_h = hs_ref[:, lo: lo + d].astype(jnp.float32)  # [EB, D]
            ht_h = ht_ref[:, lo: lo + d].astype(jnp.float32)  # [NB, D]
            gs = jnp.sum(hs_h * as_ref[hh][None, :], axis=1)  # [EB]
            gd_tile = jnp.sum(ht_h * ad_ref[hh][None, :], axis=1)  # [NB]
            gd = jnp.sum(jnp.where(onehot, gd_tile[:, None], 0.0), axis=0)  # [EB]
            x = gs + gd
            lx = jnp.where(x > 0, x, 0.2 * x)
            e = jnp.clip(lx, -10.0, 10.0)
            num = jnp.exp(e)
            dacc[hh, :] += jnp.sum(jnp.where(onehot, num[None, :], 0.0), axis=1)
            w = jnp.where(onehot, num[None, :], 0.0)
            acc[:, lo: lo + d] += jnp.dot(w, hs_h, preferred_element_type=jnp.float32)

        @pl.when(is_last[i] == 1)
        def _():
            for hh in range(heads):
                lo = hh * d
                out_ref[:, lo: lo + d] = acc[:, lo: lo + d] / (dacc[hh, :][:, None] + EPS)

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "eb", "n_tiles", "n_chunks", "heads"))
def _fwd_call_mh(hs, h_tiles, dst2, a_src, a_dst, tile_of, is_last,
                 nb, eb, n_tiles, n_chunks, heads):
    hd = hs.shape[1]
    d = hd // heads
    sub = eb // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((eb, hd), lambda i, to, il: (i, 0)),
            pl.BlockSpec((nb, hd), lambda i, to, il: (to[i], 0)),
            pl.BlockSpec((sub, 128), lambda i, to, il: (i, 0)),
            pl.BlockSpec((heads, d), lambda i, to, il: (0, 0)),
            pl.BlockSpec((heads, d), lambda i, to, il: (0, 0)),
        ],
        out_specs=pl.BlockSpec((nb, hd), lambda i, to, il: (to[i], 0)),
        scratch_shapes=[pltpu.VMEM((nb, hd), jnp.float32), pltpu.VMEM((8, nb), jnp.float32)],
    )
    return pl.pallas_call(
        _fwd_kernel_mh(nb, eb, d, heads),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * nb, hd), jnp.float32),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_chunks * nb * eb * hd,
            bytes_accessed=n_chunks * eb * hd * hs.dtype.itemsize + n_tiles * nb * hd * 4,
            transcendentals=n_chunks * eb * heads,
        ),
    )(tile_of, is_last, hs, h_tiles, dst2, a_src, a_dst)


def attention_v3_mh(
    h: jax.Array,  # [N, H, D]  (D lane-padded by the caller)
    a_src: jax.Array,  # [H, D]
    a_dst: jax.Array,  # [H, D]
    graph: Graph,
    hs_dtype=jnp.bfloat16,
) -> jax.Array:
    """Head-packed fused multi-head forward (no dropout — the dropout path
    keeps per-head v3 for mask-stream parity with the XLA reference impl).
    Backward is the XLA golden path (same custom_vjp pattern as v1/v2,
    ops/gat_kernel.py) — the packed win is the forward gather stream, which
    dominates eval/export/serving. Covers the reference's --heads ablation
    (`train_gat_pyg.py:203`)."""
    L = graph.layout
    if L is None:
        raise ValueError("graph needs the aligned layout: call graph.with_layout() before to_device()")
    n = graph.n_nodes
    _, heads, d = h.shape
    if heads > 8:
        raise ValueError("attention_v3_mh packs heads into the den scratch rows; heads <= 8")
    nb, eb, n_tiles, n_chunks = L.nb, L.eb, L.n_tiles, L.n_chunks
    dst2 = L.dst.reshape(L.e_aligned // 128, 128)

    def fwd(h, a_src, a_dst):
        hp = jnp.concatenate([h, jnp.zeros((1, heads, d), h.dtype)], axis=0)
        hp2 = hp.reshape(n + 1, heads * d)  # heads -> lane blocks
        hs = hp2.astype(hs_dtype)[L.src]  # ONE [E_al, H*D] gather for all heads
        pad_rows = n_tiles * nb - (n + 1)
        h_tiles = jnp.concatenate([hp2, jnp.zeros((pad_rows, heads * d), hp2.dtype)], axis=0)
        out = _fwd_call_mh(hs, h_tiles, dst2, a_src, a_dst, L.tile_of, L.is_last,
                           nb, eb, n_tiles, n_chunks, heads)
        return out[:n].reshape(n, heads, d)

    @jax.custom_vjp
    def attn(h, a_src, a_dst):
        return fwd(h, a_src, a_dst)

    def attn_fwd(h, a_src, a_dst):
        return fwd(h, a_src, a_dst), (h, a_src, a_dst)

    def attn_bwd(res, g):
        from plotpointe_tpu.ops import segment as _seg

        h, a_src, a_dst = res
        _, vjp = jax.vjp(
            lambda h_, as_, ad_: _seg.segment_softmax_attention(
                h_, as_, ad_, graph, impl="xla"), h, a_src, a_dst)
        return vjp(g)

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

    def make_mask():
        if dropout_rate > 0.0 and rng is not None:
            keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, (e_al,))
            m = jnp.where(keep, 1.0 / (1.0 - dropout_rate), 0.0)
        else:
            m = jnp.ones((e_al,), jnp.float32)
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
        mask2 = make_mask().reshape(e_al // 128, 128)
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
        mask2 = make_mask().reshape(e_al // 128, 128)

        dhs, de_sum8, da_src_part8 = _bwd_call(
            hs, h_tiles, dst2, mask2, a_src_r, a_dst_r, g_tiles, out_tiles, den,
            L.tile_of, L.is_last, nb, eb, n_tiles, n_chunks, hs_dtype, vma=vma,
        )
        de_sum = de_sum8.reshape(n_tiles, 8, nb)[:, 0, :]
        da_src_part = da_src_part8.reshape(n_tiles, 8, d)[:, 0, :]
        # transpose reduce: dh[s] = sum over edges with src s of dhs_e
        dhs_pad = jnp.concatenate([dhs, jnp.zeros((1, d), dhs.dtype)], axis=0)
        dhs_t = dhs_pad[L.t_perm]  # [E_al_t, D] permutation gather
        dh_nodes = _reduce_call(dhs_t, tdst2, L.t_tile_of, L.t_is_last, nb, eb, n_tiles, n_chunks_t, vma=vma)

        de_sum_nodes = de_sum.reshape(n_tiles * nb)[: n]
        dh = dh_nodes[:n] + de_sum_nodes[:, None] * a_dst_r[0][None, :]
        da_src = jnp.sum(da_src_part, axis=0, keepdims=True)
        da_dst = (de_sum_nodes[None, :] @ h_tiles[:n].astype(jnp.float32))
        return dh[:, None, :], da_src, da_dst

    attn.defvjp(attn_fwd, attn_bwd)
    return attn(h, a_src, a_dst)
