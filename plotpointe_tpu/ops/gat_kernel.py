"""Pallas TPU kernel: fused segment reduction for GAT attention.

Replaces the CUDA scatter primitives at the heart of the reference
(`train_gat_custom.py:86-92`: scatter_add_ denominator + index_add_
aggregation). Design (TPU-first, not a CUDA translation):

Phase A (XLA, cheap): per-node attention scalars gs/gd, per-edge logits from
scalar gathers, segment-sum denominator over [E, H] (13 MB class traffic),
normalized alpha with optional dropout, and the [E, H*D] source-feature
gather hs = h[src].

Phase B (this kernel): out[d] = sum_{e: dst_e = d} alpha_e * hs_e.
XLA would materialize the [E, H*D] weighted-message array in HBM
(write + re-read ~2x1.7 GB at Amazon scale) and lower the scatter-add
separately. The kernel instead streams hs exactly once and turns the scatter
into an MXU matmul: for each destination-node tile (NB nodes) and each
EB-edge chunk of its dst-sorted edge range, build the one-hot incidence
matrix onehot[r, e] = (dst_e == tile_start + r) and accumulate

    out_tile += onehot @ (alpha * hs_chunk)      # [NB,EB] @ [EB,HD] on MXU

Edges are dst-sorted (graphs/csr.py), so each tile's edges are contiguous;
chunk offsets come in via scalar prefetch (Graph.with_tiling). Chunks shared
with neighbouring tiles are re-read and masked by the one-hot compare, so no
alignment between tiles and chunks is needed. The output block index depends
only on the tile coordinate, so Pallas keeps the accumulator resident in VMEM
across the chunk loop and writes each output tile to HBM exactly once.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from plotpointe_tpu.graphs.csr import Graph
from plotpointe_tpu.ops import segment as _seg


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _reduce_kernel(nb: int, eb: int, hd: int, n_eblocks: int):
    """Kernel body factory. Grid = (T, C); block shapes:
    w_ref: (eb//128, 128) edge weights; d_ref: (eb//128, 128) int32 dst ids;
    hs_ref: (eb, hd) gathered source features; out_ref: (nb, hd)."""

    def kernel(cb_ref, w_ref, d_ref, hs_ref, out_ref):
        t = pl.program_id(0)
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # the index_map clamps cb[t]+c to the last block; skip those duplicate
        # re-reads (they would double-count the final chunk's edges)
        @pl.when(cb_ref[t] + c < n_eblocks)
        def _():
            dst = d_ref[:].reshape(1, eb)  # [1, EB]
            w = w_ref[:].reshape(1, eb)  # [1, EB]
            rows = jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0) + t * nb
            onehot = jnp.where(rows == dst, w, 0.0)  # weighted incidence [NB, EB]
            out_ref[:] += jnp.dot(onehot, hs_ref[:], preferred_element_type=jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "eb", "n_tiles", "c_max"))
def _fused_segment_reduce(
    weights: jax.Array,  # [E_pad] f32, alpha (normalized, dropout applied)
    dst: jax.Array,  # [E_pad] int32
    hs: jax.Array,  # [E_pad, HD] f32
    chunk_base: jax.Array,  # [n_tiles] int32
    nb: int,
    eb: int,
    n_tiles: int,
    c_max: int,
) -> jax.Array:
    e_pad, hd = hs.shape
    n_eblocks = e_pad // eb
    w2 = weights.reshape(e_pad // 128, 128)
    d2 = dst.reshape(e_pad // 128, 128)
    sub = eb // 128  # sublanes per chunk for the edge-scalar arrays

    def eb_map(t, c, cb):
        return (jnp.minimum(cb[t] + c, n_eblocks - 1), 0)

    def escalar_map(t, c, cb):
        return (jnp.minimum(cb[t] + c, n_eblocks - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, c_max),
        in_specs=[
            pl.BlockSpec((sub, 128), escalar_map),
            pl.BlockSpec((sub, 128), escalar_map),
            pl.BlockSpec((eb, hd), eb_map),
        ],
        out_specs=pl.BlockSpec((nb, hd), lambda t, c, cb: (t, 0)),
    )

    out = pl.pallas_call(
        _reduce_kernel(nb, eb, hd, n_eblocks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * nb, hd), jnp.float32),
        interpret=jax.default_backend() == "cpu",  # tests run on the CPU mesh
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * c_max * nb * eb * hd,
            bytes_accessed=e_pad * hd * 4 + n_tiles * nb * hd * 4,
            transcendentals=0,
        ),
    )(chunk_base, w2, d2, hs)
    return out


# ---------------------------------------------------------------------------
# v2: single-pass fully fused layer (heads == 1 flagship path)
# ---------------------------------------------------------------------------


def _fused_layer_kernel(nb: int, eb: int, d: int, n_eblocks: int):
    """Grid = (T, C). Computes, for one dst tile across its edge chunks:
    logits from the gathered source rows + the tile's own dst rows, exp with
    the reference clamp, the per-destination denominator (in-tile: a dst's
    edges are fully inside its tile's chunk range), dropout-masked numerator
    aggregation via the weighted one-hot MXU matmul, and the final division —
    one streaming pass, no [E,*] intermediates in HBM."""

    def kernel(cb_ref, hs_ref, ht_ref, d_ref, m_ref, as_ref, ad_ref, out_ref, acc, den):
        t = pl.program_id(0)
        c = pl.program_id(1)
        n_chunks = pl.num_programs(1)

        @pl.when(c == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            den[:] = jnp.zeros_like(den)

        @pl.when(cb_ref[t] + c < n_eblocks)
        def _():
            hs = hs_ref[:].astype(jnp.float32)  # [EB, D]
            gs = jnp.sum(hs * as_ref[0][None, :], axis=1)  # [EB]
            gd_tile = jnp.sum(ht_ref[:].astype(jnp.float32) * ad_ref[0][None, :], axis=1)  # [NB]

            dst = d_ref[:].reshape(1, eb)  # [1, EB] global dst ids
            rows = jax.lax.broadcasted_iota(jnp.int32, (nb, eb), 0) + t * nb
            onehot = rows == dst  # [NB, EB]

            gd = jnp.sum(jnp.where(onehot, gd_tile[:, None], 0.0), axis=0)  # [EB]
            e = gs + gd
            e = jnp.where(e > 0, e, 0.2 * e)
            e = jnp.clip(e, -10.0, 10.0)
            num = jnp.exp(e)  # [EB]
            num_masked = num * m_ref[:].reshape(eb)  # dropout mask (1/keep-scaled or ones)

            den[0, :] += jnp.sum(jnp.where(onehot, num[None, :], 0.0), axis=1)  # [NB]
            w = jnp.where(onehot, num_masked[None, :], 0.0)  # [NB, EB]
            acc[:] += jnp.dot(w, hs_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32)

        @pl.when(c == n_chunks - 1)
        def _():
            out_ref[:] = acc[:] / (den[0, :][:, None] + 1e-9)

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "eb", "n_tiles", "c_max"))
def _fused_layer(
    hs: jax.Array,  # [E_pad, D] bf16 gathered source rows
    h_tiles: jax.Array,  # [n_tiles*NB, D] node features padded to tile multiple
    dst: jax.Array,  # [E_pad] int32
    mask: jax.Array,  # [E_pad] f32 dropout mask (ones when eval)
    a_src: jax.Array,  # [1, D]
    a_dst: jax.Array,  # [1, D]
    chunk_base: jax.Array,  # [n_tiles] int32
    nb: int,
    eb: int,
    n_tiles: int,
    c_max: int,
) -> jax.Array:
    e_pad, d = hs.shape
    n_eblocks = e_pad // eb
    d2 = dst.reshape(e_pad // 128, 128)
    m2 = mask.reshape(e_pad // 128, 128)
    sub = eb // 128

    def emap(t, c, cb):
        return (jnp.minimum(cb[t] + c, n_eblocks - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, c_max),
        in_specs=[
            pl.BlockSpec((eb, d), emap),  # hs
            pl.BlockSpec((nb, d), lambda t, c, cb: (t, 0)),  # h_tiles
            pl.BlockSpec((sub, 128), emap),  # dst
            pl.BlockSpec((sub, 128), emap),  # mask
            pl.BlockSpec((1, d), lambda t, c, cb: (0, 0)),  # a_src
            pl.BlockSpec((1, d), lambda t, c, cb: (0, 0)),  # a_dst
        ],
        out_specs=pl.BlockSpec((nb, d), lambda t, c, cb: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((nb, d), jnp.float32),
            pltpu.VMEM((8, nb), jnp.float32),
        ],
    )

    return pl.pallas_call(
        _fused_layer_kernel(nb, eb, d, n_eblocks),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * nb, d), jnp.float32),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * c_max * nb * eb * d,
            bytes_accessed=e_pad * d * 2 + n_tiles * nb * d * 4,
            transcendentals=n_tiles * c_max * eb,
        ),
    )(chunk_base, hs, h_tiles, d2, m2, a_src, a_dst)


def segment_softmax_attention_pallas(
    h: jax.Array,  # [N, H, D]
    a_src: jax.Array,  # [H, D]
    a_dst: jax.Array,  # [H, D]
    graph: Graph,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Same contract as ops.segment.segment_softmax_attention (impl='xla');
    forward aggregation runs through the fused Pallas kernels. Dispatch:
    aligned layout -> v3 (fully fused fwd+bwd, feature dim lane-padded to 128
    when needed — covers the reference's hidden-dim ablations,
    ops/gat_fused.py; heads > 1 run one independent fused pass per head —
    heads are embarrassingly parallel in GAT, so H kernel launches keep full
    MXU tiles with zero cross-head traffic, covering the reference's --heads
    flag, train_gat_pyg.py:203); heads == 1 with only v1/v2 tiling -> v2
    (fused fwd, XLA bwd); otherwise -> v1 (fused reduction only)."""
    n, heads, d = h.shape

    if graph.layout is not None:
        from plotpointe_tpu.ops.gat_fused import attention_v3

        # lane-pad the feature dim to the TPU lane width so the fused path
        # covers the reference's hidden-dim ablations (e.g. 64): zero feature
        # columns contribute 0 to the logits and slice away after
        d_al = ((d + 127) // 128) * 128
        if d_al != d:
            pad = ((0, 0), (0, 0), (0, d_al - d))
            h_p = jnp.pad(h, pad)
            a_s_p = jnp.pad(a_src, ((0, 0), (0, d_al - d)))
            a_d_p = jnp.pad(a_dst, ((0, 0), (0, d_al - d)))
        else:
            h_p, a_s_p, a_d_p = h, a_src, a_dst

        if heads == 1:
            out = attention_v3(h_p, a_s_p, a_d_p, graph, dropout_rate=dropout_rate, rng=rng)
            return out[..., :d]
        if heads <= 8:
            # head-packed fully fused fwd+bwd: ONE [E, H*D] gather stream
            # serves every head in both directions; per-head dropout mask
            # streams drawn inside (self-consistent fwd/bwd)
            from plotpointe_tpu.ops.gat_fused import attention_v3_mh

            return attention_v3_mh(h_p, a_s_p, a_d_p, graph,
                                   dropout_rate=dropout_rate, rng=rng)[..., :d]
        # heads > 8: per-head fused v3 passes (fwd+bwd), one independent
        # mask stream per head — keeps fwd/bwd mask self-consistency
        outs = [
            attention_v3(
                h_p[:, hi : hi + 1, :], a_s_p[hi : hi + 1], a_d_p[hi : hi + 1], graph,
                dropout_rate=dropout_rate,
                rng=jax.random.fold_in(rng, hi) if rng is not None else None,
            )
            for hi in range(heads)
        ]
        return jnp.concatenate(outs, axis=1)[..., :d]
    if graph.chunk_base is None:
        raise ValueError(
            "graph needs tiling metadata: call graph.with_layout() (or with_tiling()) before to_device()"
        )
    if heads == 1 and d % 128 == 0:
        return _attention_v2(h, a_src, a_dst, graph, dropout_rate, rng)
    return _attention_v1(h, a_src, a_dst, graph, dropout_rate, rng)


def _attention_v2(h, a_src, a_dst, graph: Graph, dropout_rate: float, rng):
    n, heads, d = h.shape
    nb, eb = graph.tile_nb, graph.tile_eb
    n_tiles = int(graph.chunk_base.shape[0])
    e_pad = graph.n_padded

    def fwd(h, a_src, a_dst, rng):
        h2 = h[:, 0, :]  # [N, D]
        hp = jnp.concatenate([h2, jnp.zeros((1, d), h2.dtype)], axis=0)  # sentinel row
        hs = hp.astype(jnp.bfloat16)[graph.src]  # cast FIRST, then gather (fast path)
        pad_rows = n_tiles * nb - (n + 1)
        h_tiles = jnp.concatenate([hp, jnp.zeros((pad_rows, d), hp.dtype)], axis=0)
        if dropout_rate > 0.0 and rng is not None:
            # identical mask stream to the XLA reference path ([E, H] bernoulli)
            keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, (e_pad, heads))
            mask = jnp.where(keep[:, 0], 1.0 / (1.0 - dropout_rate), 0.0)
        else:
            mask = jnp.ones((e_pad,), jnp.float32)
        out = _fused_layer(
            hs, h_tiles, graph.dst, mask, a_src.reshape(1, d), a_dst.reshape(1, d),
            graph.chunk_base, nb, eb, n_tiles, graph.c_max,
        )
        return out[:n][:, None, :]

    @jax.custom_vjp
    def attn(h, a_src, a_dst, rng):
        return fwd(h, a_src, a_dst, rng)

    def attn_fwd(h, a_src, a_dst, rng):
        return fwd(h, a_src, a_dst, rng), (h, a_src, a_dst, rng)

    def attn_bwd(res, g):
        h, a_src, a_dst, rng = res
        _, vjp = jax.vjp(
            lambda h_, as_, ad_: _seg.segment_softmax_attention(
                h_, as_, ad_, graph, dropout_rate=dropout_rate, rng=rng, impl="xla"
            ),
            h, a_src, a_dst,
        )
        dh, das, dad = vjp(g)
        return dh, das, dad, None

    attn.defvjp(attn_fwd, attn_bwd)
    return attn(h, a_src, a_dst, rng)


def _attention_v1(h, a_src, a_dst, graph: Graph, dropout_rate: float, rng):
    n, heads, d = h.shape

    def fwd_pallas(h, a_src, a_dst, rng):
        hp = jnp.concatenate([h, jnp.zeros((1, heads, d), h.dtype)], axis=0)
        gs = jnp.einsum("nhd,hd->nh", hp, a_src)
        gd = jnp.einsum("nhd,hd->nh", hp, a_dst)
        e = gs[graph.src] + gd[graph.dst]
        e = jnp.where(e > 0, e, _seg.LEAKY_SLOPE * e)
        e = jnp.clip(e, -_seg.LOGIT_CLAMP, _seg.LOGIT_CLAMP)
        num = jnp.exp(e)  # [E, H]
        denom = jax.ops.segment_sum(num, graph.dst, num_segments=n + 1, indices_are_sorted=True)
        alpha = num / (denom[graph.dst] + _seg.EPS)
        if dropout_rate > 0.0 and rng is not None:
            keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, alpha.shape)
            alpha = jnp.where(keep, alpha / (1.0 - dropout_rate), 0.0)

        hd_dim = heads * d
        hd_pad = _round_up(hd_dim, 128)
        hs = hp[graph.src].reshape(-1, hd_dim)  # [E, H*D]
        # fold per-head alpha into the feature lanes: a single per-edge weight
        # applies to the whole row only when heads == 1; for heads > 1
        # pre-scale hs per head and feed unit weights to the kernel.
        if heads == 1:
            w = alpha[:, 0]
        else:
            hs = (hs.reshape(-1, heads, d) * alpha[..., None]).reshape(-1, hd_dim)
            w = jnp.ones((graph.src.shape[0],), jnp.float32)
        if hd_pad != hd_dim:
            hs = jnp.pad(hs, ((0, 0), (0, hd_pad - hd_dim)))

        out = _fused_segment_reduce(
            w.astype(jnp.float32),
            graph.dst,
            hs.astype(jnp.float32),
            graph.chunk_base,
            graph.tile_nb,
            graph.tile_eb,
            int(graph.chunk_base.shape[0]),
            graph.c_max,
        )
        return out[:n, :hd_dim].reshape(n, heads, d)

    @jax.custom_vjp
    def attn(h, a_src, a_dst, rng):
        return fwd_pallas(h, a_src, a_dst, rng)

    def attn_fwd(h, a_src, a_dst, rng):
        return fwd_pallas(h, a_src, a_dst, rng), (h, a_src, a_dst, rng)

    def attn_bwd(res, g):
        h, a_src, a_dst, rng = res
        _, vjp = jax.vjp(
            lambda h_, as_, ad_: _seg.segment_softmax_attention(
                h_, as_, ad_, graph, dropout_rate=dropout_rate, rng=rng, impl="xla"
            ),
            h,
            a_src,
            a_dst,
        )
        dh, das, dad = vjp(g)
        return dh, das, dad, None

    attn.defvjp(attn_fwd, attn_bwd)
    return attn(h, a_src, a_dst, rng)
