"""SPMD training over a named mesh: edge-parallel message passing +
batch-parallel scoring + gradient all-reduce, via shard_map.

This is the framework's replacement for the reference's "no distributed
training of any kind" (SURVEY.md section 2.3), following the scaling-book
recipe: pick a mesh, shard the big axes, let collectives ride ICI.

Sharding layout (1-D "data" mesh):
  - node features / params: replicated (N x 128 @ Amazon scale is ~130 MB);
  - edges: contiguous chunks of the dst-sorted padded edge arrays, one chunk
    per device — each device computes partial per-destination softmax sums
    over its local edges, combined with two `psum`s per layer;
  - BPR triple batch: sharded; per-device partial losses psum-combined, so
    gradients arrive all-reduced and the optimizer step is replicated.

Correctness relies on the Graph layout invariants (csr.py): padding edges
point at the sentinel node, so equal-size per-device chunks need no masking.
"""
from __future__ import annotations

import functools
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

import dataclasses

from plotpointe_tpu.graphs.csr import AttentionLayout, Graph, build_graph
from plotpointe_tpu.ops.segment import EPS, LEAKY_SLOPE, LOGIT_CLAMP
from plotpointe_tpu.train.losses import LOSSES


def shard_graph_by_edges(graph: Graph, n_shards: int) -> Graph:
    """Re-pad the edge arrays so the padded count divides n_shards evenly
    (contiguous equal chunks -> P('data') sharding needs no masking)."""
    e_pad = graph.n_padded
    target = ((e_pad + n_shards - 1) // n_shards) * n_shards
    if target == e_pad:
        return graph
    extra = target - e_pad
    pad_i = np.full(extra, graph.n_nodes, dtype=np.int32)
    return Graph(
        src=np.concatenate([np.asarray(graph.src), pad_i]),
        dst=np.concatenate([np.asarray(graph.dst), pad_i]),
        weight=np.concatenate([np.asarray(graph.weight), np.zeros(extra, np.float32)]),
        row_ptr=np.asarray(graph.row_ptr),  # row_ptr covers only real edges + old pad; kernels use src/dst
        n_nodes=graph.n_nodes,
        n_edges=graph.n_edges,
    )


def _local_attention(h_pad, a_src, a_dst, src_l, dst_l, n_nodes, axis: str, mask_l=None):
    """One GAT attention layer over a local edge shard; psum-combined.
    h_pad: [N+1, H, D] replicated. mask_l: optional [E_loc, H] dropout mask
    (1/keep-scaled, applied to alpha AFTER normalization — reference semantics,
    `train_gat_custom.py:88-89`). Returns [N, H, D] replicated."""
    gs = jnp.einsum("nhd,hd->nh", h_pad, a_src)
    gd = jnp.einsum("nhd,hd->nh", h_pad, a_dst)
    e = gs[src_l] + gd[dst_l]
    e = jnp.where(e > 0, e, LEAKY_SLOPE * e)
    e = jnp.clip(e, -LOGIT_CLAMP, LOGIT_CLAMP)
    num = jnp.exp(e)

    denom_part = jax.ops.segment_sum(num, dst_l, num_segments=n_nodes + 1, indices_are_sorted=True)
    denom = jax.lax.psum(denom_part, axis)
    alpha = num / (denom[dst_l] + EPS)
    if mask_l is not None:
        alpha = alpha * mask_l

    msg = alpha[..., None] * h_pad[src_l]
    out_part = jax.ops.segment_sum(msg, dst_l, num_segments=n_nodes + 1, indices_are_sorted=True)
    out = jax.lax.psum(out_part, axis)
    return out[:n_nodes]


def sharded_attention(
    mesh: Mesh,
    h: jax.Array,  # [N, H, D]
    a_src: jax.Array,
    a_dst: jax.Array,
    graph: Graph,
    axis: str = "data",
) -> jax.Array:
    """Edge-parallel segment-softmax attention (forward primitive, used by
    tests and as the building block of the sharded train step)."""
    n = graph.n_nodes

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis)),
        out_specs=P(),
    )
    def f(h, a_s, a_d, src_l, dst_l):
        h_pad = jnp.concatenate([h, jnp.zeros((1,) + h.shape[1:], h.dtype)], axis=0)
        return _local_attention(h_pad, a_s, a_d, src_l, dst_l, n, axis)

    return f(h, a_src, a_dst, jnp.asarray(graph.src), jnp.asarray(graph.dst))


def shard_layout_by_tiles(graph: Graph, n_shards: int, nb: int = 256, eb: int = 1024) -> AttentionLayout:
    """Partition the graph's destination-node tiles into `n_shards` contiguous
    ranges (balanced by real edge count) and build one tile-aligned
    AttentionLayout per shard, padded to common sizes and stacked on a leading
    device axis. Shard `P('data')` on every leaf and feed to the fused
    sharded attention.

    Why tile ownership: every aligned chunk belongs to exactly one destination
    tile (csr.py AttentionLayout invariant), so a device owning a tile owns
    ALL of that destination's incoming edges — its in-kernel softmax
    denominators are already complete and per-device outputs combine with one
    psum, no cross-device denominator exchange. Destinations outside the
    shard produce exact zero rows (their tiles hold only sentinel-padding
    edges), so the psum is a pure overlay."""
    real_src = np.asarray(graph.src)[: graph.n_edges].astype(np.int64)
    real_dst = np.asarray(graph.dst)[: graph.n_edges].astype(np.int64)
    n = graph.n_nodes
    n_tiles = (n + 1 + nb - 1) // nb

    tile_of_edge = np.minimum(real_dst // nb, n_tiles - 1)
    counts = np.bincount(tile_of_edge, minlength=n_tiles)
    cum = np.concatenate([[0], np.cumsum(counts)])
    targets = (np.arange(1, n_shards) * (graph.n_edges / n_shards))
    bounds = np.concatenate([[0], np.searchsorted(cum, targets), [n_tiles]])
    bounds = np.maximum.accumulate(bounds).astype(np.int64)

    layouts = []
    for dv in range(n_shards):
        lo, hi = int(bounds[dv]), int(bounds[dv + 1])
        m = (tile_of_edge >= lo) & (tile_of_edge < hi)
        gl = build_graph(real_src[m], real_dst[m], n, pad_multiple=eb)
        lay = gl.with_layout(nb=nb, eb=eb).layout
        # remap pos from LOCAL filtered-edge positions to GLOBAL canonical edge
        # indices so consumers gathering global per-edge data by pos stay
        # correct (fill = graph.n_edges, matching the single-shard contract)
        idx_global = np.flatnonzero(m)
        local_pos = np.asarray(lay.pos).astype(np.int64)
        if gl.n_edges > 0:
            pos_global = np.where(
                local_pos < gl.n_edges,
                idx_global[np.minimum(local_pos, gl.n_edges - 1)],
                graph.n_edges,
            )
        else:
            pos_global = np.full(local_pos.shape, graph.n_edges, dtype=np.int64)
        local_tpos = np.asarray(lay.t_pos).astype(np.int64)
        if gl.n_edges > 0:
            tpos_global = np.where(
                local_tpos < gl.n_edges,
                idx_global[np.minimum(local_tpos, gl.n_edges - 1)],
                graph.n_edges,
            )
        else:
            tpos_global = np.full(local_tpos.shape, graph.n_edges, dtype=np.int64)
        lay = dataclasses.replace(lay, pos=pos_global.astype(np.int32),
                                  t_pos=tpos_global.astype(np.int32))
        layouts.append(lay)

    n_chunks = max(l.n_chunks for l in layouts)
    n_chunks_t = max(l.n_chunks_t for l in layouts)
    e_al, e_al_t = n_chunks * eb, n_chunks_t * eb

    def pad_stack(field, length, fill):
        rows = []
        for l in layouts:
            a = np.asarray(getattr(l, field))
            rows.append(np.concatenate([a, np.full(length - len(a), fill, a.dtype)]))
        return np.stack(rows)

    # appended pad chunks extend the SENTINEL tile (always the last tile in
    # every shard's chunk list, so tile order stays monotone); their edges are
    # sentinel padding (src=dst=n -> zero feature rows, onehot-miss in every
    # non-sentinel tile) and is_last=0 keeps the already-written output block
    # untouched. t_perm padding points past the forward edge list (the zero
    # gradient row).
    return AttentionLayout(
        src=pad_stack("src", e_al, n),
        dst=pad_stack("dst", e_al, n),
        pos=pad_stack("pos", e_al, graph.n_edges),
        tile_of=pad_stack("tile_of", n_chunks, n_tiles - 1),
        is_last=pad_stack("is_last", n_chunks, 0),
        t_dst=pad_stack("t_dst", e_al_t, n),
        t_src=pad_stack("t_src", e_al_t, n),
        t_pos=pad_stack("t_pos", e_al_t, graph.n_edges),
        t_perm=pad_stack("t_perm", e_al_t, e_al),
        t_tile_of=pad_stack("t_tile_of", n_chunks_t, n_tiles - 1),
        t_is_last=pad_stack("t_is_last", n_chunks_t, 0),
        nb=nb,
        eb=eb,
        n_tiles=int(n_tiles),
        tile_bounds=tuple(int(b) for b in bounds),
    )


def _local_graph(stacked: AttentionLayout, leaves, n_nodes: int, n_edges: int) -> Graph:
    """Materialize a shard-local Graph around the device-local layout leaves
    ([1, ...] blocks from shard_map; attention_v3 reads only .layout/.n_nodes)."""
    names = ("src", "dst", "pos", "tile_of", "is_last", "t_dst", "t_src", "t_pos", "t_perm", "t_tile_of", "t_is_last")
    lay = dataclasses.replace(stacked, **{k: v[0] for k, v in zip(names, leaves)})
    one = np.zeros(1, np.int32)
    return Graph(src=one, dst=one, weight=np.zeros(1, np.float32), row_ptr=np.zeros(2, np.int32),
                 n_nodes=n_nodes, n_edges=n_edges, layout=lay)


def _layout_leaves(stacked: AttentionLayout):
    return tuple(getattr(stacked, k) for k in
                 ("src", "dst", "pos", "tile_of", "is_last", "t_dst", "t_src", "t_pos", "t_perm", "t_tile_of", "t_is_last"))


def sharded_attention_fused(
    mesh: Mesh,
    h: jax.Array,  # [N, 1, D] replicated
    a_src: jax.Array,
    a_dst: jax.Array,
    graph: Graph,
    stacked: AttentionLayout,
    axis: str = "data",
    hs_dtype=jnp.bfloat16,
) -> jax.Array:
    """Edge-parallel fused-Pallas attention: each device runs attention_v3
    over its tile shard (complete in-shard softmax), outputs overlay via one
    psum. Forward primitive; the VJP shards the same way (attention_v3's
    custom backward runs per device, shard_map psums the replicated-h grads)."""
    n, n_e = graph.n_nodes, graph.n_edges

    # check_vma=False: Pallas scalar-prefetch index maps (to[i]) mix the
    # P(axis)-sharded layout leaves (vma-varying) with unvarying grid indices,
    # which jax 0.9's check_vma rejects inside dynamic_slice (and JAX's own
    # error message prescribes exactly this workaround). Unchecked semantics
    # mean WE are responsible for the collectives: the one psum below is the
    # overlay combine; there is no autodiff through this forward primitive.
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()) + (P(axis),) * 11,
        out_specs=P(),
        check_vma=False,
    )
    def f(h, a_s, a_d, *leaves):
        from plotpointe_tpu.ops.gat_fused import attention_v3

        g_l = _local_graph(stacked, leaves, n, n_e)
        return jax.lax.psum(attention_v3(h, a_s, a_d, g_l, hs_dtype=hs_dtype), axis)

    return f(h, a_src, a_dst, *_layout_leaves(stacked))


def _overlay_combiner(tile_bounds, n_shards: int, nb: int, n_rows: int,
                      axis: str, overlay_dtype):
    """One-writer-per-row overlay combine, shared by the fused GAT step and
    the sharded SpMM. With valid contiguous tile-partition bounds, the
    combine is an all_gather of each shard's OWNED rows — half the
    all_reduce's wire for the same payload, its autodiff transpose
    (psum_scatter) halves the backward cotangent wire identically, and
    non-owned output blocks are never read. Without bounds it falls back to
    the psum overlay (optionally at overlay_dtype — quantization-only,
    since other shards contribute exact zeros).

    Returns combine(o2 [n_rows, D], dev) -> [n_rows, D] f32 replicated."""
    tb = list(tile_bounds or ())
    gather = (n_shards > 1 and len(tb) == n_shards + 1 and tb == sorted(tb)
              and all(tb[i + 1] > tb[i] for i in range(n_shards)))
    los, his = (tb[:-1], tb[1:]) if gather else ([0] * n_shards, [0] * n_shards)
    max_rows = max((hi - lo) for lo, hi in zip(los, his)) * nb if gather else 0
    lo_rows = jnp.asarray([lo * nb for lo in los], jnp.int32)

    def combine(o2, dev):
        if not gather:
            if overlay_dtype is not None:
                o2 = o2.astype(overlay_dtype)
            return jax.lax.psum(o2, axis).astype(jnp.float32)
        dpad = o2.shape[1]
        pad_to = los[-1] * nb + max_rows  # static upper bound
        o2p = jnp.pad(o2, ((0, pad_to - n_rows), (0, 0)))
        sl = jax.lax.dynamic_slice(
            o2p, (jnp.take(lo_rows, dev), jnp.int32(0)), (max_rows, dpad))
        if overlay_dtype is not None:
            sl = sl.astype(overlay_dtype)
        gathered = jax.lax.all_gather(sl, axis, tiled=True)
        parts = [gathered[dv * max_rows: dv * max_rows + (his[dv] - los[dv]) * nb]
                 for dv in range(n_shards)]
        return jnp.concatenate(parts, axis=0)[:n_rows].astype(jnp.float32)

    return combine


def make_sharded_gat_step_fused(
    model,
    loss_name: str,
    mesh: Mesh,
    n_users: int,
    n_items: int,
    stacked: AttentionLayout,
    axis: str = "data",
    dropout_rate: float = 0.0,
    hs_dtype=jnp.bfloat16,
    overlay_dtype=jnp.bfloat16,
) -> Callable:
    """Fully sharded GAT training step on the fused Pallas kernels: the
    multi-chip counterpart of the single-chip flagship path (attn_impl=
    "pallas"), same sharding contract as make_sharded_gat_step — row-sharded
    user table, tile/edge-sharded attention, batch-sharded BPR triples —
    but every attention layer (forward and backward) runs ops/gat_fused
    attention_v3 on the device-local tile shard instead of XLA segment_sum.

    step(params, item_feats, rng, u, i, j) -> (grads, loss); heads must be 1
    (the fused flagship config). Dropout masks are drawn in-kernel per device
    from fold_in(rng, layer, device).

    overlay_dtype: dtype for the per-layer psum overlay payloads (None =
    keep f32, exact). DEFAULT bf16 — the flagship config: the overlay is
    one-writer-per-row (each destination tile is owned by exactly one
    device; other devices contribute exact zeros), so a bf16 psum loses
    ONLY the bf16 quantization of the written activation — no cross-device
    accumulation error — while halving the dominant wire traffic
    (scaling_audit: the per-layer [N,128] psums are ~90% of wire bytes;
    bf16 overlays lift the predicted 8-chip efficiency from ~79% to ~88%).
    Pass None for the bit-exact f32 overlay (parity tests)."""
    n_nodes = n_users + n_items
    n_shards = int(mesh.shape[axis])
    loss_fn_elem = LOSSES[loss_name]

    param_specs = {"user_emb": P(axis), "item_proj": P(), "layers": P()}
    # pre-place the stacked layout on the mesh ONCE; the jitted step takes the
    # leaves as ARGUMENTS (closure constants exceed remote-compile payload
    # limits at Amazon scale — see the same pattern in models/fusion.py).
    # put_sharded routes through make_array_from_process_local_data when the
    # mesh spans hosts (parallel/multihost.py) and device_put otherwise.
    from plotpointe_tpu.parallel.multihost import put_sharded

    leaves_dev = tuple(put_sharded(np.asarray(a), mesh, P(axis)) for a in _layout_leaves(stacked))
    graph_n_edges = 0  # attention_v3 reads only layout/n_nodes; n_edges is metadata

    # per-layer overlay combine: owned-rows all_gather when tile bounds are
    # available, psum fallback otherwise (see _overlay_combiner)
    _combine = _overlay_combiner(stacked.tile_bounds, n_shards, stacked.nb,
                                 n_nodes, axis, overlay_dtype)
    wire_dt = None if hs_dtype == jnp.float32 else jnp.bfloat16

    @jax.jit
    def _step(params, item_feats, rng, u, i, j, *leaves):
        # check_vma=False for the same Pallas scalar-prefetch reason as
        # sharded_attention_fused. Under unchecked semantics the grad
        # collectives are OUR job: the all_gather on user_emb still
        # transposes to psum_scatter (row-sharded, fully reduced), but
        # replicated-param grads (item_proj/layers) and the psum-overlay
        # cotangents need explicit psums — verified against the
        # single-device reference in tests/test_spmd.py.
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(param_specs, P(), P()) + (P(axis),) * 11 + (P(axis),) * 3,
            out_specs=(param_specs, P()),
            check_vma=False,
        )
        def inner(params, item_feats, rng, *rest):
            from plotpointe_tpu.ops.gat_fused import attention_v3

            lay_leaves, (u_l, i_l, j_l) = rest[:11], rest[11:]
            g_l = _local_graph(stacked, lay_leaves, n_nodes, graph_n_edges)
            dev = jax.lax.axis_index(axis)

            def gather_table(ue):
                if wire_dt is None:
                    return jax.lax.all_gather(ue, axis, tiled=True)

                # bf16 on the wire both ways (the fused kernels consume the
                # rows at bf16 anyway); the psum_scatter'd table grad is
                # bf16-rounded per contribution
                @jax.custom_vjp
                def ag(u):
                    return jax.lax.all_gather(u.astype(wire_dt), axis,
                                              tiled=True).astype(jnp.float32)

                def ag_fwd(u):
                    return ag(u), None

                def ag_bwd(_, g):
                    return (jax.lax.psum_scatter(
                        g.astype(wire_dt), axis, scatter_dimension=0,
                        tiled=True).astype(jnp.float32),)

                ag.defvjp(ag_fwd, ag_bwd)
                return ag(ue)

            def local_loss(p):
                ue = gather_table(p["user_emb"])[:n_users]
                v = item_feats @ p["item_proj"]["w"] + p["item_proj"]["b"]
                x = jnp.concatenate([ue, v], axis=0)
                for li, layer in enumerate(p["layers"]):
                    h = jnp.einsum("nf,fhd->nhd", x, layer["w"])  # [N, 1, D]
                    lrng = None
                    if dropout_rate > 0.0:
                        lrng = jax.random.fold_in(jax.random.fold_in(rng, li), dev)
                    out_l = attention_v3(h, layer["a_src"], layer["a_dst"], g_l,
                                         dropout_rate=dropout_rate, rng=lrng,
                                         hs_dtype=hs_dtype)
                    x = _combine(out_l[:, 0, :], dev)
                    if model.use_bias:
                        x = x + layer["b"]
                U, I = x[:n_users], x[n_users:]
                pos = jnp.sum(U[u_l] * I[i_l], axis=-1)
                neg = jnp.sum(U[u_l] * I[j_l], axis=-1)
                return loss_fn_elem(pos, neg) / n_shards

            loss_l, grads_l = jax.value_and_grad(local_loss)(params)
            grads = {
                "user_emb": grads_l["user_emb"],  # psum_scatter'd by the all_gather transpose
                "item_proj": jax.tree.map(lambda t: jax.lax.psum(t, axis), grads_l["item_proj"]),
                "layers": jax.tree.map(lambda t: jax.lax.psum(t, axis), grads_l["layers"]),
            }
            return grads, jax.lax.psum(loss_l, axis)

        return inner(params, item_feats, rng, *leaves, u, i, j)

    def step(params, item_feats, rng, u, i, j):
        return _step(params, item_feats, rng, u, i, j, *leaves_dev)

    return step


def make_sharded_lightgcn_step(
    model,
    loss_name: str,
    mesh: Mesh,
    n_users: int,
    n_items: int,
    axis: str = "data",
) -> Callable:
    """Fully sharded LightGCN training step: row-sharded embedding tables +
    edge-sharded propagation + batch-sharded BPR triples.

    The reference trains LightGCN on one GPU with full tables in device memory
    (`scripts/train_lightgcn.py:56-76`); here each chip holds 1/n of the user
    and item tables (parallel.sharded_table layout), all-gathers them into the
    propagation input once per step (ICI ring, [N, d] bf16-able), runs K SpMM
    rounds over its local edge shard with `psum` combination, and scores its
    local triple shard. Autodiff transposes the tiled all_gather into
    psum_scatter, so gradients arrive row-sharded on the owning device with no
    extra code — the optimizer update then runs shard-local.

    step(params, norm_values, src, dst, u, i, j) -> (grads, loss)
      params: {"user_emb": [Ru_pad, d], "item_emb": [Ri_pad, d]} row-sharded
      norm_values/src/dst: padded dst-sorted edge arrays, edge-sharded
      u/i/j: triple batch, batch-sharded; grads row-sharded, loss replicated.
    """
    n_nodes = n_users + n_items
    n_shards = int(mesh.shape[axis])
    loss_fn_elem = LOSSES[loss_name]
    k_layers = int(model.n_prop_layers)

    @jax.jit
    def step(params, norm_values, src, dst, u, i, j):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(axis),) * 8,
            out_specs=(P(axis), P()),
        )
        def inner(ue_l, ie_l, vals_l, src_l, dst_l, u_l, i_l, j_l):
            def local_loss(tables):
                ue_l, ie_l = tables
                ue = jax.lax.all_gather(ue_l, axis, tiled=True)[:n_users]
                ie = jax.lax.all_gather(ie_l, axis, tiled=True)[:n_items]
                x = jnp.concatenate([ue, ie], axis=0)
                acc = x
                out = x
                for _ in range(k_layers):
                    xp = jnp.concatenate([out, jnp.zeros((1, out.shape[1]), out.dtype)], axis=0)
                    msg = vals_l[:, None] * xp[src_l]
                    part = jax.ops.segment_sum(msg, dst_l, num_segments=n_nodes + 1, indices_are_sorted=True)
                    out = jax.lax.psum(part, axis)[:n_nodes]
                    acc = acc + out
                acc = acc / (k_layers + 1)
                U, I = acc[:n_users], acc[n_users:]
                pos = jnp.sum(U[u_l] * I[i_l], axis=-1)
                neg = jnp.sum(U[u_l] * I[j_l], axis=-1)
                # local mean / n_shards; summed across devices via the final psum
                return loss_fn_elem(pos, neg) / n_shards

            loss_l, (gu_l, gi_l) = jax.value_and_grad(local_loss)((ue_l, ie_l))
            return {"user_emb": gu_l, "item_emb": gi_l}, jax.lax.psum(loss_l, axis)

        return inner(params["user_emb"], params["item_emb"], norm_values, src, dst, u, i, j)

    return step


def make_sharded_gat_step(
    model,
    loss_name: str,
    mesh: Mesh,
    n_users: int,
    n_items: int,
    axis: str = "data",
) -> Callable:
    """Fully sharded GAT training step: row-sharded user embedding table +
    edge-sharded attention + batch-sharded BPR triples.

    Completes the sharding story for the GAT family (the reference's
    `nn.Embedding(n_users, 128)` user table, `scripts/train_gat_custom.py:100`,
    lives whole in one GPU's memory): here each chip owns 1/n of the user
    table rows (parallel.sharded_table layout). One tiled `all_gather` per
    step brings the table into the replicated node-feature concat; autodiff
    transposes it into a `psum_scatter`, so the user-table gradient arrives
    row-sharded on the owning chip, already reduced, and the Adam update for
    the big table runs shard-local. Item projection + attention parameters
    (a few hundred KB) stay replicated with all-reduced gradients.

    step(params, item_feats, src, dst, masks, u, i, j) -> (grads, loss)
      params["user_emb"]: [Ru_pad, H] row-sharded over `axis`
      (pad rows — ids >= n_users — receive zero gradient);
      params["item_proj"], params["layers"]: replicated;
      item_feats replicated; src/dst edge-sharded;
      masks: [L, E_pad, H] per-layer attention-dropout masks, edge-sharded
      (pass ones for eval / dropout 0); u/i/j batch-sharded.
      grads mirror the param shardings; loss replicated.
    """
    n_nodes = n_users + n_items
    n_shards = int(mesh.shape[axis])
    loss_fn_elem = LOSSES[loss_name]

    param_specs = {"user_emb": P(axis), "item_proj": P(), "layers": P()}

    @jax.jit
    def step(params, item_feats, src, dst, masks, u, i, j):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(param_specs, P(), P(axis), P(axis), P(None, axis), P(axis), P(axis), P(axis)),
            out_specs=(param_specs, P()),
        )
        def inner(params, item_feats, src_l, dst_l, masks_l, u_l, i_l, j_l):
            def local_loss(p):
                ue = jax.lax.all_gather(p["user_emb"], axis, tiled=True)[:n_users]
                v = item_feats @ p["item_proj"]["w"] + p["item_proj"]["b"]
                x = jnp.concatenate([ue, v], axis=0)
                for li, layer in enumerate(p["layers"]):
                    h = jnp.einsum("nf,fhd->nhd", x, layer["w"])
                    h_pad = jnp.concatenate(
                        [h, jnp.zeros((1,) + h.shape[1:], h.dtype)], axis=0
                    )
                    out = _local_attention(
                        h_pad, layer["a_src"], layer["a_dst"], src_l, dst_l, n_nodes, axis,
                        mask_l=masks_l[li],
                    )
                    x = out.mean(axis=1)
                    if model.use_bias:
                        x = x + layer["b"]
                U, I = x[:n_users], x[n_users:]
                pos = jnp.sum(U[u_l] * I[i_l], axis=-1)
                neg = jnp.sum(U[u_l] * I[j_l], axis=-1)
                # local mean / n_shards; summed across devices by the grad
                # transpose (user_emb: all_gather -> psum_scatter) and the
                # auto-inserted psum on replicated-param cotangents
                return loss_fn_elem(pos, neg) / n_shards

            loss_l, grads_l = jax.value_and_grad(local_loss)(params)
            return grads_l, jax.lax.psum(loss_l, axis)

        return inner(params, item_feats, src, dst, masks, u, i, j)

    return step


def make_sharded_train_step(
    model,
    loss_name: str,
    mesh: Mesh,
    n_users: int,
    n_items: int,
    axis: str = "data",
) -> Callable:
    """Build a jitted multi-device GAT training step.

    Returns step(params, item_feats, src, dst, u, i, j) -> (grads, loss) with
    edges and the triple batch sharded over `axis`, gradients all-reduced.
    (The optimizer update is pure elementwise and runs replicated outside.)
    """
    n_nodes = n_users + n_items
    loss_fn_elem = LOSSES[loss_name]

    def forward(params, item_feats, src_l, dst_l):
        x = model.node_features(params, item_feats)
        for layer in params["layers"]:
            h = jnp.einsum("nf,fhd->nhd", x, layer["w"])
            h_pad = jnp.concatenate([h, jnp.zeros((1,) + h.shape[1:], h.dtype)], axis=0)
            out = _local_attention(h_pad, layer["a_src"], layer["a_dst"], src_l, dst_l, n_nodes, axis)
            x = out.mean(axis=1)
            if model.use_bias:
                x = x + layer["b"]
        return x

    n_shards = int(mesh.shape[axis])

    @jax.jit
    def step(params, item_feats, src, dst, u, i, j):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
        )
        def inner(params, item_feats, src_l, dst_l, u_l, i_l, j_l):
            def local_loss(p):
                z = forward(p, item_feats, src_l, dst_l)
                U, I = z[:n_users], z[n_users:]
                pos = jnp.sum(U[u_l] * I[i_l], axis=-1)
                neg = jnp.sum(U[u_l] * I[j_l], axis=-1)
                # mean over the GLOBAL batch = local mean / n_shards, summed
                # across devices at the shard_map boundary
                return loss_fn_elem(pos, neg) / n_shards

            loss_l, grads_l = jax.value_and_grad(local_loss)(params)
            # NOTE: no explicit psum on grads. Under shard_map's varying-axes
            # typing (jax>=0.7 check_vma), the transpose of the internal psums
            # plus the replicated P() out_spec already insert the cross-device
            # reduction; an explicit psum here double-counts (verified against
            # the single-device reference in tests/test_spmd.py).
            return grads_l, jax.lax.psum(loss_l, axis)

        return inner(params, item_feats, src, dst, u, i, j)

    return step


def shard_spmm_weights(stacked: AttentionLayout, values: np.ndarray, n_edges: int, n_nodes: int):
    """Per-shard host-aligned SpMM weights over a tile-sharded layout.

    Returns numpy arrays stacked on the device axis:
      w2   [S, E_al/128, 128]  edge values in each shard's forward order
      w2_t [S, E_al_t/128,128] values in each shard's TRANSPOSE order
      t_src [S, E_al_t]        original dst (= transpose source) per t-pos
    Same construction as ops.spmm_kernel._host_aligned_values, vectorized
    over shards; `stacked.pos` already carries GLOBAL edge ids."""
    v = np.asarray(values, dtype=np.float32)[:n_edges]
    pos = np.asarray(stacked.pos).astype(np.int64)  # [S, E_al]
    w_al = np.where(pos < n_edges, v[np.minimum(pos, max(n_edges - 1, 0))], 0.0).astype(np.float32)
    if n_edges == 0:
        w_al[:] = 0.0
    e_al = w_al.shape[1]
    t_perm = np.asarray(stacked.t_perm).astype(np.int64)  # [S, E_al_t]
    w_pad = np.concatenate([w_al, np.zeros((w_al.shape[0], 1), np.float32)], axis=1)
    w_t = np.take_along_axis(w_pad, np.minimum(t_perm, e_al), axis=1)
    dst = np.asarray(stacked.dst)
    dst_pad = np.concatenate([dst, np.full((dst.shape[0], 1), n_nodes, dst.dtype)], axis=1)
    t_src = np.take_along_axis(dst_pad, np.minimum(t_perm, e_al), axis=1).astype(np.int32)
    return (
        w_al.reshape(w_al.shape[0], -1, 128),
        w_t.reshape(w_t.shape[0], -1, 128),
        t_src,
    )


def make_sharded_spmm(
    mesh: Mesh,
    graph: Graph,
    values: np.ndarray,
    axis: str = "data",
    nb: int = 256,
    eb: int = 1024,
    xs_dtype=jnp.bfloat16,
    overlay_dtype=jnp.bfloat16,
) -> Callable:
    """Multi-chip static SpMM operator: fn(x [N, F] replicated) -> y [N, F].

    The multi-chip counterpart of ops.spmm_kernel.make_spmm (LightGCN
    propagation): destination tiles are sharded across the mesh
    (shard_layout_by_tiles), each device runs the streaming weighted one-hot
    kernel over its shard (edge weights host-aligned once per shard), and the
    outputs combine with one psum overlay. The backward is the SAME kernel
    over each shard's transpose layout (dL/dx[s] = sum of local-edge
    contributions, psum across shards) — defined as a custom VJP over the
    two shard_maps, no XLA scatter anywhere.

    check_vma=False for the same Pallas scalar-prefetch reason as
    sharded_attention_fused; the single psum per direction is the overlay
    combine and the collectives are otherwise handled by this VJP."""
    from plotpointe_tpu.ops.spmm_kernel import _pad_cols, _round_up_128, _wreduce_call

    n, n_e = graph.n_nodes, graph.n_edges
    n_shards = int(mesh.shape[axis])
    stacked = shard_layout_by_tiles(graph, n_shards, nb=nb, eb=eb)
    w2_s, w2t_s, tsrc_s = shard_spmm_weights(stacked, values, n_e, n)

    from plotpointe_tpu.parallel.multihost import put_sharded

    _ps = lambda a: put_sharded(np.asarray(a), mesh, P(axis))  # noqa: E731 - multiprocess-safe
    src_s = _ps(stacked.src)
    dst2_s = _ps(np.asarray(stacked.dst).reshape(n_shards, -1, 128))
    tile_of_s = _ps(stacked.tile_of)
    is_last_s = _ps(stacked.is_last)
    tdst2_s = _ps(np.asarray(stacked.t_dst).reshape(n_shards, -1, 128))
    t_tile_of_s = _ps(stacked.t_tile_of)
    t_is_last_s = _ps(stacked.t_is_last)
    w2_d = _ps(w2_s)
    w2t_d = _ps(w2t_s)
    tsrc_d = _ps(tsrc_s)
    n_tiles = stacked.n_tiles
    n_chunks = stacked.src.shape[1] // eb
    n_chunks_t = stacked.t_dst.shape[1] // eb

    _combine = _overlay_combiner(getattr(stacked, "tile_bounds", ()), n_shards,
                                 nb, n, axis, overlay_dtype)

    def _dir_call(x, idx_l, w2_l, dst2_l, to_l, il_l, nc, fwd):
        d = x.shape[1]
        xp = jnp.concatenate([x, jnp.zeros((1, d), x.dtype)], axis=0)
        xs = _pad_cols(xp, _round_up_128(d)).astype(xs_dtype)[idx_l]
        out = _wreduce_call(xs, w2_l, dst2_l, to_l, il_l, nb, eb, n_tiles, nc)
        o = out[:n, :d]
        if not fwd:
            # the TRANSPOSE direction is a REAL cross-shard reduction (every
            # shard holds edges into any src node), not a one-writer overlay
            # — it stays f32 so partial sums never accumulate in bf16
            return jax.lax.psum(o, axis).astype(jnp.float32)
        return _combine(o, jax.lax.axis_index(axis))

    fwd_specs = (P(), P(axis), P(axis), P(axis), P(axis), P(axis))

    @functools.partial(shard_map, mesh=mesh, in_specs=fwd_specs, out_specs=P(),
                       check_vma=False)
    def _fwd_sh(x, src_l, w2_l, dst2_l, to_l, il_l):
        return _dir_call(x, src_l[0], w2_l[0], dst2_l[0], to_l[0], il_l[0], n_chunks, True)

    @functools.partial(shard_map, mesh=mesh, in_specs=fwd_specs, out_specs=P(),
                       check_vma=False)
    def _bwd_sh(g, tsrc_l, w2t_l, tdst2_l, to_l, il_l):
        return _dir_call(g, tsrc_l[0], w2t_l[0], tdst2_l[0], to_l[0], il_l[0], n_chunks_t, False)

    @jax.custom_vjp
    def op(x):
        return _fwd_sh(x, src_s, w2_d, dst2_s, tile_of_s, is_last_s)

    def op_fwd(x):
        return op(x), None

    def op_bwd(_, g):
        return (_bwd_sh(g, tsrc_d, w2t_d, tdst2_s, t_tile_of_s, t_is_last_s),)

    op.defvjp(op_fwd, op_bwd)
    return op
