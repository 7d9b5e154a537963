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

from plotpointe_tpu.graphs.csr import Graph
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
