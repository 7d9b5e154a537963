"""Row-sharded embedding tables: lookups and gradients must match the dense
single-device table exactly, and the fully sharded LightGCN step must match
the single-device trainer math (SURVEY.md section 2.3 hard part #2)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plotpointe_tpu.graphs.csr import build_bipartite_graph, symmetric_normalized_weights
from plotpointe_tpu.models.gat import GATModel
from plotpointe_tpu.models.lightgcn import LightGCNModel
from plotpointe_tpu.parallel.mesh import make_mesh
from plotpointe_tpu.parallel.sharded_table import (
    device_put_row_sharded,
    lookup_batch_sharded,
    lookup_replicated,
    padded_rows,
)
from plotpointe_tpu.parallel.spmd import (
    make_sharded_gat_step,
    make_sharded_lightgcn_step,
    shard_graph_by_edges,
)
from plotpointe_tpu.train.losses import bpr_loss


@pytest.fixture(scope="module")
def mesh8(request):
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh({"data": 8}, devices=devs[:8])


@pytest.mark.multidevice
def test_lookup_replicated_matches_dense(mesh8, rng):
    n_rows, d = 203, 16  # deliberately not divisible by 8
    table = rng.normal(size=(n_rows, d)).astype(np.float32)
    ids = rng.integers(0, n_rows, 64).astype(np.int32)

    sharded = device_put_row_sharded(table, mesh8)
    assert sharded.shape[0] == padded_rows(n_rows, 8)
    got = lookup_replicated(mesh8, sharded, jnp.asarray(ids))
    np.testing.assert_array_equal(np.asarray(got), table[ids])


@pytest.mark.multidevice
def test_lookup_batch_sharded_matches_dense(mesh8, rng):
    n_rows, d, B = 203, 16, 64
    table = rng.normal(size=(n_rows, d)).astype(np.float32)
    ids = rng.integers(0, n_rows, B).astype(np.int32)

    sharded = device_put_row_sharded(table, mesh8)
    got = lookup_batch_sharded(mesh8, sharded, jnp.asarray(ids))
    np.testing.assert_array_equal(np.asarray(got), table[ids])


@pytest.mark.multidevice
def test_lookup_gradient_scatters_to_owner(mesh8, rng):
    """Grad of a loss over looked-up rows == dense scatter-add of upstream grads."""
    n_rows, d, B = 96, 8, 40
    table = rng.normal(size=(n_rows, d)).astype(np.float32)
    ids = rng.integers(0, n_rows, B).astype(np.int32)
    w = rng.normal(size=(B, d)).astype(np.float32)
    sharded = device_put_row_sharded(table, mesh8)

    def loss_sharded(t):
        return jnp.sum(lookup_replicated(mesh8, t, jnp.asarray(ids)) * w)

    got = np.asarray(jax.grad(loss_sharded)(sharded))[:n_rows]

    want = np.zeros_like(table)
    np.add.at(want, ids, w)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.multidevice
def test_sharded_lightgcn_step_matches_single(mesh8, rng):
    n_users, n_items = 60, 44
    tu = rng.integers(0, n_users, 400).astype(np.int32)
    ti = rng.integers(0, n_items, 400).astype(np.int32)
    g = build_bipartite_graph(tu, ti, n_users, n_items, pad_multiple=64)
    g = shard_graph_by_edges(g, 8)
    vals = symmetric_normalized_weights(g)

    model = LightGCNModel(n_users=n_users, n_items=n_items, embed_dim=16, n_prop_layers=3)
    params = model.init(jax.random.key(0))

    B = 64
    u = jnp.asarray(rng.integers(0, n_users, B).astype(np.int32))
    i = jnp.asarray(rng.integers(0, n_items, B).astype(np.int32))
    j = jnp.asarray(rng.integers(0, n_items, B).astype(np.int32))

    sharded_params = {
        "user_emb": device_put_row_sharded(params["user_emb"], mesh8),
        "item_emb": device_put_row_sharded(params["item_emb"], mesh8),
    }
    step = make_sharded_lightgcn_step(model, "bpr", mesh8, n_users, n_items)
    grads, loss = step(
        sharded_params, jnp.asarray(vals), jnp.asarray(g.src), jnp.asarray(g.dst), u, i, j
    )

    # single-device reference through the model's own apply
    gd = g.to_device()
    vals_d = jnp.asarray(vals)

    def ref_loss(p):
        z = model.apply(p, None, gd, norm_values=vals_d)
        U, I = z[:n_users], z[n_users:]
        return bpr_loss(jnp.sum(U[u] * I[i], -1), jnp.sum(U[u] * I[j], -1))

    want_loss, want_grads = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    for k, n_rows in (("user_emb", n_users), ("item_emb", n_items)):
        got = np.asarray(grads[k])[:n_rows]
        np.testing.assert_allclose(got, np.asarray(want_grads[k]), rtol=1e-4, atol=1e-6)
        # padding rows must receive zero gradient
        np.testing.assert_array_equal(np.asarray(grads[k])[n_rows:], 0.0)


@pytest.mark.multidevice
def test_sharded_gat_step_matches_single(mesh8, rng):
    """Fully sharded GAT step (row-sharded user table + edge-sharded attention
    + batch-sharded triples) must reproduce the single-device loss and grads,
    with pad-row gradients exactly zero."""
    n_users, n_items, feat_dim = 60, 44, 12
    tu = rng.integers(0, n_users, 400).astype(np.int32)
    ti = rng.integers(0, n_items, 400).astype(np.int32)
    g = build_bipartite_graph(tu, ti, n_users, n_items, pad_multiple=64)
    g = shard_graph_by_edges(g, 8)
    feats = jnp.asarray(rng.normal(size=(n_items, feat_dim)).astype(np.float32))

    model = GATModel(
        n_users=n_users, n_items=n_items, feat_dim=feat_dim, hidden_dim=16, n_layers=2
    )
    params = model.init(jax.random.key(0))

    B = 64
    u = jnp.asarray(rng.integers(0, n_users, B).astype(np.int32))
    i = jnp.asarray(rng.integers(0, n_items, B).astype(np.int32))
    j = jnp.asarray(rng.integers(0, n_items, B).astype(np.int32))

    sharded_params = dict(params)
    sharded_params["user_emb"] = device_put_row_sharded(params["user_emb"], mesh8)
    step = make_sharded_gat_step(model, "bpr", mesh8, n_users, n_items)
    masks = jnp.ones((model.n_layers, g.n_padded, model.heads), jnp.float32)
    grads, loss = step(
        sharded_params, feats, jnp.asarray(g.src), jnp.asarray(g.dst), masks, u, i, j
    )

    gd = g.to_device()

    def ref_loss(p):
        z = model.apply(p, feats, gd)
        U, I = z[:n_users], z[n_users:]
        return bpr_loss(jnp.sum(U[u] * I[i], -1), jnp.sum(U[u] * I[j], -1))

    want_loss, want_grads = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)

    got_ue = np.asarray(grads["user_emb"])
    np.testing.assert_allclose(
        got_ue[:n_users], np.asarray(want_grads["user_emb"]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_array_equal(got_ue[n_users:], 0.0)  # pad rows own no users
    np.testing.assert_allclose(
        np.asarray(grads["item_proj"]["w"]),
        np.asarray(want_grads["item_proj"]["w"]),
        rtol=1e-4,
        atol=1e-6,
    )
    for got_l, want_l in zip(grads["layers"], want_grads["layers"]):
        for k in got_l:
            np.testing.assert_allclose(
                np.asarray(got_l[k]), np.asarray(want_l[k]), rtol=1e-4, atol=1e-6
            )


@pytest.mark.multidevice
def test_lookup_batch_dedup_matches_dense(mesh8, rng):
    """Dedup all-to-all lookup == dense table[ids], duplicate-heavy batch."""
    from plotpointe_tpu.parallel.sharded_table import lookup_batch_dedup

    n_rows, d, B = 203, 16, 64
    table = rng.normal(size=(n_rows, d)).astype(np.float32)
    # heavy duplication: ids drawn from only 10 distinct rows
    pool = rng.choice(n_rows, 10, replace=False).astype(np.int32)
    ids = pool[rng.integers(0, 10, B)].astype(np.int32)

    sharded = device_put_row_sharded(table, mesh8)
    got = lookup_batch_dedup(mesh8, sharded, jnp.asarray(ids))
    np.testing.assert_array_equal(np.asarray(got), table[ids])

    # uniform ids too (no duplicates): same contract
    ids2 = rng.integers(0, n_rows, B).astype(np.int32)
    got2 = lookup_batch_dedup(mesh8, sharded, jnp.asarray(ids2))
    np.testing.assert_array_equal(np.asarray(got2), table[ids2])


@pytest.mark.multidevice
def test_lookup_batch_dedup_gradient(mesh8, rng):
    """Backward scatters dL/drow to the owning shard, duplicates summed."""
    from plotpointe_tpu.parallel.sharded_table import lookup_batch_dedup

    n_rows, d, B = 96, 8, 40
    table = rng.normal(size=(n_rows, d)).astype(np.float32)
    ids = rng.integers(0, 12, B).astype(np.int32)  # duplicates guaranteed
    w = rng.normal(size=(B, d)).astype(np.float32)
    sharded = device_put_row_sharded(table, mesh8)

    def loss_sharded(t):
        return jnp.sum(lookup_batch_dedup(mesh8, t, jnp.asarray(ids)) * w)

    got = np.asarray(jax.grad(loss_sharded)(sharded))[:n_rows]
    want = np.zeros_like(table)
    np.add.at(want, ids, w)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.multidevice
def test_lookup_batch_dedup_capacity_overflow(mesh8, rng):
    """Ids beyond unique_capacity read zeros (documented overflow contract)."""
    from plotpointe_tpu.parallel.sharded_table import lookup_batch_dedup

    n_rows, d, B = 64, 4, 16  # 2 ids per device shard
    table = rng.normal(size=(n_rows, d)).astype(np.float32)
    ids = np.arange(B, dtype=np.int32)  # all distinct -> 2 uniques per device
    sharded = device_put_row_sharded(table, mesh8)
    got = np.asarray(lookup_batch_dedup(mesh8, sharded, jnp.asarray(ids), unique_capacity=1))
    # per device: the smaller id survives, the larger overflows to zeros
    for dev in range(8):
        a, b = 2 * dev, 2 * dev + 1
        np.testing.assert_array_equal(got[a], table[ids[a]])
        np.testing.assert_array_equal(got[b], 0.0)


@pytest.mark.multidevice
def test_sharded_spmm_matches_single(mesh8, rng):
    """make_sharded_spmm (tile-sharded static Pallas SpMM + psum overlay)
    == the XLA golden spmm, forward and grad-wrt-x."""
    from plotpointe_tpu.ops.segment import spmm as spmm_ref
    from plotpointe_tpu.parallel.spmd import make_sharded_spmm

    n_users, n_items = 60, 44
    tu = rng.integers(0, n_users, 500).astype(np.int32)
    ti = rng.integers(0, n_items, 500).astype(np.int32)
    g = build_bipartite_graph(tu, ti, n_users, n_items).with_layout(nb=16, eb=128)
    vals = symmetric_normalized_weights(g)  # already padded-length
    gd = g.to_device()
    vals_pad = jnp.asarray(vals)

    for d in (64, 128):
        x = jnp.asarray(rng.normal(size=(g.n_nodes, d)).astype(np.float32))
        # overlay_dtype=None: bit-exact combine for reference parity (the
        # bf16-overlay default carries written-value quantization only and
        # gets its own loose-tolerance check below)
        op = make_sharded_spmm(mesh8, g, vals, nb=16, eb=128, xs_dtype=jnp.float32,
                               overlay_dtype=None)
        want = spmm_ref(gd, vals_pad, x)
        got = op(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

        ct = jnp.asarray(rng.normal(size=(g.n_nodes, d)).astype(np.float32))
        gx = jax.grad(lambda xx: (spmm_ref(gd, vals_pad, xx) * ct).sum())(x)
        gp = jax.grad(lambda xx: (op(xx) * ct).sum())(x)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-5)

        op_bf = make_sharded_spmm(mesh8, g, vals, nb=16, eb=128, xs_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(op_bf(x)), np.asarray(want),
                                   rtol=5e-2, atol=5e-2)
