"""Multi-device tests on the 8-device virtual CPU mesh: sharded attention and
the sharded train step must match single-device results exactly."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plotpointe_tpu.graphs.csr import build_bipartite_graph
from plotpointe_tpu.models.gat import GATModel
from plotpointe_tpu.ops.segment import segment_softmax_attention
from plotpointe_tpu.parallel.mesh import make_mesh, parse_mesh_shape
from plotpointe_tpu.parallel.spmd import (
    make_sharded_train_step,
    shard_graph_by_edges,
    sharded_attention,
)
from plotpointe_tpu.train.losses import bpr_loss


@pytest.fixture(scope="module")
def setup(request):
    rng = np.random.default_rng(0)
    n_users, n_items = 60, 40
    tu = rng.integers(0, n_users, 400).astype(np.int32)
    ti = rng.integers(0, n_items, 400).astype(np.int32)
    g = build_bipartite_graph(tu, ti, n_users, n_items, pad_multiple=64)
    g = shard_graph_by_edges(g, 8)
    feats = rng.normal(size=(n_items, 16)).astype(np.float32)
    model = GATModel(n_users=n_users, n_items=n_items, feat_dim=16, hidden_dim=16, n_layers=2)
    params = model.init(jax.random.key(0))
    return g, feats, model, params, (n_users, n_items)


def test_parse_mesh_shape():
    assert parse_mesh_shape("data:4,model:2") == {"data": 4, "model": 2}


@pytest.mark.multidevice
def test_sharded_attention_matches_single(devices8, setup):
    g, feats, model, params, _ = setup
    mesh = make_mesh({"data": 8}, devices=devices8)
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, 1, 16)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(1, 16)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(1, 16)).astype(np.float32))

    want = segment_softmax_attention(h, a_s, a_d, g.to_device())
    got = sharded_attention(mesh, h, a_s, a_d, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


@pytest.mark.multidevice
def test_sharded_train_step_matches_single(devices8, setup):
    g, feats, model, params, (n_users, n_items) = setup
    mesh = make_mesh({"data": 8}, devices=devices8)
    step = make_sharded_train_step(model, "bpr", mesh, n_users, n_items)

    rng = np.random.default_rng(2)
    B = 64
    u = jnp.asarray(rng.integers(0, n_users, B).astype(np.int32))
    i = jnp.asarray(rng.integers(0, n_items, B).astype(np.int32))
    j = jnp.asarray(rng.integers(0, n_items, B).astype(np.int32))
    feats_j = jnp.asarray(feats)

    grads, loss = step(params, feats_j, jnp.asarray(g.src), jnp.asarray(g.dst), u, i, j)

    # single-device reference
    gd = g.to_device()

    def ref_loss(p):
        z = model.apply(p, feats_j, gd)
        U, I = z[:n_users], z[n_users:]
        return bpr_loss(jnp.sum(U[u] * I[i], -1), jnp.sum(U[u] * I[j], -1))

    want_loss, want_grads = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads), jax.tree_util.tree_leaves(want_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


@pytest.mark.multidevice
def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.multidevice
def test_sharded_fused_attention_matches_single(devices8, setup):
    """Tile-sharded Pallas attention (one attention_v3 per device over its
    destination-tile shard + psum overlay) vs the XLA golden op."""
    from plotpointe_tpu.parallel.spmd import shard_layout_by_tiles, sharded_attention_fused

    g, feats, model, params, _ = setup
    mesh = make_mesh({"data": 8}, devices=devices8)
    stacked = shard_layout_by_tiles(g, 8, nb=8, eb=128)
    rng = np.random.default_rng(3)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, 1, 16)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(1, 16)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(1, 16)).astype(np.float32))

    want = segment_softmax_attention(h, a_s, a_d, g.to_device())
    got = sharded_attention_fused(mesh, h, a_s, a_d, g, stacked, hs_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


@pytest.mark.multidevice
def test_sharded_fused_gat_step_matches_single(devices8, setup):
    """Fused-kernel sharded GAT step: loss + grads must match the
    single-device XLA reference (dropout 0), pad-row user grads zero."""
    from plotpointe_tpu.parallel.sharded_table import device_put_row_sharded
    from plotpointe_tpu.parallel.spmd import make_sharded_gat_step_fused, shard_layout_by_tiles

    g, feats, model, params, (n_users, n_items) = setup
    mesh = make_mesh({"data": 8}, devices=devices8)
    stacked = shard_layout_by_tiles(g, 8, nb=8, eb=128)

    rng = np.random.default_rng(4)
    B = 64
    u = jnp.asarray(rng.integers(0, n_users, B).astype(np.int32))
    i = jnp.asarray(rng.integers(0, n_items, B).astype(np.int32))
    j = jnp.asarray(rng.integers(0, n_items, B).astype(np.int32))
    feats_j = jnp.asarray(feats)

    sharded_params = dict(params)
    sharded_params["user_emb"] = device_put_row_sharded(params["user_emb"], mesh)
    # overlay_dtype=None: the bit-exact combine for reference parity; the
    # bf16-overlay default is quality-checked separately below and by
    # test_sharded_trainer's fused fit test
    step = make_sharded_gat_step_fused(model, "bpr", mesh, n_users, n_items, stacked,
                                       hs_dtype=jnp.float32, overlay_dtype=None)
    grads, loss = step(sharded_params, feats_j, jax.random.key(9), u, i, j)

    gd = g.to_device()

    def ref_loss(p):
        z = model.apply(p, feats_j, gd)
        U, I = z[:n_users], z[n_users:]
        return bpr_loss(jnp.sum(U[u] * I[i], -1), jnp.sum(U[u] * I[j], -1))

    want_loss, want_grads = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    got_ue = np.asarray(grads["user_emb"])
    np.testing.assert_allclose(got_ue[:n_users], np.asarray(want_grads["user_emb"]), rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(got_ue[n_users:], 0.0)
    for got_l, want_l in zip(grads["layers"], want_grads["layers"]):
        for k in got_l:
            np.testing.assert_allclose(np.asarray(got_l[k]), np.asarray(want_l[k]), rtol=1e-4, atol=1e-5)

    # the flagship default (bf16 psum/gather overlays + bf16 table wire at
    # hs_dtype=bf16) carries only written-value quantization: loose parity
    step_bf = make_sharded_gat_step_fused(model, "bpr", mesh, n_users, n_items, stacked,
                                          hs_dtype=jnp.float32)
    grads_bf, loss_bf = step_bf(sharded_params, feats_j, jax.random.key(9), u, i, j)
    np.testing.assert_allclose(float(loss_bf), float(want_loss), rtol=5e-3)
    np.testing.assert_allclose(np.asarray(grads_bf["user_emb"])[:n_users],
                               np.asarray(want_grads["user_emb"]), atol=5e-4)

    # psum-overlay FALLBACK (a stacked layout without tile bounds — e.g. one
    # built before round 5): must match the gather-overlay exactly at f32
    import dataclasses as _dc

    stacked_nb = _dc.replace(stacked, tile_bounds=())
    step_fb = make_sharded_gat_step_fused(model, "bpr", mesh, n_users, n_items,
                                          stacked_nb, hs_dtype=jnp.float32,
                                          overlay_dtype=None)
    grads_fb, loss_fb = step_fb(sharded_params, feats_j, jax.random.key(9), u, i, j)
    np.testing.assert_allclose(float(loss_fb), float(loss), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grads_fb["user_emb"]),
                               np.asarray(grads["user_emb"]), rtol=1e-4, atol=1e-6)


@pytest.mark.multidevice
def test_sharded_fused_gat_step_bf16_overlay(devices8, setup):
    """overlay_dtype=bf16: the psum payloads halve (the dominant wire cost,
    tools/scaling_audit.py) and — because the overlay is one-writer-per-row —
    the loss deviates from the exact f32 step only by per-value bf16
    quantization, not accumulation error."""
    import jax.numpy as jnp

    from plotpointe_tpu.parallel.sharded_table import device_put_row_sharded
    from plotpointe_tpu.parallel.spmd import make_sharded_gat_step_fused, shard_layout_by_tiles

    g, feats, model, params, (n_users, n_items) = setup
    mesh = make_mesh({"data": 8}, devices=devices8)
    stacked = shard_layout_by_tiles(g, 8, nb=8, eb=128)
    rng = np.random.default_rng(4)
    B = 64
    u = jnp.asarray(rng.integers(0, n_users, B).astype(np.int32))
    i = jnp.asarray(rng.integers(0, n_items, B).astype(np.int32))
    j = jnp.asarray(rng.integers(0, n_items, B).astype(np.int32))
    feats_j = jnp.asarray(feats)
    sharded_params = dict(params)
    sharded_params["user_emb"] = device_put_row_sharded(params["user_emb"], mesh)

    # overlay_dtype=None pins the truly-exact combine (the builder DEFAULT
    # is bf16 since round 5 — omitting it here made this comparison vacuous)
    exact = make_sharded_gat_step_fused(model, "bpr", mesh, n_users, n_items, stacked,
                                        hs_dtype=jnp.float32, overlay_dtype=None)
    cheap = make_sharded_gat_step_fused(model, "bpr", mesh, n_users, n_items, stacked,
                                        hs_dtype=jnp.float32, overlay_dtype=jnp.bfloat16)
    _, loss_exact = exact(sharded_params, feats_j, jax.random.key(9), u, i, j)
    grads_b, loss_b = cheap(sharded_params, feats_j, jax.random.key(9), u, i, j)
    np.testing.assert_allclose(float(loss_b), float(loss_exact), rtol=5e-3)
    assert np.isfinite(np.asarray(grads_b["user_emb"])).all()


@pytest.mark.multidevice
def test_sharded_spmm_bf16_overlay(devices8, setup):
    import jax.numpy as jnp

    from plotpointe_tpu.graphs.csr import symmetric_normalized_weights
    from plotpointe_tpu.parallel.spmd import make_sharded_spmm

    g, feats, model, params, (n_users, n_items) = setup
    mesh = make_mesh({"data": 8}, devices=devices8)
    vals = symmetric_normalized_weights(g)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(g.n_nodes, 16)).astype(np.float32))
    exact = make_sharded_spmm(mesh, g, vals, nb=8, eb=128, xs_dtype=jnp.float32,
                              overlay_dtype=None)
    cheap = make_sharded_spmm(mesh, g, vals, nb=8, eb=128, xs_dtype=jnp.float32,
                              overlay_dtype=jnp.bfloat16)
    ye, yb = exact(x), cheap(x)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ye), rtol=1e-2, atol=1e-2)
