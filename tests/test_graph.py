"""Graph layout invariants: dst-sorted, CSR correctness, sentinel padding,
symmetric bipartite construction, normalized weights."""
import numpy as np

from plotpointe_tpu.data.splits import build_node_maps, build_splits
from plotpointe_tpu.graphs.csr import (
    build_bipartite_graph,
    build_graph,
    degrees,
    symmetric_normalized_weights,
)


def test_graph_layout_invariants():
    src = np.array([0, 2, 1, 3, 0, 2])
    dst = np.array([1, 0, 3, 1, 2, 2])
    g = build_graph(src, dst, n_nodes=4, pad_multiple=8)
    assert g.n_padded == 8 and g.n_edges == 6
    d = np.asarray(g.dst)
    assert (np.diff(d) >= 0).all()  # dst-sorted (sentinel 4 sorts last)
    assert (d[6:] == 4).all() and (np.asarray(g.src)[6:] == 4).all()
    rp = np.asarray(g.row_ptr)
    # CSR: edges for node n live in [rp[n], rp[n+1])
    for n in range(4):
        seg = d[rp[n] : rp[n + 1]]
        assert (seg == n).all()
    assert rp[-1] == 8


def test_bipartite_symmetric():
    tu = np.array([0, 1, 2])
    ti = np.array([0, 0, 1])
    g = build_bipartite_graph(tu, ti, n_users=3, n_items=2, pad_multiple=8)
    assert g.n_edges == 6
    pairs = {(int(s), int(d)) for s, d in zip(g.src[: g.n_edges], g.dst[: g.n_edges])}
    expected = set()
    for u, i in zip(tu, ti):
        expected.add((u, 3 + i))
        expected.add((3 + i, u))
    assert pairs == expected
    deg = degrees(g)
    np.testing.assert_array_equal(deg, [1, 1, 1, 2, 1])


def test_symmetric_normalized_weights_rowsum():
    tu = np.array([0, 1, 2, 2])
    ti = np.array([0, 0, 1, 0])
    g = build_bipartite_graph(tu, ti, n_users=3, n_items=2, pad_multiple=8)
    vals = symmetric_normalized_weights(g)
    # padding weights are zero
    assert (vals[g.n_edges :] == 0).all()
    # for edge (s->d): v = 1/sqrt(deg_s * deg_d); check one known value
    src, dst = np.asarray(g.src), np.asarray(g.dst)
    deg = degrees(g).astype(np.float64)
    for e in range(g.n_edges):
        expect = 1.0 / np.sqrt(deg[src[e]] * deg[dst[e]])
        np.testing.assert_allclose(vals[e], expect, rtol=1e-6)


def test_end_to_end_graph_from_splits(tiny_dataset):
    df = tiny_dataset
    u2i, i2i = build_node_maps(df)
    s = build_splits(df, u2i, i2i)
    g = build_bipartite_graph(s.train_u, s.train_i, s.n_users, s.n_items, weight=s.train_w)
    assert g.n_edges == 2 * s.n_train
    assert g.n_nodes == s.n_users + s.n_items
    # all edges valid node ids; weights symmetric copies
    assert np.asarray(g.src)[: g.n_edges].max() < g.n_nodes


def test_gat_model_head_mean_parity(rng, tiny_dataset):
    # heads=H output equals the mean of per-head single-head attention outputs
    import jax
    import jax.numpy as jnp

    from plotpointe_tpu.models.gat import GATModel
    from plotpointe_tpu.ops.segment import segment_softmax_attention

    df = tiny_dataset
    u2i, i2i = build_node_maps(df)
    s = build_splits(df, u2i, i2i)
    g = build_bipartite_graph(s.train_u, s.train_i, s.n_users, s.n_items, pad_multiple=256).to_device()
    feats = jnp.asarray(rng.normal(size=(s.n_items, 12)).astype("float32"))

    model = GATModel(n_users=s.n_users, n_items=s.n_items, feat_dim=12, hidden_dim=16, n_layers=1, heads=2)
    params = model.init(jax.random.key(0))
    out = model.apply(params, feats, g)

    x = model.node_features(params, feats)
    layer = params["layers"][0]
    h = jnp.einsum("nf,fhd->nhd", x, layer["w"])
    per_head = []
    for hd in range(2):
        o = segment_softmax_attention(
            h[:, hd : hd + 1, :], layer["a_src"][hd : hd + 1], layer["a_dst"][hd : hd + 1], g
        )
        per_head.append(o[:, 0, :])
    want = (per_head[0] + per_head[1]) / 2
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_gat_model_head_mean_parity_pallas(rng, tiny_dataset):
    """Same head-mean parity but through the Pallas dispatch (layout graph,
    attn_impl='pallas', hidden % 128 == 0) vs the XLA golden model."""
    import jax
    import jax.numpy as jnp

    from plotpointe_tpu.models.gat import GATModel

    df = tiny_dataset
    u2i, i2i = build_node_maps(df)
    s = build_splits(df, u2i, i2i)
    g = build_bipartite_graph(
        s.train_u, s.train_i, s.n_users, s.n_items, pad_multiple=256
    ).with_layout().to_device()
    feats = jnp.asarray(rng.normal(size=(s.n_items, 12)).astype("float32"))

    kw = dict(n_users=s.n_users, n_items=s.n_items, feat_dim=12, hidden_dim=128,
              n_layers=1, heads=2, attn_dropout=0.0)
    m_pallas = GATModel(**kw, attn_impl="pallas")
    m_xla = GATModel(**kw, attn_impl="xla")
    params = m_pallas.init(jax.random.key(0))

    got = np.asarray(m_pallas.apply(params, feats, g))
    want = np.asarray(m_xla.apply(params, feats, g))
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.9999  # bf16 kernel path
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=6e-2)
