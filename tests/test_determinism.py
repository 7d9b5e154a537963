"""Determinism: same seeds -> identical results across the stack
(analog of the reference's tests/test_determinism.py, extended to training)."""
import numpy as np

import jax

from plotpointe_tpu.utils.prng import host_rng, key_seq, set_seeds


def test_seeding_reproducibility():
    k1 = set_seeds(42)
    a1 = np.random.rand(5)
    j1 = jax.random.normal(k1, (4,))
    k2 = set_seeds(42)
    a2 = np.random.rand(5)
    j2 = jax.random.normal(k2, (4,))
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(np.asarray(j1), np.asarray(j2))


def test_key_seq_distinct_and_reproducible():
    root = jax.random.key(7)
    s1 = [np.asarray(jax.random.normal(k, ())) for _, k in zip(range(4), key_seq(root))]
    s2 = [np.asarray(jax.random.normal(k, ())) for _, k in zip(range(4), key_seq(root))]
    np.testing.assert_array_equal(s1, s2)
    assert len({float(x) for x in s1}) == 4  # all distinct


def test_training_bitwise_deterministic():
    from plotpointe_tpu.config import TrainConfig
    from plotpointe_tpu.data.splits import build_node_maps, build_splits
    from plotpointe_tpu.data.synthetic import synthetic_features, synthetic_interactions
    from plotpointe_tpu.graphs.csr import build_bipartite_graph
    from plotpointe_tpu.models.gat import GATModel
    from plotpointe_tpu.train.trainer import Trainer

    df = synthetic_interactions(n_users=100, n_items=80, n_interactions=1500, seed=5)
    u2i, i2i = build_node_maps(df)
    s = build_splits(df, u2i, i2i)
    feats = synthetic_features(s.n_items, 16, seed=5)
    g = build_bipartite_graph(s.train_u, s.train_i, s.n_users, s.n_items, pad_multiple=256)
    cfg = TrainConfig(epochs=2, samples_per_epoch=2000, eval_neg_k=20, eval_chunk=64, hidden_dim=16)

    results = []
    for _ in range(2):
        model = GATModel(n_users=s.n_users, n_items=s.n_items, feat_dim=16, hidden_dim=16, n_layers=1)
        tr = Trainer(model, cfg, g, s, item_feats=feats)
        r = tr.fit(jax.random.key(0))
        results.append(r)
    assert results[0]["history"][0]["loss"] == results[1]["history"][0]["loss"]
    assert results[0]["test"] == results[1]["test"]


def test_host_rng_isolated():
    r1, r2 = host_rng(3), host_rng(3)
    np.testing.assert_array_equal(r1.integers(0, 100, 10), r2.integers(0, 100, 10))
