"""Negative sampling: exactness and distribution parity with sample_bpr_epoch."""
import numpy as np

import jax
import jax.numpy as jnp

from plotpointe_tpu.data.splits import build_node_maps, build_splits, padded_positives
from plotpointe_tpu.train.sampling import sample_bpr_triples, sample_eval_negatives


def _setup(tiny_dataset):
    u2i, i2i = build_node_maps(tiny_dataset)
    s = build_splits(tiny_dataset, u2i, i2i)
    table, deg = padded_positives(s)
    return s, jnp.asarray(table), jnp.asarray(deg)


def test_bpr_triples_valid(tiny_dataset):
    s, table, deg = _setup(tiny_dataset)
    train_users = jnp.asarray(np.flatnonzero(np.asarray(deg) > 0).astype(np.int32))
    u, i, j = sample_bpr_triples(jax.random.key(0), train_users, table, deg, s.n_items, 5000)
    u, i, j = np.asarray(u), np.asarray(i), np.asarray(j)

    assert ((u >= 0) & (u < s.n_users)).all()
    assert ((i >= 0) & (i < s.n_items)).all()
    assert ((j >= 0) & (j < s.n_items)).all()
    tbl = np.asarray(table)
    # every i is one of u's positives; NO j is a positive of u (exact scheme)
    assert (tbl[u] == i[:, None]).any(axis=1).all()
    assert not (tbl[u] == j[:, None]).any(axis=1).any()


def test_bpr_user_distribution_uniform(tiny_dataset):
    # reference samples users uniformly (random.choice(users)), not by degree
    s, table, deg = _setup(tiny_dataset)
    train_users = np.flatnonzero(np.asarray(deg) > 0).astype(np.int32)
    u, _, _ = sample_bpr_triples(jax.random.key(1), jnp.asarray(train_users), table, deg, s.n_items, 60_000)
    counts = np.bincount(np.asarray(u), minlength=s.n_users)[train_users]
    expected = 60_000 / len(train_users)
    assert counts.min() > 0
    assert abs(counts.mean() - expected) < 1e-6
    assert counts.std() < 5 * np.sqrt(expected)


def test_negative_distribution_uniform_over_complement():
    # one user with known positives; negatives must be exactly uniform over the rest
    n_items = 10
    table = jnp.asarray(np.array([[2, 5, 7, n_items]], dtype=np.int32))
    deg = jnp.asarray(np.array([3], dtype=np.int32))
    train_users = jnp.asarray(np.array([0], dtype=np.int32))
    _, _, j = sample_bpr_triples(jax.random.key(3), train_users, table, deg, n_items, 70_000)
    j = np.asarray(j)
    assert set(np.unique(j)) == {0, 1, 3, 4, 6, 8, 9}
    counts = np.bincount(j, minlength=n_items)[[0, 1, 3, 4, 6, 8, 9]]
    expected = 70_000 / 7
    assert (np.abs(counts - expected) < 5 * np.sqrt(expected)).all()


def test_eval_negatives_avoid_positives(tiny_dataset):
    s, table, deg = _setup(tiny_dataset)
    negs = sample_eval_negatives(
        jax.random.key(2), jnp.asarray(s.val_u), jnp.asarray(s.val_i), table, deg, s.n_items, 200
    )
    negs = np.asarray(negs)
    tbl = np.asarray(table)
    assert negs.shape == (len(s.val_u), 200)
    assert ((negs >= 0) & (negs < s.n_items)).all()
    for r in range(len(s.val_u)):
        u, pos = int(s.val_u[r]), int(s.val_i[r])
        assert pos not in negs[r]
        assert not np.isin(negs[r], tbl[u][tbl[u] < s.n_items]).any()


def test_eval_negatives_when_pos_already_in_train():
    # eval positive also a train positive: avoid set must not double-count
    n_items = 8
    table = jnp.asarray(np.array([[1, 3, n_items, n_items]], dtype=np.int32))
    deg = jnp.asarray(np.array([2], dtype=np.int32))
    negs = np.asarray(
        sample_eval_negatives(
            jax.random.key(4), jnp.asarray([0], dtype=jnp.int32), jnp.asarray([3], dtype=jnp.int32),
            table, deg, n_items, 4000,
        )
    )
    assert set(np.unique(negs)) == {0, 2, 4, 5, 6, 7}
