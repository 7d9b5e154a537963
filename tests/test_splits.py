"""Split semantics: vectorized implementation vs a brute-force dict reference
(mirroring train_gat_custom.py:141-163)."""
import numpy as np
import pandas as pd

from plotpointe_tpu.data.splits import build_node_maps, build_splits, padded_positives


def _brute_force_splits(interactions):
    by_user = interactions.sort_values("ts", kind="stable").groupby("user_id", sort=False)
    train_pos, val_pos, test_pos = {}, {}, {}
    for u, g in by_user:
        items = g["asin"].values
        if len(items) >= 3:
            train_pos[u] = list(items[:-2])
            val_pos[u] = items[-2]
            test_pos[u] = items[-1]
        elif len(items) >= 2:
            train_pos[u] = list(items[:-1])
            test_pos[u] = items[-1]
    return train_pos, val_pos, test_pos


def test_splits_match_reference_semantics(tiny_dataset):
    df = tiny_dataset
    u2i, i2i = build_node_maps(df)
    s = build_splits(df, u2i, i2i)
    ref_train, ref_val, ref_test = _brute_force_splits(df)

    # test split: one row per user with >=2 interactions
    assert len(s.test_u) == len(ref_test)
    got_test = {int(u): int(i) for u, i in zip(s.test_u, s.test_i)}
    for u_raw, item_raw in ref_test.items():
        assert got_test[u2i[u_raw]] == i2i[item_raw]

    got_val = {int(u): int(i) for u, i in zip(s.val_u, s.val_i)}
    assert len(got_val) == len(ref_val)
    for u_raw, item_raw in ref_val.items():
        assert got_val[u2i[u_raw]] == i2i[item_raw]

    # train rows per user
    got_train = {}
    for u, i in zip(s.train_u, s.train_i):
        got_train.setdefault(int(u), []).append(int(i))
    assert set(got_train) == {u2i[u] for u in ref_train}
    for u_raw, items in ref_train.items():
        assert sorted(got_train[u2i[u_raw]]) == sorted(i2i[x] for x in items)


def test_single_interaction_users_dropped():
    df = pd.DataFrame(
        {
            "user_id": ["a", "a", "a", "b", "b", "c"],
            "asin": ["x", "y", "z", "x", "y", "z"],
            "rating": [5.0] * 6,
            "ts": [1, 2, 3, 5, 4, 9],
        }
    )
    u2i, i2i = build_node_maps(df)
    s = build_splits(df, u2i, i2i)
    # a: train=[x], val=y, test=z ; b: ts-sorted -> train=[y], test=x ; c: dropped
    assert s.n_users == 3 and s.n_items == 3
    assert len(s.val_u) == 1 and s.val_u[0] == u2i["a"] and s.val_i[0] == i2i["y"]
    test_map = {int(u): int(i) for u, i in zip(s.test_u, s.test_i)}
    assert test_map == {u2i["a"]: i2i["z"], u2i["b"]: i2i["x"]}
    train_map = {int(u): int(i) for u, i in zip(s.train_u, s.train_i)}
    assert train_map == {u2i["a"]: i2i["x"], u2i["b"]: i2i["y"]}


def test_padded_positives_membership(tiny_dataset):
    df = tiny_dataset
    u2i, i2i = build_node_maps(df)
    s = build_splits(df, u2i, i2i)
    table, deg = padded_positives(s)
    assert table.shape[0] == s.n_users
    # every train positive is present in its user's row
    for u, i in zip(s.train_u[:500], s.train_i[:500]):
        assert i in table[u]
    # degree matches row fill
    fill = (np.asarray(table) < s.n_items).sum(axis=1)
    np.testing.assert_array_equal(fill, np.minimum(deg, table.shape[1]))
