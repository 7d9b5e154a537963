"""Chronological leave-last-2 splits and node index maps — vectorized.

Split semantics match `scripts/train_gat_custom.py:141-163` exactly:
  per user, sorted by ts:  >=3 interactions -> train=[:-2], val=[-2], test=[-1]
                           ==2              -> train=[:-1], test=[-1] (no val)
                           <2               -> dropped entirely
Node maps match `graphs/build_ui_edges.py:49-57`: first-occurrence order of
unique user_ids / asins over the interactions table.

The reference builds these with Python dict loops over 1.69M rows; here it is
sort + segment arithmetic in numpy (O(n log n), no Python-level loops).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np


@dataclass
class Splits:
    """Index-space training data, in flat arrays (TPU-friendly layout).

    train_u/train_i: one row per train interaction (user idx, item idx, weight).
    val_u/val_i, test_u/test_i: one row per user that has that split.
    user_pos_padded: [n_train_users_total_padded? no — [n_users, max_deg]] is
    built separately by `padded_positives` (only for users that need it).
    """

    n_users: int
    n_items: int
    train_u: np.ndarray  # int32 [T]
    train_i: np.ndarray  # int32 [T]
    train_w: np.ndarray  # float32 [T] edge weight (rating-1)/4
    val_u: np.ndarray  # int32 [Nv]
    val_i: np.ndarray  # int32 [Nv]
    test_u: np.ndarray  # int32 [Nt]
    test_i: np.ndarray  # int32 [Nt]

    @property
    def n_train(self) -> int:
        return int(self.train_u.shape[0])


def build_node_maps(interactions) -> Tuple[Dict[str, int], Dict[str, int]]:
    """First-occurrence-order id maps (parity: graphs/build_ui_edges.py:49-57)."""
    import pandas as pd

    users = pd.unique(interactions["user_id"])
    items = pd.unique(interactions["asin"])
    return (
        {u: i for i, u in enumerate(users)},
        {a: i for i, a in enumerate(items)},
    )


def node_maps_json(user_to_idx: Dict[str, int], item_to_idx: Dict[str, int]) -> Dict:
    """node_maps.json contract (graphs/build_ui_edges.py:97-109)."""
    return {
        "user_to_idx": user_to_idx,
        "item_to_idx": item_to_idx,
        "idx_to_user": {idx: uid for uid, idx in user_to_idx.items()},
        "idx_to_item": {idx: iid for iid, idx in item_to_idx.items()},
        "n_users": len(user_to_idx),
        "n_items": len(item_to_idx),
    }


def build_splits(
    interactions,
    user_to_idx: Dict[str, int],
    item_to_idx: Dict[str, int],
) -> Splits:
    """Vectorized leave-last-2 chronological split in index space."""
    u = interactions["user_id"].map(user_to_idx).to_numpy()
    i = interactions["asin"].map(item_to_idx).to_numpy()
    ts = interactions["ts"].to_numpy()
    if "rating" in interactions.columns:
        w = ((interactions["rating"].to_numpy().astype(np.float32)) - 1.0) / 4.0
    else:
        w = np.ones(len(interactions), dtype=np.float32)

    # stable sort by (user, ts): ties keep input order, like a stable pandas sort
    order = np.lexsort((ts, u))
    u, i, ts, w = u[order], i[order], ts[order], w[order]

    n_users = len(user_to_idx)
    n_items = len(item_to_idx)

    # segment boundaries per user
    boundary = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    counts = np.diff(np.r_[boundary, len(u)])
    # position of each row within its user's segment
    pos = np.arange(len(u)) - np.repeat(boundary, counts)
    cnt = np.repeat(counts, counts)

    keep = cnt >= 2
    is_test = keep & (pos == cnt - 1)
    is_val = (cnt >= 3) & (pos == cnt - 2)
    is_train = keep & ~is_test & ~is_val

    return Splits(
        n_users=n_users,
        n_items=n_items,
        train_u=u[is_train].astype(np.int32),
        train_i=i[is_train].astype(np.int32),
        train_w=w[is_train].astype(np.float32),
        val_u=u[is_val].astype(np.int32),
        val_i=i[is_val].astype(np.int32),
        test_u=u[is_test].astype(np.int32),
        test_i=i[is_test].astype(np.int32),
    )


def padded_positives(splits: Splits, max_degree: int | None = None) -> Tuple[np.ndarray, np.ndarray]:
    """Per-user SORTED, DEDUPLICATED train-positive table [n_users, P], pad = n_items.

    Static-shape positive-set structure used on device for exact negative
    sampling (order-statistic mapping over the sorted row — see
    train/sampling.py) and avoid-set handling in sampled eval — the TPU
    replacement for the reference's per-user Python `set` objects
    (`train_gat_custom.py:188,214`). Rows are ascending; the returned degree
    counts UNIQUE positives (the set semantics the reference's rejection test
    uses). If max_degree truncates a row, exactness degrades for that user's
    truncated tail only.
    """
    n_users, n_items = splits.n_users, splits.n_items
    if len(splits.train_u) == 0:
        P = int(max_degree or 1)
        return np.full((n_users, P), n_items, dtype=np.int32), np.zeros(n_users, np.int32)

    pairs = np.unique(np.stack([splits.train_u, splits.train_i], axis=1), axis=0)  # sorted (u, i)
    su, si = pairs[:, 0], pairs[:, 1]
    deg = np.bincount(su, minlength=n_users).astype(np.int32)
    P = int(max_degree or deg.max() or 1)

    boundary = np.flatnonzero(np.r_[True, su[1:] != su[:-1]])
    counts = np.diff(np.r_[boundary, len(su)])
    pos_in_user = np.arange(len(su)) - np.repeat(boundary, counts)

    table = np.full((n_users, P), n_items, dtype=np.int32)
    m = pos_in_user < P
    table[su[m], pos_in_user[m]] = si[m]
    return table, np.minimum(deg, P).astype(np.int32)
