"""U-I bipartite graph artifacts: ui_edges.npz + node_maps.json + ui_stats.json.

Contract parity with `graphs/build_ui_edges.py:68-134`: COO users x items with
edge weight (rating-1)/4 in [0,1], node maps in first-occurrence order, stats
with weighted-degree mean/std/min/max and sparsity.
"""
from __future__ import annotations

import time
from typing import Dict, Tuple

import numpy as np

from plotpointe_tpu.data.splits import build_node_maps, node_maps_json


def build_ui_coo(interactions, user_to_idx: Dict[str, int], item_to_idx: Dict[str, int]):
    """COO arrays (rows=user idx, cols=item idx, vals=(rating-1)/4)."""
    rows = interactions["user_id"].map(user_to_idx).to_numpy().astype(np.int64)
    cols = interactions["asin"].map(item_to_idx).to_numpy().astype(np.int64)
    if "rating" in interactions.columns:
        vals = ((interactions["rating"].to_numpy().astype(np.float32)) - 1.0) / 4.0
    else:
        vals = np.ones(len(interactions), dtype=np.float32)
    return rows, cols, vals.astype(np.float32)


def ui_stats(rows, cols, vals, n_users: int, n_items: int, build_time_sec: float = 0.0) -> Dict:
    """Stats schema parity with graphs/build_ui_edges.py:111-134 (weighted degrees)."""
    user_deg = np.bincount(rows, weights=vals, minlength=n_users)
    item_deg = np.bincount(cols, weights=vals, minlength=n_items)
    n_edges = len(vals)
    return {
        "n_users": int(n_users),
        "n_items": int(n_items),
        "n_edges": int(n_edges),
        "sparsity": float(1 - n_edges / (n_users * n_items)) if n_users and n_items else 0.0,
        "user_degree_mean": float(user_deg.mean()),
        "user_degree_std": float(user_deg.std()),
        "user_degree_min": int(user_deg.min()),
        "user_degree_max": int(user_deg.max()),
        "item_degree_mean": float(item_deg.mean()),
        "item_degree_std": float(item_deg.std()),
        "item_degree_min": int(item_deg.min()),
        "item_degree_max": int(item_deg.max()),
        "build_time_sec": float(build_time_sec),
    }


def build_ui_artifacts(interactions, out_prefix: str, store=None) -> Tuple[Dict, Dict]:
    """Full L3 stage: node maps + COO npz + stats, via the artifact store.
    Returns (uris, stats)."""
    from plotpointe_tpu.utils.artifacts import ArtifactStore

    store = store or ArtifactStore()
    t0 = time.time()
    user_to_idx, item_to_idx = build_node_maps(interactions)
    rows, cols, vals = build_ui_coo(interactions, user_to_idx, item_to_idx)
    n_users, n_items = len(user_to_idx), len(item_to_idx)
    stats = ui_stats(rows, cols, vals, n_users, n_items, build_time_sec=time.time() - t0)

    uris = {
        "ui_edges": f"{out_prefix}/ui_edges.npz",
        "node_maps": f"{out_prefix}/node_maps.json",
        "ui_stats": f"{out_prefix}/ui_stats.json",
    }
    # scipy-save_npz-compatible field layout for drop-in reading of either side
    store.save_npz(
        {
            "row": rows.astype(np.int32),
            "col": cols.astype(np.int32),
            "data": vals,
            "shape": np.array([n_users, n_items], dtype=np.int64),
            "format": np.array(b"coo"),
        },
        uris["ui_edges"],
    )
    store.save_json(node_maps_json(user_to_idx, item_to_idx), uris["node_maps"])
    store.save_json(stats, uris["ui_stats"])
    return uris, stats
