"""Interacted-subset builder: slice full-catalog embeddings to interacted items.

Parity with `scripts/build_interacted_text_subset.py:61-96`: given the full
catalog matrix (rows aligned to items.parquet order) and the interactions
table, emit `{txt,fused}_interacted.npy` whose rows align to the node-map
(first-occurrence) item order used by training, plus `interacted_items.json`
(ordered asin list).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from plotpointe_tpu.data.splits import build_node_maps


def build_interacted_subset(
    full_matrix: np.ndarray,
    items,  # items.parquet dataframe (row order defines full_matrix rows)
    interactions,
    out_prefix: Optional[str] = None,
    feature_name: str = "txt",
    store=None,
) -> Tuple[np.ndarray, list]:
    """Returns (subset matrix [n_interacted, d], ordered asin list)."""
    if len(items) != full_matrix.shape[0]:
        raise ValueError(
            f"full matrix rows ({full_matrix.shape[0]}) must align to items.parquet ({len(items)})"
        )
    _, item_to_idx = build_node_maps(interactions)
    # node-map order: index i -> asin; catalog row of that asin
    asin_order = [None] * len(item_to_idx)
    for asin, idx in item_to_idx.items():
        asin_order[idx] = asin
    catalog_row: Dict[str, int] = {a: r for r, a in enumerate(items["asin"])}
    missing = [a for a in asin_order if a not in catalog_row]
    if missing:
        raise KeyError(f"{len(missing)} interacted asins missing from catalog (first: {missing[:3]})")
    rows = np.array([catalog_row[a] for a in asin_order], dtype=np.int64)
    subset = np.ascontiguousarray(full_matrix[rows])

    if out_prefix is not None:
        from plotpointe_tpu.utils.artifacts import ArtifactStore

        store = store or ArtifactStore()
        store.save_npy(subset, f"{out_prefix}/{feature_name}_interacted.npy")
        store.save_json(asin_order, f"{out_prefix}/interacted_items.json")
    return subset, asin_order
