"""Item-embedding export: checkpoint -> item_embeddings.npy.

Flow parity with `tools/export_item_embeddings.py:52-150`: rebuild the train
split + graph exactly as training did, restore the model from the checkpoint's
embedded config, run one full-graph forward, slice the item half, save float32.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

import jax

from plotpointe_tpu.data.splits import build_node_maps, build_splits
from plotpointe_tpu.graphs.csr import build_bipartite_graph, symmetric_normalized_weights
from plotpointe_tpu.models.gat import GATModel
from plotpointe_tpu.models.lightgcn import LightGCNModel
from plotpointe_tpu.train.checkpoint import load_checkpoint, load_config
from plotpointe_tpu.utils.artifacts import ArtifactStore


def export_item_embeddings(
    checkpoint_path: str | Path,
    interactions,
    item_feats: Optional[np.ndarray],
    out_uri: str,
    store: Optional[ArtifactStore] = None,
    attn_impl: str = "xla",
) -> np.ndarray:
    """Returns the exported [n_items, hidden] matrix and writes it to out_uri."""
    store = store or ArtifactStore()
    config = load_config(checkpoint_path)
    family = config.get("model_family", "gat")

    u2i, i2i = build_node_maps(interactions)
    s = build_splits(interactions, u2i, i2i)
    if s.n_users != config["n_users"] or s.n_items != config["n_items"]:
        raise ValueError(
            f"checkpoint was trained on n_users={config['n_users']}, n_items={config['n_items']} "
            f"but interactions give {s.n_users}/{s.n_items}"
        )
    graph = build_bipartite_graph(s.train_u, s.train_i, s.n_users, s.n_items, weight=s.train_w)

    if family == "gat":
        model = GATModel.from_config(config, attn_impl=attn_impl)
        params, _ = load_checkpoint(checkpoint_path, model.init(jax.random.key(0)))
        z = jax.jit(lambda p, f: model.apply(p, f, graph.to_device()))(params, np.asarray(item_feats, np.float32))
    elif family == "lightgcn":
        model = LightGCNModel.from_config(config)
        params, _ = load_checkpoint(checkpoint_path, model.init(jax.random.key(0)))
        nv = symmetric_normalized_weights(graph)
        z = jax.jit(lambda p: model.apply(p, None, graph.to_device(), norm_values=nv))(params)
    else:
        raise ValueError(f"unknown model_family {family}")

    item_emb = np.asarray(z[s.n_users :], dtype=np.float32)
    store.save_npy(item_emb, out_uri)
    return item_emb
