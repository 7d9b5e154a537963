"""End-to-end pipeline glue: artifacts -> splits -> graph -> trainer -> artifacts.

This is the in-process equivalent of the reference's Vertex job chain
(`run_pipeline_v2.sh`): the same stages, but composed as functions over the
ArtifactStore instead of gcloud job polling.
"""
from __future__ import annotations

import time
from typing import Any, Dict, Optional

import numpy as np

import jax

from plotpointe_tpu.config import TrainConfig
from plotpointe_tpu.data.splits import build_node_maps, build_splits
from plotpointe_tpu.graphs.csr import build_bipartite_graph
from plotpointe_tpu.models.gat import GATModel
from plotpointe_tpu.models.lightgcn import LightGCNModel
from plotpointe_tpu.train.trainer import Trainer
from plotpointe_tpu.utils.artifacts import ArtifactStore


def make_model(cfg: TrainConfig, n_users: int, n_items: int, feat_dim: int):
    if cfg.model_family == "gat":
        return GATModel(
            n_users=n_users,
            n_items=n_items,
            feat_dim=feat_dim,
            hidden_dim=cfg.hidden_dim,
            n_layers=cfg.layers,
            heads=cfg.heads,
            attn_dropout=cfg.attn_dropout,
            attn_impl=cfg.attn_impl,
        )
    if cfg.model_family == "lightgcn":
        return LightGCNModel(
            n_users=n_users, n_items=n_items, embed_dim=cfg.embed_dim,
            n_prop_layers=cfg.n_prop_layers, spmm_impl=cfg.spmm_impl,
        )
    raise ValueError(f"unknown model_family {cfg.model_family}")


def train_from_artifacts(
    cfg: TrainConfig,
    staging_prefix: str,
    embeddings_prefix: str,
    models_prefix: str,
    store: Optional[ArtifactStore] = None,
    resume: bool = False,
) -> Dict[str, Any]:
    """interactions.parquet + features npy -> trained checkpoint + metrics json."""
    store = store or ArtifactStore()
    interactions = store.load_parquet(f"{staging_prefix}/interactions.parquet")

    u2i, i2i = build_node_maps(interactions)
    splits = build_splits(interactions, u2i, i2i)
    graph = build_bipartite_graph(
        splits.train_u, splits.train_i, splits.n_users, splits.n_items, weight=splits.train_w
    )

    feats = None
    if cfg.model_family == "gat":
        feat_name = "fused_interacted.npy" if cfg.item_features == "fused" else "txt_interacted.npy"
        uri = f"{embeddings_prefix}/{feat_name}"
        if not store.exists(uri):  # fall back to full-catalog names
            uri = f"{embeddings_prefix}/{'fused' if cfg.item_features == 'fused' else 'txt'}.npy"
        feats = np.asarray(store.load_npy(uri), dtype=np.float32)
        if feats.shape[0] != splits.n_items:
            raise ValueError(
                f"features rows ({feats.shape[0]}) must align to interacted items ({splits.n_items})"
            )

    model = make_model(cfg, splits.n_users, splits.n_items, feats.shape[1] if feats is not None else 0)
    if cfg.mesh_shape:
        from plotpointe_tpu.parallel.mesh import make_mesh
        from plotpointe_tpu.train.sharded import ShardedTrainer

        trainer = ShardedTrainer(
            model, cfg, graph, splits, item_feats=feats, mesh=make_mesh(cfg.mesh_shape)
        )
    else:
        trainer = Trainer(model, cfg, graph, splits, item_feats=feats)

    run_id = cfg.run_id or f"{cfg.model_family}_d{cfg.hidden_dim}_{int(time.time())}"
    cfg.run_id = run_id
    ckpt_uri = f"{models_prefix}/checkpoints/{run_id}.npz"
    ckpt_local = store._tmp_for(ckpt_uri, ".npz")
    resume_local = store._tmp_for(f"{models_prefix}/resume.npz", ".npz")
    results = trainer.fit(
        jax.random.key(cfg.seed),
        checkpoint_path=str(ckpt_local),
        resume_path=str(resume_local) if resume else None,
    )
    store.publish(ckpt_local, ckpt_uri)

    metrics = {
        "best_val_ndcg@20": results["best_val_ndcg@20"],
        "val": results["val"],
        "test": results["test"],
        "config": results["config"],
        "notes": results["notes"],
        "history": results["history"],
        "wall_time_s": results["wall_time_s"],
    }
    store.save_json(metrics, f"{models_prefix}/metrics_{run_id}.json")
    results["checkpoint_uri"] = ckpt_uri
    results["trainer"] = trainer
    return results
