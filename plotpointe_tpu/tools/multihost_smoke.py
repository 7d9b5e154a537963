"""Multi-host smoke: one process of a multi-process sharded training run.

Launch the SAME command on every host (the TPU-pod launcher pattern; on CPU,
tests/test_multihost.py spawns 2 of these with 4 virtual devices each for a
DCN-style 2x4 split):

    python -m plotpointe_tpu.tools.multihost_smoke \
        --coordinator 127.0.0.1:12355 --num-processes 2 --process-id $I \
        --devices-per-process 4 [--fit]

Default mode runs ONE sharded GAT train step (parallel/spmd.py) over the
global mesh and prints {"loss": ...} — every process must print the same loss
(collectives crossed the process boundary). --fit runs a full
ShardedTrainer.fit() (2 epochs, eval + checkpoint) to prove the whole
training protocol is multi-process clean. The reference has no counterpart —
it has no distributed training at all (SURVEY §2.3).
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--fit", action="store_true", help="run a full ShardedTrainer.fit()")
    ap.add_argument("--family", choices=["gat", "lightgcn"], default="gat")
    args = ap.parse_args()

    # force the CPU backend with N virtual devices BEFORE jax backend init
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={args.devices_per_process}")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from plotpointe_tpu.parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed(args.coordinator, args.num_processes, args.process_id)
    assert jax.process_count() == args.num_processes

    from plotpointe_tpu.data.splits import build_node_maps, build_splits
    from plotpointe_tpu.data.synthetic import synthetic_interactions
    from plotpointe_tpu.parallel.mesh import make_mesh

    n_total = args.num_processes * args.devices_per_process
    mesh = make_mesh({"data": n_total})

    # identical data on every host (seeded); put_sharded slices per process
    inter = synthetic_interactions(n_users=96, n_items=64, n_interactions=1500, seed=5)
    u2i, i2i = build_node_maps(inter)
    splits = build_splits(inter, u2i, i2i)

    if args.fit:
        out = _run_fit(mesh, splits, family=args.family)
    else:
        out = _run_one_step(mesh, splits, n_total)
    out.update({"process_id": jax.process_index(),
                "n_processes": jax.process_count(),
                "n_devices": len(jax.devices())})
    print(json.dumps(out), flush=True)


def _run_one_step(mesh, splits, n_shards):
    import jax
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from plotpointe_tpu.graphs.csr import build_bipartite_graph
    from plotpointe_tpu.models.gat import GATModel
    from plotpointe_tpu.parallel.multihost import put_replicated, put_sharded
    from plotpointe_tpu.parallel.spmd import make_sharded_gat_step, shard_graph_by_edges

    n_users, n_items = splits.n_users, splits.n_items
    rng = np.random.default_rng(0)
    graph = shard_graph_by_edges(
        build_bipartite_graph(splits.train_u, splits.train_i, n_users, n_items), n_shards)
    model = GATModel(n_users=n_users, n_items=n_items, feat_dim=16,
                     hidden_dim=16, n_layers=2, attn_impl="xla")
    step = make_sharded_gat_step(model, "bpr", mesh, n_users, n_items)

    feats = rng.normal(size=(n_items, 16)).astype(np.float32)
    b = ((256 + n_shards - 1) // n_shards) * n_shards
    u = rng.integers(0, n_users, b).astype(np.int32)
    i = rng.integers(0, n_items, b).astype(np.int32)
    j = rng.integers(0, n_items, b).astype(np.int32)

    params = model.init(jax.random.key(0))
    # user table rows padded to divide the mesh, then row-sharded ACROSS HOSTS
    u_pad = ((n_users + n_shards - 1) // n_shards) * n_shards
    ue = np.asarray(params["user_emb"])
    params = dict(params)
    params["user_emb"] = put_sharded(
        np.concatenate([ue, np.zeros((u_pad - n_users, ue.shape[1]), ue.dtype)]), mesh, P("data"))
    params["item_proj"] = jax.tree.map(lambda a: put_replicated(a, mesh), params["item_proj"])
    params["layers"] = jax.tree.map(lambda a: put_replicated(a, mesh), params["layers"])

    masks = np.ones((2, graph.n_padded, 1), np.float32)
    grads, loss = step(
        params,
        put_replicated(feats, mesh),
        put_sharded(np.asarray(graph.src), mesh, P("data")),
        put_sharded(np.asarray(graph.dst), mesh, P("data")),
        put_sharded(masks, mesh, P(None, "data")),
        put_sharded(u, mesh, P("data")),
        put_sharded(i, mesh, P("data")),
        put_sharded(j, mesh, P("data")),
    )
    # loss is fully replicated -> addressable on every host
    return {"loss": round(float(loss), 6),
            "grad_user_norm": round(float(jax.numpy.linalg.norm(
                jax.numpy.asarray(grads["user_emb"].addressable_data(0)))), 6)}


def _run_fit(mesh, splits, family="gat"):
    import numpy as np

    from plotpointe_tpu.config import TrainConfig
    from plotpointe_tpu.graphs.csr import build_bipartite_graph
    from plotpointe_tpu.train.sharded import ShardedTrainer

    n_users, n_items = splits.n_users, splits.n_items
    rng = np.random.default_rng(0)
    graph = build_bipartite_graph(splits.train_u, splits.train_i, n_users, n_items)
    feats = rng.normal(size=(n_items, 16)).astype(np.float32)
    if family == "lightgcn":
        from plotpointe_tpu.models.lightgcn import LightGCNModel

        model = LightGCNModel(n_users=n_users, n_items=n_items, embed_dim=16,
                              n_prop_layers=2, spmm_impl="xla")
        cfg = TrainConfig(model_family="lightgcn", epochs=2, batch_size=512,
                          eval_neg_k=32, hidden_dim=16)
    else:
        from plotpointe_tpu.models.gat import GATModel

        model = GATModel(n_users=n_users, n_items=n_items, feat_dim=16,
                         hidden_dim=16, n_layers=2, attn_impl="xla")
        cfg = TrainConfig(epochs=2, samples_per_epoch=512, eval_neg_k=32,
                          hidden_dim=16, layers=2)
    with tempfile.TemporaryDirectory() as td:
        trainer = ShardedTrainer(model, cfg, graph, splits, item_feats=feats, mesh=mesh)
        res = trainer.fit(checkpoint_path=os.path.join(td, "best.npz"))
    return {"loss": round(float(res["history"][-1]["loss"]), 6),
            "best_val_ndcg20": round(float(res["best_val_ndcg@20"]), 6),
            "test_ndcg20": round(float(res["test"].get("ndcg@20", 0.0)), 6)}


if __name__ == "__main__":
    main()
