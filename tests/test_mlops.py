"""MLOps layer: experiment tracker, serving telemetry + drift, manifest
validation, mid-training resume."""
import json

import numpy as np
import pytest

import jax

from plotpointe_tpu.utils.experiments import ExperimentTracker
from plotpointe_tpu.serving.telemetry import JsonlSink, ServingTelemetry


def test_experiment_tracker_roundtrip(tmp_path):
    tr = ExperimentTracker("exp1", root=str(tmp_path))
    run = tr.start_run("runA")
    tr.log_params({"lr": 1e-3, "layers": 2})
    tr.log_metrics({"ndcg@20": 0.016})
    tr.log_time_series({"loss": 0.5}, step=1)
    tr.log_artifact("tmp/x.npz")
    tr.end_run()

    records = tr.read_run("runA")
    types = [r["type"] for r in records]
    assert types == ["run_start", "params", "metrics", "time_series", "artifact", "run_end"]
    assert tr.list_runs() == ["runA"]
    with pytest.raises(RuntimeError):
        tr.log_metrics({"x": 1})  # no active run


def test_telemetry_schemas_and_drift(tmp_path):
    tel = ServingTelemetry(root=str(tmp_path), experiment="e1", model_version="v1")
    rid = tel.log_request([1, 2, 3], [0.9, 0.8, 0.7], latency_ms=12.5, user_key="u1")
    tel.log_feedback(rid, item_id=2, event_type="click")

    reqs = tel.requests.read_all()
    assert len(reqs) == 1
    assert set(reqs[0]) == {
        "request_id", "ts", "user_key", "item_ids", "scores", "latency_ms", "experiment", "model_version",
    }
    fb = tel.feedback.read_all()
    assert fb[0]["request_id"] == rid and fb[0]["event_type"] == "click"

    tel.log_request([4], [0.5], latency_ms=20.0)
    drift = tel.aggregate_drift()
    assert len(drift) >= 1
    assert drift[-1]["n_requests"] == 2
    assert drift[-1]["latency_p95_ms"] >= drift[-1]["latency_p50_ms"]


def test_telemetry_wired_into_http(tmp_path):
    import urllib.request

    from plotpointe_tpu.serving.httpd import serve
    from plotpointe_tpu.serving.runtime import RecommenderRuntime, ServingConfig

    emb = np.eye(8, dtype=np.float32)
    path = tmp_path / "emb.npy"
    np.save(path, emb)
    rt = RecommenderRuntime(ServingConfig(item_embeddings_uri=str(path), use_device=False))
    rt.startup()
    tel = ServingTelemetry(root=str(tmp_path / "tel"))
    httpd, _ = serve("127.0.0.1", 0, runtime=rt, telemetry=tel, block=False)
    port = httpd.server_address[1]
    try:
        def post(path_, data):
            r = urllib.request.Request(f"http://127.0.0.1:{port}{path_}", data=json.dumps(data).encode())
            with urllib.request.urlopen(r, timeout=10) as resp:
                return json.loads(resp.read())

        body = post("/recommend", {"item_ids": [0, 1], "k": 3})
        assert "request_id" in body
        post("/feedback", {"request_id": body["request_id"], "item_id": body["indices"][0]})
        assert len(tel.requests.read_all()) == 1
        assert len(tel.feedback.read_all()) == 1
    finally:
        httpd.shutdown()


def test_manifest_validator(tmp_path):
    from plotpointe_tpu.config import FeatureManifest
    from plotpointe_tpu.tools.manifest_validate import validate_manifest

    good = tmp_path / "exists"
    good.mkdir()
    m = FeatureManifest(
        id="t", dataset="d",
        paths={"staging_prefix": str(good), "embeddings_prefix": str(good), "graphs_prefix": str(tmp_path / "missing")},
    )
    rep = validate_manifest(m)
    assert not rep["ok"]
    assert rep["paths"]["graphs_prefix"]["exists"] is False
    assert rep["paths"]["staging_prefix"]["exists"] is True


def test_resume_continues_training(tmp_path):
    from plotpointe_tpu.config import TrainConfig
    from plotpointe_tpu.data.splits import build_node_maps, build_splits
    from plotpointe_tpu.data.synthetic import synthetic_features, synthetic_interactions
    from plotpointe_tpu.graphs.csr import build_bipartite_graph
    from plotpointe_tpu.models.gat import GATModel
    from plotpointe_tpu.train.trainer import Trainer
    from plotpointe_tpu.train.checkpoint import save_resume_state

    df = synthetic_interactions(n_users=120, n_items=90, n_interactions=2500, seed=11)
    u2i, i2i = build_node_maps(df)
    s = build_splits(df, u2i, i2i)
    feats = synthetic_features(s.n_items, 16, seed=11)
    g = build_bipartite_graph(s.train_u, s.train_i, s.n_users, s.n_items, pad_multiple=256)
    cfg = TrainConfig(epochs=4, samples_per_epoch=3000, eval_neg_k=40, eval_chunk=64, hidden_dim=16)
    model = GATModel(n_users=s.n_users, n_items=s.n_items, feat_dim=16, hidden_dim=16, n_layers=1)

    # run 2 epochs, save resume state manually (simulating preemption)
    t1 = Trainer(model, TrainConfig(**{**cfg.to_dict(), "epochs": 2}), g, s, item_feats=feats)
    r1 = t1.fit(jax.random.key(0))
    resume = tmp_path / "resume.npz"
    save_resume_state(
        resume, t1.state.params, t1.state.opt_state, t1.state.best_params,
        {"epoch": 2, "best_val_ndcg20": r1["best_val_ndcg@20"]},
    )

    # resume for the remaining epochs
    t2 = Trainer(model, cfg, g, s, item_feats=feats)
    r2 = t2.fit(jax.random.key(0), resume_path=str(resume))
    epochs_run = [h["epoch"] for h in r2["history"]]
    assert epochs_run == [3, 4]
    assert r2["best_val_ndcg@20"] >= r1["best_val_ndcg@20"]
