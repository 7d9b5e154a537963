"""Infra layer: artifacts store, config env overrides, manifest registry,
promotion gate, validation, structured logging."""
import io
import json

import numpy as np
import pytest

from plotpointe_tpu.config import FeatureManifest, TrainConfig, load_manifest, load_registry
from plotpointe_tpu.data.synthetic import synthetic_catalog, synthetic_interactions
from plotpointe_tpu.data.validate import validate, validate_interactions
from plotpointe_tpu.tools.promotion_gate import evaluate as gate_evaluate
from plotpointe_tpu.utils.artifacts import ArtifactStore
from plotpointe_tpu.utils.logging import log_event


def test_artifact_roundtrips(tmp_path):
    store = ArtifactStore(cache_dir=str(tmp_path / "cache"))
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    uri = str(tmp_path / "a/b/x.npy")
    store.save_npy(arr, uri)
    np.testing.assert_array_equal(store.load_npy(uri), arr)

    obj = {"k": [1, 2], "s": "x"}
    juri = str(tmp_path / "m.json")
    store.save_json(obj, juri)
    assert store.load_json(juri) == obj

    store.save_npz({"a": arr, "b": arr.T}, str(tmp_path / "z.npz"))
    z = store.load_npz(str(tmp_path / "z.npz"))
    np.testing.assert_array_equal(z["a"], arr)

    assert store.exists(uri)
    assert not store.exists(str(tmp_path / "missing.npy"))
    with pytest.raises(FileNotFoundError):
        store.fetch(str(tmp_path / "missing.npy"))


def test_train_config_env_override(monkeypatch):
    monkeypatch.setenv("HIDDEN_DIM", "256")
    monkeypatch.setenv("LOSS", "bce")
    monkeypatch.setenv("STRUCTURED_LOGS", "true")
    cfg = TrainConfig.from_env()
    assert cfg.hidden_dim == 256
    assert cfg.loss == "bce"
    assert cfg.structured_logs is True
    # round trip
    assert TrainConfig.from_dict(cfg.to_dict()).hidden_dim == 256


def test_manifest_registry():
    reg = load_registry("manifests/registry.json")
    assert "amazon_electronics_v1" in reg
    m = load_manifest("amazon_electronics_v1", "manifests/registry.json")
    paths = m.resolve_paths()
    assert set(paths) == {"staging_prefix", "embeddings_prefix", "graphs_prefix", "item_features"}
    with pytest.raises(ValueError):
        FeatureManifest.from_dict({"id": "x", "dataset": "y", "paths": {}, "defaults": {}})


def test_promotion_gate_modes(tmp_path):
    cur = tmp_path / "cur.json"
    base = tmp_path / "base.json"
    cur.write_text(json.dumps({"test": {"ndcg@20": 0.02}}))
    base.write_text(json.dumps({"test": {"ndcg@20": 0.016}}))
    ok, res = gate_evaluate(cur, base, "test", "ndcg@20", "improve_or_equal", 0.0)
    assert ok and res["pass"]
    base.write_text(json.dumps({"test": {"ndcg@20": 0.05}}))
    ok, _ = gate_evaluate(cur, base, "test", "ndcg@20", "improve_or_equal", 0.0)
    assert not ok
    ok, _ = gate_evaluate(cur, base, "test", "ndcg@20", "no_regression", 0.04)
    assert ok


def test_validation_catches_violations():
    df = synthetic_interactions(n_users=50, n_items=30, n_interactions=500, seed=1)
    items = synthetic_catalog(df)
    rep = validate(df, items)
    assert rep.passed

    bad = df.copy()
    bad.loc[0, "rating"] = 9.0
    rep = validate_interactions(bad, items)
    assert not rep.passed
    names = {c.name: c.passed for c in rep.checks}
    assert names["rating_bounds"] is False


def test_log_event_never_raises():
    buf = io.StringIO()
    log_event("test_event", run_id="r1", stream=buf, metric=1.5, arr=np.arange(3))
    line = json.loads(buf.getvalue())
    assert line["event"] == "test_event"
    assert line["run_id"] == "r1"
    # non-serializable values are repr'd, call never raises
    class Weird:
        pass

    log_event("weird", stream=buf, obj=Weird())
