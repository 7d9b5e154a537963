"""Serving runtime: top-k semantics parity with the reference's
test_serving_runtime.py (identity-embedding fixture, history exclusion,
descending order), plus the stdlib HTTP surface end-to-end."""
import json
import threading
import urllib.request

import numpy as np
import pytest

from plotpointe_tpu.serving.runtime import RecommenderRuntime, ServingConfig


@pytest.fixture()
def identity_runtime(tmp_path):
    emb = np.eye(8, dtype=np.float32)
    path = tmp_path / "item_embeddings.npy"
    np.save(path, emb)
    cfg = ServingConfig(item_embeddings_uri=str(path), topk=3, use_device=False)
    rt = RecommenderRuntime(cfg)
    rt.startup()
    return rt


def test_history_excluded_and_sorted(identity_runtime):
    idx, scores = identity_runtime.top_k_for_user_items([0, 1], k=3)
    assert 0 not in idx and 1 not in idx
    assert list(scores) == sorted(scores, reverse=True)


def test_device_and_numpy_paths_agree(tmp_path, rng):
    emb = rng.normal(size=(64, 8)).astype(np.float32)
    path = tmp_path / "emb.npy"
    np.save(path, emb)
    rt_np = RecommenderRuntime(ServingConfig(item_embeddings_uri=str(path), use_device=False))
    rt_np.startup()
    rt_dev = RecommenderRuntime(ServingConfig(item_embeddings_uri=str(path), use_device=True))
    rt_dev.startup()
    for hist in ([3], [5, 9, 11], list(range(30))):
        i1, s1 = rt_np.top_k_for_user_items(hist, k=5)
        i2, s2 = rt_dev.top_k_for_user_items(hist, k=5)
        np.testing.assert_allclose(np.sort(s1), np.sort(np.asarray(s2)), rtol=1e-5)


def _req(url, data=None, method=None):
    r = urllib.request.Request(url, data=None if data is None else json.dumps(data).encode(), method=method)
    try:
        with urllib.request.urlopen(r, timeout=10) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_stdlib_http_surface(tmp_path):
    from plotpointe_tpu.serving.httpd import serve

    emb = np.eye(8, dtype=np.float32)
    path = tmp_path / "item_embeddings.npy"
    np.save(path, emb)

    httpd, _ = serve("127.0.0.1", 0, runtime=None, block=False)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        assert _req(f"{base}/healthz")[0] == 200
        code, body = _req(f"{base}/recommend", {"item_ids": [1]})
        assert code == 503
        code, _ = _req(f"{base}/startup", {"item_embeddings_uri": str(path), "use_device": False})
        assert code == 200
        code, body = _req(f"{base}/recommend", {"item_ids": [0, 1], "k": 3})
        assert code == 200
        assert 0 not in body["indices"] and 1 not in body["indices"]
        assert len(body["indices"]) == 3
        code, _ = _req(f"{base}/recommend", {"item_ids": []})
        assert code == 400
        code, _ = _req(f"{base}/recommend", {"item_ids": [999]})
        assert code == 400
    finally:
        httpd.shutdown()


def test_pallas_topk_runtime_path(tmp_path, rng):
    emb = rng.normal(size=(700, 16)).astype(np.float32)
    path = tmp_path / "emb.npy"
    np.save(path, emb)
    rt_ref = RecommenderRuntime(ServingConfig(item_embeddings_uri=str(path), use_device=False))
    rt_ref.startup()
    rt_pk = RecommenderRuntime(ServingConfig(item_embeddings_uri=str(path), use_pallas_topk=True))
    rt_pk.startup()
    for hist in ([5], [3, 9, 200]):
        i1, s1 = rt_ref.top_k_for_user_items(hist, k=10)
        i2, s2 = rt_pk.top_k_for_user_items(hist, k=10)
        np.testing.assert_allclose(np.sort(s1), np.sort(s2), rtol=1e-4, atol=1e-5)
        assert not np.isin(np.asarray(i2), hist).any()
