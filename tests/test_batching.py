"""Serving micro-batching: coalescing, parity with the single-request path,
per-request error isolation, and HTTP-level concurrency.

Reference counterpart: none — `serving/runtime.py:56-76` scores one user per
request. The micro-batcher (serving/batching.py) is the served-QPS realization
of the kernel fact that the top-K catalog stream is per-batch, not per-query.
"""
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from plotpointe_tpu.serving.batching import MicroBatcher, bucket_size
from plotpointe_tpu.serving.runtime import RecommenderRuntime, ServingConfig


def _make_runtime(tmp_path, n_items=500, d=32, use_device=True):
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(n_items, d)).astype(np.float32)
    path = tmp_path / "item_embeddings.npy"
    np.save(path, emb)
    rt = RecommenderRuntime(ServingConfig(item_embeddings_uri=str(path), use_device=use_device))
    rt.startup()
    return rt


def test_bucket_size():
    assert [bucket_size(n, 64) for n in (1, 2, 3, 5, 9, 64)] == [1, 2, 4, 8, 16, 64]
    assert bucket_size(100, 64) == 100  # oversize batches pass through unpadded


def test_batch_parity_with_single(tmp_path):
    rt = _make_runtime(tmp_path)
    rng = np.random.default_rng(1)
    histories = [rng.choice(500, size=n, replace=False).astype(np.int32)
                 for n in (1, 3, 7, 12)]
    ks = [5, 10, 3, 20]
    batch = rt.top_k_for_batch(histories, ks)
    for h, k, (idx, sc) in zip(histories, ks, batch):
        # single-request Pallas-branch semantics: f32 mean, retrieve extra,
        # drop history. The XLA single path masks to -1e9 — same top-k result.
        s_idx, s_sc = rt.top_k_for_user_items([int(x) for x in h], k=k)
        np.testing.assert_array_equal(idx, s_idx)
        np.testing.assert_allclose(sc, s_sc, rtol=1e-5)
        assert not np.isin(idx, h).any()


def test_batch_parity_numpy_backend(tmp_path):
    rt = _make_runtime(tmp_path, use_device=False)
    out = rt.top_k_for_batch([np.array([1, 2]), np.array([3])], [4, 6])
    for (idx, sc), h, k in zip(out, ([1, 2], [3]), (4, 6)):
        assert len(idx) == k and len(sc) == k
        assert not np.isin(idx, h).any()


def test_microbatcher_coalesces_concurrent_submits(tmp_path):
    rt = _make_runtime(tmp_path)
    mb = MicroBatcher(rt, max_batch=64, max_wait_ms=25.0)
    rng = np.random.default_rng(2)
    histories = [rng.choice(500, size=5, replace=False).tolist() for _ in range(64)]
    singles = [rt.top_k_for_user_items(h, k=10) for h in histories]

    results = [None] * 64
    barrier = threading.Barrier(64)

    def worker(i):
        barrier.wait()
        results[i] = mb.submit(histories[i], 10)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(64)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    mb.close()

    for (idx, sc), (s_idx, s_sc) in zip(results, singles):
        np.testing.assert_array_equal(idx, s_idx)
    # coalescing happened: 64 requests in far fewer device calls
    assert mb.stats.n_requests == 64
    assert mb.stats.n_batches <= 16, f"no coalescing: {mb.stats}"
    assert mb.stats.mean_batch >= 4.0


def test_microbatcher_error_isolated_to_requester(tmp_path):
    rt = _make_runtime(tmp_path)
    mb = MicroBatcher(rt, max_batch=8, max_wait_ms=10.0)
    # validate_history is the pre-batch guard the endpoint uses
    with pytest.raises(IndexError):
        rt.validate_history(np.array([10_000]))
    # a good request still succeeds afterwards
    idx, _ = mb.submit([1, 2, 3], 5)
    assert len(idx) == 5
    mb.close()


def _post(url, payload, timeout=30):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_http_concurrent_microbatched(tmp_path):
    from plotpointe_tpu.serving.httpd import serve

    rt = _make_runtime(tmp_path)
    server, thread = serve(host="127.0.0.1", port=0, runtime=rt, block=False,
                           micro_batch=True, micro_batch_max=32, micro_batch_wait_ms=20.0)
    port = server.server_address[1]
    url = f"http://127.0.0.1:{port}/recommend"
    try:
        rng = np.random.default_rng(3)
        histories = [rng.choice(500, size=4, replace=False).tolist() for _ in range(48)]
        codes = [None] * 48
        bodies = [None] * 48
        barrier = threading.Barrier(48)

        def client(i):
            barrier.wait()
            codes[i], bodies[i] = _post(url, {"item_ids": histories[i], "k": 7})

        threads = [threading.Thread(target=client, args=(i,)) for i in range(48)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        wall = time.perf_counter() - t0

        assert all(c == 200 for c in codes), codes
        for h, b in zip(histories, bodies):
            assert len(b["indices"]) == 7
            assert not set(b["indices"]) & set(h)
        st = server.state.batcher.stats
        assert st.n_requests == 48 and st.mean_batch >= 4.0, st
        assert wall < 20.0

        # bad request -> 400 for that requester only, server keeps serving
        code, body = _post(url, {"item_ids": [999_999], "k": 3})
        assert code == 400 and "bad item_ids" in body["detail"]
        code, _ = _post(url, {"item_ids": histories[0], "k": 3})
        assert code == 200
    finally:
        server.shutdown()
        server.state.batcher.close()
