"""Golden tests: on-device cosine-kNN vs numpy brute force
(semantics of graphs/build_ii_knn.py:79-99)."""
import numpy as np

from plotpointe_tpu.graphs.knn import cosine_knn, cosine_knn_graph, knn_to_coo


def _brute_force(X, k, min_sim):
    Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-8)
    S = Xn @ Xn.T
    np.fill_diagonal(S, -np.inf)
    idx = np.argsort(-S, axis=1)[:, :k]
    sim = np.take_along_axis(S, idx, axis=1)
    return idx, sim, sim >= min_sim


def test_knn_matches_brute_force(rng):
    X = rng.normal(size=(57, 16)).astype(np.float32)
    idx, sim, valid = cosine_knn(X, k=5, min_similarity=0.1, block_rows=16)
    bidx, bsim, bvalid = _brute_force(X, 5, 0.1)
    # similarities must match exactly (ordering can differ on ties; compare sims)
    np.testing.assert_allclose(np.sort(sim, axis=1), np.sort(bsim, axis=1), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(valid.sum(), bvalid.sum())
    # no self edges
    assert not (idx == np.arange(57)[:, None])[valid].any()


def test_knn_threshold_and_coo(rng):
    X = rng.normal(size=(30, 8)).astype(np.float32)
    idx, sim, valid = cosine_knn(X, k=4, min_similarity=0.5, block_rows=8)
    assert (sim[valid] >= 0.5).all()
    rows, cols, vals = knn_to_coo(idx, sim, valid)
    assert len(rows) == valid.sum()
    assert (rows != cols).all()


def test_knn_artifacts(tmp_path, rng):
    X = rng.normal(size=(20, 8)).astype(np.float32)
    (rows, cols, vals), stats = cosine_knn_graph(
        X, out_prefix=str(tmp_path), feature_name="txt", k=3, min_similarity=0.0, block_rows=8
    )
    assert (tmp_path / "ii_edges_txt.npz").exists()
    assert (tmp_path / "ii_txt_stats.json").exists()
    assert stats["n_edges"] == len(vals)
    assert stats["k"] == 3


def test_knn_pallas_matches_xla(rng):
    # interpret-mode Pallas (CPU backend) vs the XLA blocked path vs brute force
    X = rng.normal(size=(300, 32)).astype(np.float32)
    pidx, psim, pvalid = cosine_knn(X, k=6, min_similarity=0.1, impl="pallas")
    xidx, xsim, xvalid = cosine_knn(X, k=6, min_similarity=0.1, block_rows=64, impl="xla")
    bidx, bsim, bvalid = _brute_force(X, 6, 0.1)
    np.testing.assert_allclose(psim, bsim, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.sort(psim, axis=1), np.sort(xsim, axis=1), rtol=1e-4, atol=1e-5)
    assert pvalid.sum() == bvalid.sum()
    assert not (pidx == np.arange(300)[:, None])[pvalid].any()  # no self edges
    # descending order per row
    assert (np.diff(psim, axis=1) <= 1e-6).all()


def test_knn_pallas_padding_excluded(rng):
    # n not a multiple of either block size: padding rows/cols must not leak
    from plotpointe_tpu.graphs.knn import l2_normalize
    from plotpointe_tpu.ops.knn_kernel import knn_topk_pallas

    import jax.numpy as jnp

    X = rng.normal(size=(77, 16)).astype(np.float32)
    xn = np.asarray(l2_normalize(jnp.asarray(X)))
    idx, sim = knn_topk_pallas(jnp.asarray(xn), 5, block_rows=32, block_cols=64)
    idx, sim = np.asarray(idx), np.asarray(sim)
    assert idx.shape == (77, 5)
    assert (idx < 77).all() and (idx >= 0).all()
    bidx, bsim, _ = _brute_force(X, 5, -2.0)
    np.testing.assert_allclose(sim, bsim, rtol=1e-4, atol=1e-5)
