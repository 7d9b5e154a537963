"""Native graphcore library vs numpy fallbacks — bit-identical outputs."""
import numpy as np
import pytest

from plotpointe_tpu import native


requires_native = pytest.mark.skipif(native.backend() != "native", reason="libgraphcore.so not built")


@requires_native
def test_build_csr_matches_numpy(rng):
    n_nodes, e = 500, 4000
    src = rng.integers(0, n_nodes, e).astype(np.int64)
    dst = rng.integers(0, n_nodes, e).astype(np.int64)
    w = rng.random(e).astype(np.float32)
    e_pad = 4096

    ns, nd, nw, nrp = native.build_csr(src, dst, w, n_nodes, e_pad)

    # numpy reference (same as the fallback path)
    order = np.lexsort((src, dst))
    es, ed, ew = src[order], dst[order], w[order]
    np.testing.assert_array_equal(ns[:e], es)
    np.testing.assert_array_equal(nd[:e], ed)
    np.testing.assert_array_equal(nw[:e], ew)
    assert (ns[e:] == n_nodes).all() and (nd[e:] == n_nodes).all() and (nw[e:] == 0).all()
    counts = np.bincount(dst, minlength=n_nodes + 1)
    np.testing.assert_array_equal(nrp[1 : n_nodes + 1], np.cumsum(counts)[:n_nodes])
    assert nrp[0] == 0 and nrp[-1] == e_pad


@requires_native
def test_leave_last2_matches_numpy(rng):
    n_users, n = 200, 3000
    u = rng.integers(0, n_users, n).astype(np.int32)
    ts = rng.integers(0, 10**9, n).astype(np.int64)

    got = native.leave_last2_roles(u, ts, n_users)

    import os

    os.environ["PLOTPOINTE_NO_NATIVE"] = "1"
    try:
        import importlib

        importlib.reload(native)
        want = native.leave_last2_roles(u, ts, n_users)
    finally:
        del os.environ["PLOTPOINTE_NO_NATIVE"]
        importlib.reload(native)
    np.testing.assert_array_equal(got, want)


@requires_native
def test_padded_positives_native(rng):
    from plotpointe_tpu.data.splits import Splits, padded_positives

    n_users, n_items, t = 50, 40, 600
    tu = rng.integers(0, n_users, t).astype(np.int32)
    ti = rng.integers(0, n_items, t).astype(np.int32)
    s = Splits(
        n_users=n_users, n_items=n_items, train_u=tu, train_i=ti,
        train_w=np.ones(t, np.float32),
        val_u=np.array([], np.int32), val_i=np.array([], np.int32),
        test_u=np.array([], np.int32), test_i=np.array([], np.int32),
    )
    table_np, deg_np = padded_positives(s)
    out = native.padded_positives_native(tu, ti, n_users, n_items, table_np.shape[1])
    assert out is not None
    table_nat, deg_nat = out
    np.testing.assert_array_equal(table_nat, table_np)
    np.testing.assert_array_equal(deg_nat, deg_np)


@requires_native
def test_native_csr_feeds_graph(rng):
    from plotpointe_tpu.graphs.csr import build_graph, degrees

    src = rng.integers(0, 100, 900)
    dst = rng.integers(0, 100, 900)
    g = build_graph(src, dst, 100, pad_multiple=1024)
    d = np.asarray(g.dst)
    assert (np.diff(d) >= 0).all()
    assert degrees(g).sum() == 900
