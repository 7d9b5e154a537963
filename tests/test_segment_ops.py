"""Golden tests: segment ops vs brute-force dense references."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plotpointe_tpu.graphs.csr import build_graph
from plotpointe_tpu.ops.segment import segment_softmax_attention, spmm


def _random_graph(rng, n_nodes=12, n_edges=40, pad_multiple=16):
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    w = rng.random(n_edges).astype(np.float32)
    return build_graph(src, dst, n_nodes, weight=w, pad_multiple=pad_multiple)


def _dense_gat_reference(h, a_src, a_dst, graph):
    """Per-edge loop reference implementing train_gat_custom.py:75-93 math."""
    n, H, D = h.shape
    src = np.asarray(graph.src)[: graph.n_edges]
    dst = np.asarray(graph.dst)[: graph.n_edges]
    out = np.zeros_like(h)
    for head in range(H):
        e = (h[src, head] * a_src[head]).sum(-1) + (h[dst, head] * a_dst[head]).sum(-1)
        e = np.where(e > 0, e, 0.2 * e)
        e = np.clip(e, -10.0, 10.0)
        num = np.exp(e)
        denom = np.zeros(n)
        np.add.at(denom, dst, num)
        alpha = num / (denom[dst] + 1e-9)
        for k in range(len(src)):
            out[dst[k], head] += alpha[k] * h[src[k], head]
    return out


@pytest.mark.parametrize("heads", [1, 2])
def test_segment_softmax_attention_matches_dense(rng, heads):
    g = _random_graph(rng)
    n, D = g.n_nodes, 8
    h = rng.normal(size=(n, heads, D)).astype(np.float32)
    a_src = rng.normal(size=(heads, D)).astype(np.float32)
    a_dst = rng.normal(size=(heads, D)).astype(np.float32)

    got = segment_softmax_attention(jnp.asarray(h), jnp.asarray(a_src), jnp.asarray(a_dst), g.to_device())
    want = _dense_gat_reference(h, a_src, a_dst, g)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_attention_isolated_node_is_zero(rng):
    # node with no incoming edges must output zeros (reference: zeros + index_add_)
    src = np.array([0, 1])
    dst = np.array([1, 0])
    g = build_graph(src, dst, n_nodes=3, pad_multiple=8)
    h = jnp.asarray(rng.normal(size=(3, 1, 4)).astype(np.float32))
    out = segment_softmax_attention(h, jnp.ones((1, 4)), jnp.ones((1, 4)), g.to_device())
    np.testing.assert_allclose(np.asarray(out)[2], 0.0)


def test_spmm_matches_dense(rng):
    g = _random_graph(rng, n_nodes=10, n_edges=30)
    x = rng.normal(size=(10, 6)).astype(np.float32)
    vals = np.asarray(g.weight)

    got = spmm(g.to_device(), jnp.asarray(vals), jnp.asarray(x))

    A = np.zeros((10, 10), np.float32)
    src = np.asarray(g.src)[: g.n_edges]
    dst = np.asarray(g.dst)[: g.n_edges]
    for e in range(g.n_edges):
        A[dst[e], src[e]] += vals[e]
    np.testing.assert_allclose(np.asarray(got), A @ x, rtol=1e-4, atol=1e-5)


def test_attention_grads_flow(rng):
    g = _random_graph(rng)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, 1, 8)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(1, 8)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(1, 8)).astype(np.float32))
    gd = g.to_device()

    def f(h, a_s, a_d):
        return segment_softmax_attention(h, a_s, a_d, gd).sum()

    grads = jax.grad(f, argnums=(0, 1, 2))(h, a_s, a_d)
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
        assert np.abs(np.asarray(gr)).sum() > 0
