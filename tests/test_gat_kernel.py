"""Golden tests: Pallas fused segment-reduce attention vs the XLA reference.
Runs in Pallas interpret mode on the CPU mesh; the same code path compiles via
Mosaic on real TPU."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plotpointe_tpu.graphs.csr import build_graph
from plotpointe_tpu.ops.segment import segment_softmax_attention


def _graph_with_tiling(rng, n_nodes=300, n_edges=2500, nb=64, eb=128):
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    g = build_graph(src, dst, n_nodes, pad_multiple=512)
    return g.with_tiling(nb=nb, eb=eb).to_device()


@pytest.mark.parametrize("heads", [1, 2])
def test_pallas_matches_xla(rng, heads):
    g = _graph_with_tiling(rng)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, heads, 64)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(heads, 64)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(heads, 64)).astype(np.float32))

    want = segment_softmax_attention(h, a_s, a_d, g, impl="xla")
    got = segment_softmax_attention(h, a_s, a_d, g, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_pallas_skewed_degrees(rng):
    # hub node: most edges land on one destination (stress the chunk loop)
    n_nodes, n_edges = 200, 3000
    src = rng.integers(0, n_nodes, n_edges)
    dst = np.where(rng.random(n_edges) < 0.7, 7, rng.integers(0, n_nodes, n_edges))
    g = build_graph(src, dst, n_nodes, pad_multiple=512).with_tiling(nb=64, eb=128).to_device()

    h = jnp.asarray(rng.normal(size=(n_nodes, 1, 32)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(1, 32)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(1, 32)).astype(np.float32))
    want = segment_softmax_attention(h, a_s, a_d, g, impl="xla")
    got = segment_softmax_attention(h, a_s, a_d, g, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_pallas_grads_match_xla(rng):
    g = _graph_with_tiling(rng, n_nodes=120, n_edges=900)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, 1, 32)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(1, 32)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(1, 32)).astype(np.float32))

    def loss(impl):
        def f(h, a_s, a_d):
            out = segment_softmax_attention(h, a_s, a_d, g, impl=impl)
            return (out * out).sum()

        return f

    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(h, a_s, a_d)
    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(h, a_s, a_d)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_pallas_requires_tiling(rng):
    g = _graph_with_tiling(rng)
    import dataclasses

    g_no = dataclasses.replace(g, chunk_base=None)
    h = jnp.zeros((g.n_nodes, 1, 32))
    with pytest.raises(ValueError, match="tiling"):
        segment_softmax_attention(h, jnp.zeros((1, 32)), jnp.zeros((1, 32)), g_no, impl="pallas")
