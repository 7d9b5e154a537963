"""Golden tests: Pallas fused segment-reduce attention vs the XLA reference.
Runs in Pallas interpret mode on the CPU mesh; the same code path compiles via
Mosaic on real TPU."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow_interpret

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


def test_pallas_v2_fused_path(rng):
    # d == 128 triggers the fully fused single-gather v2 kernel
    g = _graph_with_tiling(rng, n_nodes=200, n_edges=1500, nb=64, eb=128)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, 1, 128)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    want = segment_softmax_attention(h, a_s, a_d, g, impl="xla")
    got = segment_softmax_attention(h, a_s, a_d, g, impl="pallas")
    # bf16 gather in v2: tolerance reflects bf16 rounding of the source rows
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=5e-2, atol=6e-2)
    corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(want).ravel())[0, 1]
    assert corr > 0.9999


def test_pallas_v2_dropout_matches_xla_mask(rng):
    # same rng => identical dropout mask stream as the XLA reference
    g = _graph_with_tiling(rng, n_nodes=150, n_edges=1000, nb=64, eb=128)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, 1, 128)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    key = jax.random.key(7)
    want = np.asarray(segment_softmax_attention(h, a_s, a_d, g, impl="xla", dropout_rate=0.3, rng=key))
    got = np.asarray(segment_softmax_attention(h, a_s, a_d, g, impl="pallas", dropout_rate=0.3, rng=key))
    # same mask stream; residual = bf16 source rows x 1/keep amplification
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=6e-2)
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.999  # a different mask would destroy the correlation


def test_pallas_v2_grads_flow(rng):
    g = _graph_with_tiling(rng, n_nodes=100, n_edges=700, nb=64, eb=128)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, 1, 128)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(g.n_nodes, 1, 128)).astype(np.float32))

    # linear loss: the cotangent is independent of the (bf16-rounded) forward
    # value, so the custom-VJP backward must match the XLA grads exactly
    def loss(impl):
        def f(h, a_s, a_d):
            return (segment_softmax_attention(h, a_s, a_d, g, impl=impl) * ct).sum()
        return f

    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(h, a_s, a_d)
    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(h, a_s, a_d)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)
