"""v3 fully fused attention (aligned layout, Pallas fwd+bwd) golden tests.
Run with hs_dtype=float32 so gradients are exactly comparable to the XLA
reference; the bf16 production path is covered by a looser check."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow_interpret

import jax
import jax.numpy as jnp

from plotpointe_tpu.graphs.csr import build_graph
from plotpointe_tpu.ops.gat_fused import attention_v3
from plotpointe_tpu.ops.segment import segment_softmax_attention


def _graph(rng, n_nodes=200, n_edges=1500, nb=64, eb=128, skew=False):
    src = rng.integers(0, n_nodes, n_edges)
    if skew:
        dst = np.where(rng.random(n_edges) < 0.6, 3, rng.integers(0, n_nodes, n_edges))
    else:
        dst = rng.integers(0, n_nodes, n_edges)
    return build_graph(src, dst, n_nodes, pad_multiple=512).with_layout(nb=nb, eb=eb).to_device()


@pytest.mark.parametrize("skew", [False, True])
def test_v3_forward_matches_xla(rng, skew):
    g = _graph(rng, skew=skew)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, 1, 128)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    want = segment_softmax_attention(h, a_s, a_d, g, impl="xla")
    got = attention_v3(h, a_s, a_d, g, hs_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_v3_grads_match_xla_f32(rng):
    g = _graph(rng, n_nodes=150, n_edges=1100)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, 1, 128)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(g.n_nodes, 1, 128)).astype(np.float32))

    def loss_x(h, a_s, a_d):
        return (segment_softmax_attention(h, a_s, a_d, g, impl="xla") * ct).sum()

    def loss_p(h, a_s, a_d):
        return (attention_v3(h, a_s, a_d, g, hs_dtype=jnp.float32) * ct).sum()

    gx = jax.grad(loss_x, argnums=(0, 1, 2))(h, a_s, a_d)
    gp = jax.grad(loss_p, argnums=(0, 1, 2))(h, a_s, a_d)
    for name, a, b in zip(("dh", "da_src", "da_dst"), gx, gp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-4, err_msg=name
        )


def test_v3_grads_quadratic_loss(rng):
    # full nonlinear loss through the custom VJP (f32 -> tight tolerance)
    g = _graph(rng, n_nodes=100, n_edges=800)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, 1, 128)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))

    gx = jax.grad(lambda *a: (segment_softmax_attention(*a, g, impl="xla") ** 2).sum(), argnums=(0, 1, 2))(h, a_s, a_d)
    gp = jax.grad(lambda *a: (attention_v3(*a, g, hs_dtype=jnp.float32) ** 2).sum(), argnums=(0, 1, 2))(h, a_s, a_d)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-3)


def test_v3_dropout_self_consistent_grads(rng):
    # dropout mask positions differ from the XLA path (aligned layout), but
    # fwd/bwd must share the mask: check against finite differences
    g = _graph(rng, n_nodes=60, n_edges=300)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, 1, 128)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    key = jax.random.key(3)
    ct = jnp.asarray(rng.normal(size=(g.n_nodes, 1, 128)).astype(np.float32))

    def f(a_s_):
        return (attention_v3(h, a_s_, a_d, g, dropout_rate=0.4, rng=key, hs_dtype=jnp.float32) * ct).sum()

    grad = jax.grad(f)(a_s)
    eps = 1e-3
    v = jnp.zeros_like(a_s).at[0, 5].set(1.0)
    fd = (f(a_s + eps * v) - f(a_s - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float((grad * v).sum()), float(fd), rtol=2e-2, atol=1e-3)


def test_v3_bf16_production_path(rng):
    g = _graph(rng)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, 1, 128)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    want = np.asarray(segment_softmax_attention(h, a_s, a_d, g, impl="xla"))
    got = np.asarray(attention_v3(h, a_s, a_d, g))  # bf16 default
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=6e-2)
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.9999


def test_dispatch_prefers_v3(rng):
    # segment_softmax_attention(impl='pallas') routes to v3 when layout present
    g = _graph(rng)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, 1, 128)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32))
    out = segment_softmax_attention(h, a_s, a_d, g, impl="pallas")
    want = np.asarray(attention_v3(h, a_s, a_d, g))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6, atol=1e-6)


def test_spmm_pallas_matches_xla(rng):
    from plotpointe_tpu.ops.segment import spmm
    from plotpointe_tpu.ops.spmm_kernel import spmm_pallas

    g = _graph(rng, n_nodes=180, n_edges=1400)
    vals = jnp.asarray(rng.random(g.n_padded).astype(np.float32) * jnp.where(jnp.arange(g.n_padded) < g.n_edges, 1.0, 0.0))
    x = jnp.asarray(rng.normal(size=(g.n_nodes, 128)).astype(np.float32))
    want = spmm(g, vals, x)
    got = spmm_pallas(g, vals, x, xs_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

    # gradients through the linear op
    ct = jnp.asarray(rng.normal(size=(g.n_nodes, 128)).astype(np.float32))
    gx = jax.grad(lambda v, xx: (spmm(g, v, xx) * ct).sum(), argnums=(0, 1))(vals, x)
    gp = jax.grad(lambda v, xx: (spmm_pallas(g, v, xx, xs_dtype=jnp.float32) * ct).sum(), argnums=(0, 1))(vals, x)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("heads", [2, 4])
def test_multihead_pallas_matches_xla(rng, heads):
    """heads > 1 dispatch: per-head fused v3 passes match the XLA golden
    (forward AND gradients) — the reference's --heads flag is first-class on
    the Pallas path (train_gat_pyg.py:203)."""
    from plotpointe_tpu.ops.gat_kernel import segment_softmax_attention_pallas

    g = _graph(rng)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, heads, 128)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(heads, 128)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(heads, 128)).astype(np.float32))

    want = np.asarray(segment_softmax_attention(h, a_s, a_d, g, impl="xla"))
    got = np.asarray(segment_softmax_attention_pallas(h, a_s, a_d, g))
    # dispatch path runs the bf16 production kernel
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=6e-2)
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.9999

    # gradient correctness of the per-head composition, f32 residuals so the
    # comparison is exact (bf16 grad noise is covered by the corrcoef check)
    def loss_pallas(h, a_s, a_d):
        outs = [
            attention_v3(h[:, i : i + 1], a_s[i : i + 1], a_d[i : i + 1], g,
                         hs_dtype=jnp.float32)
            for i in range(heads)
        ]
        return jnp.sum(jnp.concatenate(outs, axis=1) ** 2)

    def loss_xla(h, a_s, a_d):
        return jnp.sum(segment_softmax_attention(h, a_s, a_d, g, impl="xla") ** 2)

    got_g = jax.grad(loss_pallas, argnums=(0, 1, 2))(h, a_s, a_d)
    want_g = jax.grad(loss_xla, argnums=(0, 1, 2))(h, a_s, a_d)
    for gg, wg in zip(got_g, want_g):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(wg), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("d", [64, 128, 256])
def test_make_spmm_matches_xla(rng, d):
    """Static-values SpMM (host-aligned weights, transpose-layout backward):
    forward and grad-wrt-x match the XLA golden at lane-aligned AND unaligned
    (d=64, LightGCN's embed_dim) feature widths."""
    from plotpointe_tpu.ops.segment import spmm
    from plotpointe_tpu.ops.spmm_kernel import make_spmm

    g = _graph(rng, n_nodes=180, n_edges=1400)
    vals = rng.random(g.n_edges).astype(np.float32)
    vals_pad = jnp.asarray(np.concatenate([vals, np.zeros(g.n_padded - g.n_edges, np.float32)]))
    x = jnp.asarray(rng.normal(size=(g.n_nodes, d)).astype(np.float32))

    op = make_spmm(g, vals, xs_dtype=jnp.float32)
    want = spmm(g, vals_pad, x)
    got = op(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)

    ct = jnp.asarray(rng.normal(size=(g.n_nodes, d)).astype(np.float32))
    gx = jax.grad(lambda xx: (spmm(g, vals_pad, xx) * ct).sum())(x)
    gp = jax.grad(lambda xx: (op(xx) * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-5)


def test_lightgcn_trainer_uses_static_spmm(rng):
    """Trainer wires make_spmm when spmm_impl='pallas'; fit-step loss matches
    the XLA path (same protocol, same keys)."""
    from plotpointe_tpu.config import TrainConfig
    from plotpointe_tpu.data.splits import Splits
    from plotpointe_tpu.graphs.csr import build_bipartite_graph
    from plotpointe_tpu.models.lightgcn import LightGCNModel
    from plotpointe_tpu.train.trainer import Trainer

    n_users, n_items, n_edges = 60, 40, 400
    u = rng.integers(0, n_users, n_edges).astype(np.int32)
    i = rng.integers(0, n_items, n_edges).astype(np.int32)
    keep = np.unique(np.stack([u, i], 1), axis=0)
    u, i = keep[:, 0], keep[:, 1]
    n_tr = len(u) - 20
    splits = Splits(
        train_u=u[:n_tr], train_i=i[:n_tr], train_w=np.ones(n_tr, np.float32),
        val_u=u[n_tr:n_tr + 10], val_i=i[n_tr:n_tr + 10],
        test_u=u[n_tr + 10:], test_i=i[n_tr + 10:],
        n_users=n_users, n_items=n_items,
    )
    graph = build_bipartite_graph(splits.train_u, splits.train_i, n_users, n_items)
    cfg = TrainConfig(model_family="lightgcn", epochs=1, batch_size=64, neg_per_pos=2,
                      embed_dim=64, eval_neg_k=10, lr=1e-2)

    losses = {}
    for impl in ("xla", "pallas"):
        m = LightGCNModel(n_users=n_users, n_items=n_items, embed_dim=64,
                          n_prop_layers=2, spmm_impl=impl)
        tr = Trainer(m, cfg, graph, splits)
        if impl == "pallas":
            assert tr._spmm_op is not None
        params = m.init(jax.random.key(0))
        tr._train_u_dev = jnp.asarray(splits.train_u)
        tr._train_i_dev = jnp.asarray(splits.train_i)
        state_p, state_o, loss = tr._lightgcn_batch_step(
            params, tr.tx.init(params), jnp.arange(max(64, n_tr)) % n_tr,
            jnp.int32(0), jax.random.key(1))
        losses[impl] = float(loss)
    assert abs(losses["xla"] - losses["pallas"]) < 1e-4, losses


@pytest.mark.parametrize("d,heads", [(64, 1), (64, 2)])
def test_fused_dispatch_lane_pads_small_d(rng, d, heads):
    """d % 128 != 0 (the reference's hidden-dim ablations) now rides the
    fully fused v3 path via lane padding — fwd and grads match XLA."""
    from plotpointe_tpu.ops.gat_kernel import segment_softmax_attention_pallas

    g = _graph(rng, n_nodes=120, n_edges=900)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, heads, d)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(heads, d)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(heads, d)).astype(np.float32))

    want = np.asarray(segment_softmax_attention(h, a_s, a_d, g, impl="xla"))
    got = np.asarray(segment_softmax_attention_pallas(h, a_s, a_d, g))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=6e-2)  # bf16 kernel default
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.9999

    gx = jax.grad(lambda *a: jnp.sum(segment_softmax_attention(*a, g, impl="xla") ** 2),
                  argnums=(0, 1, 2))(h, a_s, a_d)
    gp = jax.grad(lambda *a: jnp.sum(segment_softmax_attention_pallas(*a, g) ** 2),
                  argnums=(0, 1, 2))(h, a_s, a_d)
    for a, b in zip(gx, gp):
        assert np.corrcoef(np.asarray(a).ravel(), np.asarray(b).ravel())[0, 1] > 0.999


@pytest.mark.parametrize("heads", [2, 4])
def test_head_packed_mh_forward_and_grads(rng, heads):
    """attention_v3_mh: heads packed into the lane dim — ONE [E, H*D] gather
    serves every head in BOTH directions (round-5: the backward is the
    packed fused B1/B2 path, not the XLA fallback). Forward must match the
    XLA golden exactly at f32, and the fused VJP must match XLA grads."""
    from plotpointe_tpu.ops.gat_fused import attention_v3_mh

    g = _graph(rng)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, heads, 128)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(heads, 128)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(heads, 128)).astype(np.float32))

    want = np.asarray(segment_softmax_attention(h, a_s, a_d, g, impl="xla"))
    got = np.asarray(attention_v3_mh(h, a_s, a_d, g, hs_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def loss_mh(h, a_s, a_d):
        return jnp.sum(attention_v3_mh(h, a_s, a_d, g, hs_dtype=jnp.float32) ** 2)

    def loss_xla(h, a_s, a_d):
        return jnp.sum(segment_softmax_attention(h, a_s, a_d, g, impl="xla") ** 2)

    got_g = jax.grad(loss_mh, argnums=(0, 1, 2))(h, a_s, a_d)
    want_g = jax.grad(loss_xla, argnums=(0, 1, 2))(h, a_s, a_d)
    # the quadratic loss feeds the kernel's f32-rounded forward back as the
    # cotangent, so grads inherit ~1e-3 abs forward noise; the bwd itself is
    # the XLA golden path
    for gg, wg in zip(got_g, want_g):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(wg), rtol=1e-3, atol=1e-3)


def test_mh_dispatch_packed_vs_dropout_fallback(rng):
    """Dispatch: heads>1 routes the packed kernel with and without dropout
    (round-5: per-head mask streams live inside the packed kernels). Both
    must agree with XLA in expectation (dropout checked at rate ~0 where
    masks are ones)."""
    from plotpointe_tpu.ops.gat_kernel import segment_softmax_attention_pallas

    g = _graph(rng)
    h = jnp.asarray(rng.normal(size=(g.n_nodes, 2, 128)).astype(np.float32))
    a_s = jnp.asarray(rng.normal(size=(2, 128)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(2, 128)).astype(np.float32))
    want = np.asarray(segment_softmax_attention(h, a_s, a_d, g, impl="xla"))

    got_packed = np.asarray(segment_softmax_attention_pallas(h, a_s, a_d, g))
    np.testing.assert_allclose(got_packed, want, rtol=5e-2, atol=6e-2)

    # dropout>0 with rng forces the per-head fused path; rate ~0 keeps values
    got_loop = np.asarray(segment_softmax_attention_pallas(
        h, a_s, a_d, g, dropout_rate=1e-9, rng=jax.random.key(0)))
    np.testing.assert_allclose(got_loop, want, rtol=5e-2, atol=6e-2)


def test_mh_dropout_grads_match_finite_difference(rng):
    """Packed mh with dropout: bwd re-draws the same per-head mask streams
    from the same rng, so the custom VJP must agree with a directional
    finite difference of the (fixed-mask) primal."""
    from plotpointe_tpu.ops.gat_fused import attention_v3_mh

    g = _graph(rng)
    heads = 2
    h = jnp.asarray(rng.normal(size=(g.n_nodes, heads, 128)).astype(np.float32) * 0.1)
    a_s = jnp.asarray(rng.normal(size=(heads, 128)).astype(np.float32) * 0.1)
    a_d = jnp.asarray(rng.normal(size=(heads, 128)).astype(np.float32) * 0.1)
    key = jax.random.key(3)

    def f(h):
        out = attention_v3_mh(h, a_s, a_d, g, dropout_rate=0.3, rng=key,
                              hs_dtype=jnp.float32)
        return jnp.sum(out ** 2)

    grad = jax.grad(f)(h)
    v = jnp.asarray(rng.normal(size=h.shape).astype(np.float32))
    v = v / jnp.linalg.norm(v)
    eps = 1e-2
    fd = (f(h + eps * v) - f(h - eps * v)) / (2 * eps)
    got = jnp.vdot(grad, v)
    np.testing.assert_allclose(float(got), float(fd), rtol=2e-2, atol=1e-4)
