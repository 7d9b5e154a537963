"""Golden tests: Pallas MIPS top-K vs XLA reference and numpy brute force."""
import numpy as np
import pytest

import jax.numpy as jnp

from plotpointe_tpu.ops.topk_kernel import topk_mips_pallas, topk_mips_xla


@pytest.mark.parametrize("n,b,k", [(1000, 4, 10), (5000, 1, 20), (2048, 8, 5)])
def test_topk_pallas_matches_brute(rng, n, b, k):
    items = rng.normal(size=(n, 64)).astype(np.float32)
    q = rng.normal(size=(b, 64)).astype(np.float32)

    gi, gv = topk_mips_pallas(jnp.asarray(items), jnp.asarray(q), k, block_items=512)
    scores = q @ items.T
    want_i = np.argsort(-scores, axis=1)[:, :k]
    want_v = np.take_along_axis(scores, want_i, axis=1)

    np.testing.assert_allclose(np.asarray(gv), want_v, rtol=1e-4, atol=1e-5)
    # indices may differ on exact ties; scores must match and be descending
    assert (np.diff(np.asarray(gv), axis=1) <= 1e-6).all()
    got_scores = np.take_along_axis(scores, np.asarray(gi), axis=1)
    np.testing.assert_allclose(got_scores, want_v, rtol=1e-4, atol=1e-5)


def test_topk_xla_matches_brute(rng):
    items = rng.normal(size=(3000, 32)).astype(np.float32)
    q = rng.normal(size=(4, 32)).astype(np.float32)
    gi, gv = topk_mips_xla(jnp.asarray(items), jnp.asarray(q), 15)
    scores = q @ items.T
    want_v = np.sort(scores, axis=1)[:, ::-1][:, :15]
    np.testing.assert_allclose(np.asarray(gv), want_v, rtol=1e-4, atol=1e-5)


def test_topk_padding_not_selected(rng):
    # n not a multiple of the block: padded rows must never be returned
    items = rng.normal(size=(700, 16)).astype(np.float32)
    q = rng.normal(size=(2, 16)).astype(np.float32)
    gi, gv = topk_mips_pallas(jnp.asarray(items), jnp.asarray(q), 10, block_items=512)
    assert (np.asarray(gi) < 700).all()


def test_topk_tail_chunk_boundary(rng):
    """Items in the final (partially out-of-bounds) chunk must be retrievable:
    the kernel reads boundary blocks without host-side padding, masking the
    garbage columns — a planted max-aligned item at n-1 must surface rank-1."""
    n, d = 1037, 32  # n not a multiple of chunk or block
    items = rng.normal(size=(n, d)).astype(np.float32)
    items[-1] = 3.0
    q = np.concatenate([items[-1:], rng.normal(size=(3, d)).astype(np.float32)])
    gi, gv = topk_mips_pallas(jnp.asarray(items), jnp.asarray(q), 5, block_items=512)
    assert int(np.asarray(gi)[0, 0]) == n - 1
    assert (np.asarray(gi) < n).all() and (np.asarray(gi) >= 0).all()


def test_fast_mode_matches_exact_at_serving_shapes(rng):
    """mode='fast' (strided slot pre-reduction, round 4): full recall vs the
    XLA golden at realistic odds (loss P ~ (k+8)^2/(2N) per query)."""
    import jax.numpy as jnp

    from plotpointe_tpu.ops.topk_kernel import topk_mips_pallas, topk_mips_xla

    # expected losses/row ~ C(28,2)/(n_blocks*128): ~0.2 at 120k/7936
    items = jnp.asarray(rng.normal(size=(120_000, 64)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    ix, vx = topk_mips_xla(items, q, 20)
    ip, vp = topk_mips_pallas(items, q, 20, mode="fast")
    hit = np.mean([
        len(set(np.asarray(ip[r]).tolist()) & set(np.asarray(ix[r]).tolist())) / 20
        for r in range(16)
    ])
    assert hit >= 0.98, hit
    np.testing.assert_allclose(np.asarray(vp[:, 0]), np.asarray(vx[:, 0]), rtol=1e-5)
