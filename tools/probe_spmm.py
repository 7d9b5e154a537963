"""Profile SpMM variants at Amazon scale on the real chip: where does the
time go (gather vs kernel vs XLA segment_sum fallback)?"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from plotpointe_tpu.graphs.csr import build_bipartite_graph, symmetric_normalized_weights
from plotpointe_tpu.ops import segment as _seg
from plotpointe_tpu.ops.spmm_kernel import spmm_pallas, _wreduce_call


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    n_users, n_items, n_edges, d = 192_403, 63_001, 1_689_116, 128
    rng = np.random.default_rng(0)
    tu = rng.integers(0, n_users, n_edges).astype(np.int32)
    ti = rng.integers(0, n_items, n_edges).astype(np.int32)
    graph = build_bipartite_graph(tu, ti, n_users, n_items).with_layout()
    vals = jnp.asarray(symmetric_normalized_weights(graph))
    L = graph.layout
    print(f"n_chunks={L.n_chunks} n_tiles={L.n_tiles} e_aligned={L.e_aligned} nnz={graph.n_edges}")
    gd = graph.to_device()
    x = jnp.asarray(rng.normal(size=(graph.n_nodes, d)).astype(np.float32))

    # (a) XLA segment_sum spmm
    xla_fn = jax.jit(lambda v, x: _seg.spmm(gd, v, x))
    print("xla_spmm_ms", timeit(xla_fn, vals, x) * 1000)

    # (b) full pallas path
    pl_fn = jax.jit(lambda v, x: spmm_pallas(gd, v, x))
    print("pallas_spmm_ms", timeit(pl_fn, vals, x) * 1000)

    # (c) just the gather + weight prep
    Ld = gd.layout

    @jax.jit
    def prep(v, x):
        xp = jnp.concatenate([x, jnp.zeros((1, d), x.dtype)], axis=0)
        xs = xp[Ld.src].astype(jnp.bfloat16)
        vpad = jnp.concatenate([v[: gd.n_edges], jnp.zeros((1,), v.dtype)])
        v_al = vpad[jnp.minimum(Ld.pos, gd.n_edges)]
        return xs, v_al.astype(jnp.float32).reshape(-1, 128)

    print("prep_ms", timeit(prep, vals, x) * 1000)
    xs, w2 = prep(vals, x)
    dst2 = Ld.dst.reshape(-1, 128)

    # (d) just the kernel
    kern = jax.jit(lambda xs, w2: _wreduce_call(
        xs, w2, dst2, Ld.tile_of, Ld.is_last, L.nb, L.eb, L.n_tiles, L.n_chunks))
    print("kernel_ms", timeit(kern, xs, w2) * 1000)


if __name__ == "__main__" and len(sys.argv) == 1:
    main()

def main2():
    """make_spmm static path + backward timing at Amazon scale."""
    from plotpointe_tpu.ops.spmm_kernel import make_spmm
    n_users, n_items, n_edges, d = 192_403, 63_001, 1_689_116, 128
    rng = np.random.default_rng(0)
    tu = rng.integers(0, n_users, n_edges).astype(np.int32)
    ti = rng.integers(0, n_items, n_edges).astype(np.int32)
    graph = build_bipartite_graph(tu, ti, n_users, n_items).with_layout()
    vals = symmetric_normalized_weights(graph)
    gd = graph.to_device()
    x = jnp.asarray(rng.normal(size=(graph.n_nodes, d)).astype(np.float32))

    op = make_spmm(gd, vals)
    f = jax.jit(op)
    print("make_spmm_fwd_ms", timeit(f, x) * 1000)

    g = jax.jit(jax.grad(lambda x: op(x).sum()))
    print("make_spmm_bwd_ms", timeit(g, x) * 1000)

    xla_fn = jax.jit(lambda x: _seg.spmm(gd, jnp.asarray(vals), x))
    print("xla_spmm_fwd_ms", timeit(xla_fn, x) * 1000)
    xla_g = jax.jit(jax.grad(lambda x: _seg.spmm(gd, jnp.asarray(vals), x).sum()))
    print("xla_spmm_bwd_ms", timeit(xla_g, x) * 1000)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "2":
    main2()
