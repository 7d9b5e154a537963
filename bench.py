#!/usr/bin/env python3
"""Benchmark driver — prints ONE JSON line summarizing performance vs baseline.

Headline metric: build time of the item-item cosine-kNN graph at the
reference's exact published shape (63,001 items x 384d text embeddings, k=20,
min_sim 0.3) — the reference's only hard throughput number: 100.40 s on an
n1-highmem-8 CPU (`PHASE0_REPORT.md:180-183`). vs_baseline = baseline_s / ours
(higher is better, >1 means faster than the reference).

Robustness contract: every section is independently guarded; the headline kNN
section retries across configs (the TPU tunnel has shown transient INTERNAL
errors on device->host reads) and falls back to the U-I build headline
(11.02 s baseline, `PHASE0_REPORT.md:172-173`) if it cannot complete. The
driver must always receive a populated JSON line.

Extra fields in the same JSON line (no reference counterpart, recorded for
round-over-round tracking):
  - gat_train_edges_per_sec: full train step (sample+fwd+bwd+Adam) throughput
    on an Amazon-Electronics-scale synthetic graph, edges x layers / step_time
  - mfu_*: per-kernel roofline accounting (achieved TFLOP/s + speed-of-light
    fraction via utils/profiling.Roofline) for attention, SpMM, and top-K
  - gat_step_time_s, eval_users_per_sec, device
"""
from __future__ import annotations

import json
import time

import numpy as np


def _err(e: Exception) -> str:
    return f"{type(e).__name__}: {e}"[:200]


def _timed_inner(body, *args, n_iter=16, n_rep=3):
    """True device time per iteration: run `body(carry, i, *args) -> carry`
    n_iter times inside ONE jitted lax.scan (carry-chained so nothing is
    elided or overlapped), host-read once per rep, keep the best rep.

    This is the only trustworthy way to time sub-10ms kernels here: each
    dispatch through the remote-TPU tunnel costs ~5-25 ms of RPC latency and
    `block_until_ready` returns before execution finishes, so per-call
    wall-clock loops measure the tunnel, not the kernel. Big arrays must be
    passed via *args (jit closure constants ship inside the remote-compile
    payload, which has a hard size limit)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(c0, *a):
        c, _ = jax.lax.scan(lambda c, i: (body(c, i, *a), None), c0, jnp.arange(n_iter))
        return c

    float(jnp.ravel(run(jnp.float32(0.0), *args))[0])  # compile + drain
    best = 1e9
    for _ in range(n_rep):
        t = time.perf_counter()
        float(jnp.ravel(run(jnp.float32(0.0), *args))[0])
        best = min(best, time.perf_counter() - t)
    return best / n_iter


_PEAKS: dict = {}  # measured device ceilings, filled once by main()


def _roofline(name: str, seconds: float, flops: float, bytes_accessed: float,
              dtype_key: str = "bf16_tflops") -> dict:
    from plotpointe_tpu.utils.profiling import Roofline

    rep = Roofline(name=name, seconds=seconds, flops=flops,
                   bytes_accessed=bytes_accessed, dtype_tflops_key=dtype_key,
                   measured_peaks=_PEAKS or None).report()
    out = {
        f"mfu_{name}_tflops": round(rep["achieved_tflops"], 2),
        f"mfu_{name}_sol": round(rep["sol_fraction"], 3),
        f"mfu_{name}_bound": rep["bound_by"],
    }
    if "sol_fraction_dev" in rep:
        # fraction of what THIS device actually delivers (it is a shared/
        # virtualized slice well below chip spec — see measure_device_peaks)
        out[f"mfu_{name}_sol_dev"] = round(min(rep["sol_fraction_dev"], 1.0), 3)
    return out


def _bench_knn(n=63_001, d=384, k=20, impl="pallas", block_rows=1024):
    import jax
    import jax.numpy as jnp

    from plotpointe_tpu.graphs.knn import _knn_blocks, cosine_knn
    from plotpointe_tpu.ops.knn_kernel import knn_topk_pallas

    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    # pre-place on device: the reference's 100.4 s baseline is compute with
    # data already in RAM; this environment's host<->device relay (~30 MB/s)
    # is a tunnel artifact, not part of the kernel being measured
    xd = jnp.asarray(x)

    # warmup/compile (full shape so the block program is cached). Default is
    # the fused streaming Pallas kernel: ~15 s compile vs ~8 min for the
    # XLA lax.map+hierarchical-top_k program at this shape.
    cosine_knn(xd, k=k, min_similarity=0.3, block_rows=block_rows, impl=impl)
    t0 = time.perf_counter()
    idx, sim, valid = cosine_knn(xd, k=k, min_similarity=0.3, block_rows=block_rows, impl=impl)
    dt = time.perf_counter() - t0

    # device-only portion via the in-jit scan harness (excludes the [N,k]
    # result readback AND the per-dispatch tunnel latency — see _timed_inner)
    if impl == "pallas":
        def knn_body(c, i, x):
            _, sim = knn_topk_pallas(x + c * 0, k)
            return c + sim[0, 0] * 1e-9

        dev_dt = _timed_inner(knn_body, xd, n_iter=4, n_rep=2)
        n_pad = ((n + 2048 - 1) // 2048) * 2048
    else:
        n_pad = ((n + block_rows - 1) // block_rows) * block_rows
        xp = jnp.concatenate([xd, jnp.zeros((n_pad - n, d), jnp.float32)], axis=0)

        def knn_body(c, i, x):
            _, sim = _knn_blocks(x + c * 0, k, block_rows)
            return c + sim[0, 0] * 1e-9

        dev_dt = _timed_inner(knn_body, xp, n_iter=4, n_rep=2)

    # roofline: the dominant op is the [n_pad, d] x [d, n_pad] similarity
    # matmul at f32-faithful MXU precision
    mfu = _roofline("knn", dev_dt, flops=2.0 * n_pad * n_pad * d,
                    bytes_accessed=2.0 * n_pad * d * 4, dtype_key="f32_tflops")
    return dt, dev_dt, mfu


def _bench_gat_train(
    n_users=192_403, n_items=63_001, n_edges=1_689_116, hidden=128, layers=2, batch=200_000,
    attn_impl="xla",
):
    """Train-step throughput at Amazon Electronics scale (synthetic ids)."""
    import jax
    import jax.numpy as jnp

    from plotpointe_tpu.config import TrainConfig
    from plotpointe_tpu.data.splits import Splits
    from plotpointe_tpu.graphs.csr import build_bipartite_graph
    from plotpointe_tpu.models.gat import GATModel
    from plotpointe_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    tu = rng.integers(0, n_users, n_edges).astype(np.int32)
    ti = rng.integers(0, n_items, n_edges).astype(np.int32)
    tw = rng.random(n_edges).astype(np.float32)
    splits = Splits(
        n_users=n_users, n_items=n_items, train_u=tu, train_i=ti, train_w=tw,
        val_u=np.arange(0, dtype=np.int32), val_i=np.arange(0, dtype=np.int32),
        test_u=np.arange(0, dtype=np.int32), test_i=np.arange(0, dtype=np.int32),
    )
    graph = build_bipartite_graph(tu, ti, n_users, n_items, weight=tw)
    feats = rng.normal(size=(n_items, 384)).astype(np.float32)

    cfg = TrainConfig(hidden_dim=hidden, layers=layers, samples_per_epoch=batch,
                      item_features="txt", attn_impl=attn_impl)
    model = GATModel(n_users=n_users, n_items=n_items, feat_dim=384, hidden_dim=hidden,
                     n_layers=layers, attn_impl=attn_impl)
    trainer = Trainer(model, cfg, graph, splits, item_feats=feats, max_pos_degree=64)

    params = model.init(jax.random.key(0))
    opt_state = trainer.tx.init(params)

    # compile
    params, opt_state, loss = trainer._train_step(params, opt_state, jax.random.key(1))
    loss_val = float(loss)

    # full train step (sample+fwd+bwd+Adam), scan-chained inside one jit
    def step_body(carry, i):
        p, o, _ = carry
        p, o, loss = trainer._train_step(p, o, jax.random.fold_in(jax.random.key(2), i))
        return (p, o, loss)

    @jax.jit
    def steps_run(p, o):
        (p, o, loss), _ = jax.lax.scan(
            lambda c, i: (step_body(c, i), None), (p, o, jnp.float32(0)), jnp.arange(4)
        )
        return loss

    float(steps_run(params, opt_state))
    t0 = time.perf_counter()
    float(steps_run(params, opt_state))
    step_time = (time.perf_counter() - t0) / 4

    # forward-only (the eval/export/serving path, where the Pallas kernel
    # runs); params ride as scan args, not closure constants
    def fwd_body(c, i, p):
        U, I = trainer._forward_eval(jax.tree.map(lambda t: t + c * 0, p))
        return c + I[0, 0] * 1e-9

    fwd_time = _timed_inner(fwd_body, params, n_iter=8, n_rep=2)

    mfu = {}
    if attn_impl == "pallas" and trainer.graph.layout is not None:
        # per-layer one-hot-matmul kernel flops (cost model in ops/gat_fused.py)
        L = trainer.graph.layout
        kflops = 2.0 * L.n_chunks * L.nb * L.eb * hidden * layers
        kbytes = (L.e_aligned * hidden * 2 + L.n_tiles * L.nb * hidden * 4) * layers
        mfu = _roofline("gat_attn_fwd", fwd_time, flops=kflops, bytes_accessed=kbytes)

    directed_edges = 2 * n_edges
    edges_per_sec = directed_edges * layers / step_time
    return step_time, fwd_time, edges_per_sec, loss_val, mfu


def _bench_gat_heads2(n_users=192_403, n_items=63_001, n_edges=1_689_116, d=128):
    """heads=2 attention forward at Amazon scale (the reference's --heads
    ablation, train_gat_pyg.py:203): per-head fused v3 passes."""
    import jax
    import jax.numpy as jnp

    from plotpointe_tpu.graphs.csr import build_bipartite_graph
    from plotpointe_tpu.ops.gat_kernel import segment_softmax_attention_pallas

    rng = np.random.default_rng(0)
    tu = rng.integers(0, n_users, n_edges).astype(np.int32)
    ti = rng.integers(0, n_items, n_edges).astype(np.int32)
    g = build_bipartite_graph(tu, ti, n_users, n_items).with_layout().to_device()
    h = jnp.asarray(rng.normal(size=(g.n_nodes, 2, d)).astype(np.float32) * 0.1)
    a_s = jnp.asarray(rng.normal(size=(2, d)).astype(np.float32))
    a_d = jnp.asarray(rng.normal(size=(2, d)).astype(np.float32))

    def body(c, i, h, a_s, a_d):
        out = segment_softmax_attention_pallas(h + c * 0, a_s, a_d, g)
        return c + out[0, 0, 0] * 1e-9

    dt = _timed_inner(body, h, a_s, a_d, n_iter=8, n_rep=2)
    return {"gat_heads2_fwd_ms": round(dt * 1000, 2)}


def _bench_ui_build(n_users=192_403, n_items=63_001, n_edges=1_689_116):
    """U-I bipartite CSR build at the reference's exact scale: 11.02 s on
    n1-standard-4 (`PHASE0_REPORT.md:172-173`). Host-side (native C++ counting
    sort with numpy fallback) — no device involved."""
    from plotpointe_tpu.graphs.csr import build_bipartite_graph

    rng = np.random.default_rng(0)
    tu = rng.integers(0, n_users, n_edges).astype(np.int32)
    ti = rng.integers(0, n_items, n_edges).astype(np.int32)
    tw = rng.random(n_edges).astype(np.float32)
    build_bipartite_graph(tu, ti, n_users, n_items, weight=tw)  # warm page cache/allocator
    t0 = time.perf_counter()
    g = build_bipartite_graph(tu, ti, n_users, n_items, weight=tw)
    dt = time.perf_counter() - t0
    assert g.n_edges == 2 * n_edges  # symmetric u->i and i->u
    return dt


def _bench_spmm(n_users=192_403, n_items=63_001, n_edges=1_689_116, d=64):
    """LightGCN propagation kernel (replaces torch.sparse.mm,
    train_lightgcn.py:70-71) at the reference shape (embed_dim=64): the static
    Pallas operator (make_spmm: host-aligned weights, transpose-layout bwd)
    vs the XLA segment_sum golden — headline spmm_ms is the winner."""
    import jax
    import jax.numpy as jnp

    from plotpointe_tpu.graphs.csr import build_bipartite_graph, symmetric_normalized_weights
    from plotpointe_tpu.ops import segment as _seg
    from plotpointe_tpu.ops.spmm_kernel import make_spmm

    rng = np.random.default_rng(0)
    tu = rng.integers(0, n_users, n_edges).astype(np.int32)
    ti = rng.integers(0, n_items, n_edges).astype(np.int32)
    graph = build_bipartite_graph(tu, ti, n_users, n_items).with_layout()
    vals = symmetric_normalized_weights(graph)
    vals_j = jnp.asarray(vals)
    L = graph.layout
    graph = graph.to_device()
    x = jnp.asarray(rng.normal(size=(graph.n_nodes, d)).astype(np.float32))

    op = make_spmm(graph, vals)
    dt_pl = _timed_inner(lambda c, i, xx: c + op(xx + c * 0)[0, 0] * 1e-9, x, n_iter=8, n_rep=2)
    dt_pl_bwd = _timed_inner(
        lambda c, i, xx: c + jax.grad(lambda y: op(y).sum())(xx + c * 0)[0, 0] * 1e-9,
        x, n_iter=8, n_rep=2)
    dt_xla = _timed_inner(
        lambda c, i, xx, v: c + _seg.spmm(graph, v, xx + c * 0)[0, 0] * 1e-9,
        x, vals_j, n_iter=8, n_rep=2)
    dt_xla_bwd = _timed_inner(
        lambda c, i, xx, v: c + jax.grad(lambda y: _seg.spmm(graph, v, y).sum())(xx + c * 0)[0, 0] * 1e-9,
        x, vals_j, n_iter=8, n_rep=2)

    dt = min(dt_pl, dt_xla)
    out = {
        "spmm_ms": round(dt * 1000, 3),
        "spmm_pallas_ms": round(dt_pl * 1000, 3),
        "spmm_pallas_bwd_ms": round(dt_pl_bwd * 1000, 3),
        "spmm_xla_ms": round(dt_xla * 1000, 3),
        "spmm_xla_bwd_ms": round(dt_xla_bwd * 1000, 3),
        "spmm_winner": "pallas" if dt_pl <= dt_xla else "xla",
    }
    # memory roofline on the winner: gather traffic (bf16 rows, lane-padded
    # width) + aligned output writeback
    d_al = ((d + 127) // 128) * 128
    out.update(_roofline("spmm", dt, flops=2.0 * 2 * n_edges * d,
                         bytes_accessed=L.e_aligned * d_al * 2 + L.n_tiles * L.nb * d_al * 4))
    # useful (algorithmic) flops: 2*nnz*d
    out["spmm_useful_tflops"] = round(2.0 * 2 * n_edges * d / dt / 1e12, 3)

    # full LightGCN training batch at Amazon scale: 3 propagation rounds
    # fwd+bwd + BPR loss + Adam, the reference's per-batch unit of work
    try:
        out.update(_bench_lightgcn_step(graph, vals, n_users, n_items))
    except Exception as e:  # noqa: BLE001
        out["lightgcn_step_error"] = _err(e)
    return out


def _bench_lightgcn_step(graph, vals, n_users, n_items, d=64, bs=8192, npp=5):
    """One full LightGCN mini-batch step (train_lightgcn.py:313-336 protocol:
    8192 positives x 5 negatives, 3-round propagation inside the step)."""
    import jax
    import jax.numpy as jnp
    import optax

    from plotpointe_tpu.models.lightgcn import LightGCNModel
    from plotpointe_tpu.ops.spmm_kernel import make_spmm
    from plotpointe_tpu.train.losses import LOSSES
    from plotpointe_tpu.train.trainer import make_optimizer

    model = LightGCNModel(n_users=n_users, n_items=n_items, embed_dim=d, n_prop_layers=3)
    params = model.init(jax.random.key(0))
    op = make_spmm(graph, vals)
    tx = make_optimizer(5e-4, 1e-5)
    opt_state = tx.init(params)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.integers(0, n_users, bs).astype(np.int32))
    i = jnp.asarray(rng.integers(0, n_items, bs).astype(np.int32))
    j = jnp.asarray(rng.integers(0, n_items, (bs, npp)).astype(np.int32))

    @jax.jit
    def step(params, opt_state, u, i, j):
        def loss_fn(p):
            us, it = model.propagate(p, graph, None, spmm_op=op)
            pos = jnp.sum(us[u] * it[i], axis=-1)
            neg = jnp.sum(us[u][:, None, :] * it[j], axis=-1)
            return LOSSES["bpr"](jnp.repeat(pos[:, None], npp, 1).reshape(-1), neg.reshape(-1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def steps_run(p, o, u, i, j):
        def body(c, _):
            p, o = c
            p, o, loss = step(p, o, u, i, j)
            return (p, o), loss
        (_, _), losses = jax.lax.scan(body, (p, o), None, length=4)
        return losses[-1]

    float(steps_run(params, opt_state, u, i, j))
    t0 = time.perf_counter()
    float(steps_run(params, opt_state, u, i, j))
    dt = (time.perf_counter() - t0) / 4
    n_batches = 1_689_116 // 8192  # train interactions / batch size
    return {
        "lightgcn_step_ms": round(dt * 1000, 2),
        "lightgcn_epoch_s_est": round(dt * n_batches, 2),
    }


def _bench_encoders(img_batch=128, txt_batch=256):
    """Embedding-stage encoder throughput on device, bf16 compute.

    Reference counterpart: CLIP ViT-B/32 image embedding takes ~3-4 h for
    ~150k items on one L4 (`scripts/parallel_pipeline.sh:56`) ~= 10-14 img/s
    wall (network-download-bound per item, `embed_image.py:120-136`); text is
    MiniLM at batch 128 (`embed_text.py:109-115`, throughput unpublished).
    Ours measures the pure on-device encode path (the ingest path is
    file-based and overlaps with compute via chunking)."""
    import jax
    import jax.numpy as jnp

    from plotpointe_tpu.models.encoders import TransformerTextEncoder, ViTImageEncoder

    out = {}
    bf16 = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16), t)  # noqa: E731
    rng = np.random.default_rng(0)

    vit = ViTImageEncoder()
    vparams = bf16(vit.init(jax.random.key(0)))
    imgs = jnp.asarray(rng.random((img_batch, 224, 224, 3), dtype=np.float32), jnp.bfloat16)
    vfn = jax.jit(vit.apply)
    float(vfn(vparams, imgs)[0, 0].astype(jnp.float32))  # compile
    t0 = time.perf_counter()
    for _ in range(10):
        v = vfn(vparams, imgs)
    float(v[0, 0].astype(jnp.float32))  # host read (see _bench_gat_train)
    dt = (time.perf_counter() - t0) / 10
    out["vit_b32_img_per_sec"] = round(img_batch / dt)
    # reference wall: 150k items / 3.5h midpoint = 11.9 img/s
    out["vit_b32_vs_baseline"] = round((img_batch / dt) / 11.9, 1)

    txt = TransformerTextEncoder()
    tparams = bf16(txt.init(jax.random.key(1)))
    ids = jnp.asarray(rng.integers(0, txt.vocab_size, (txt_batch, txt.max_len)).astype(np.int32))
    mask = jnp.ones((txt_batch, txt.max_len), jnp.bfloat16)
    tfn = jax.jit(txt.apply)
    float(tfn(tparams, ids, mask)[0, 0].astype(jnp.float32))  # compile
    t0 = time.perf_counter()
    for _ in range(10):
        t = tfn(tparams, ids, mask)
    float(t[0, 0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / 10
    out["minilm_txt_per_sec"] = round(txt_batch / dt)
    return out


def _bench_serving(n_items=498_196, d=128, k=20, batch=8):
    """Top-K retrieval over the full reference catalog size (serving/runtime.py:67
    scores 498k items per request on CPU numpy)."""
    import jax
    import jax.numpy as jnp

    from plotpointe_tpu.ops.topk_kernel import topk_mips_pallas, topk_mips_xla

    rng = np.random.default_rng(0)
    items = jnp.asarray(rng.normal(size=(n_items, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))

    out = {}
    for name, fn in (("xla", topk_mips_xla), ("pallas", topk_mips_pallas)):
        try:
            def body(c, i_, it, qq, fn=fn):
                _, v = fn(it, qq + c.astype(qq.dtype), k)
                return c + v[0, 0].astype(jnp.float32) * 1e-9

            dt = _timed_inner(body, items, q, n_iter=16, n_rep=2)
            out[f"serve_topk_{name}_ms"] = round(dt * 1000, 3)
            out[f"serve_topk_{name}_qps"] = round(batch / dt)
            if name == "pallas":
                # memory-bound: streams the [n_items, d] f32 table once
                out.update(_roofline("topk", dt, flops=2.0 * batch * n_items * d,
                                     bytes_accessed=n_items * d * 4.0))
        except Exception as e:  # noqa: BLE001
            out[f"serve_topk_{name}_error"] = _err(e)

    # bf16-streamed variant: the production serving config (2x stream traffic
    # saved; scores re-derived exactly in f32 by the kernel wrapper)
    try:
        items_bf = items.astype(jnp.bfloat16)
        q_bf = q.astype(jnp.bfloat16)

        def body_bf(c, i_, it, qq):
            _, v = topk_mips_pallas(it, qq + c.astype(jnp.bfloat16), k)
            return c + v[0, 0] * 1e-9

        dt = _timed_inner(body_bf, items_bf, q_bf, n_iter=16, n_rep=2)
        out["serve_topk_pallas_bf16_ms"] = round(dt * 1000, 3)
        out["serve_topk_pallas_bf16_qps"] = round(batch / dt)
        out.update(_roofline("topk_bf16", dt, flops=2.0 * batch * n_items * d,
                             bytes_accessed=n_items * d * 2.0))
    except Exception as e:  # noqa: BLE001
        out["serve_topk_pallas_bf16_error"] = _err(e)

    # batch-scaled production line: one catalog stream amortized over 64
    # queries (the stream floor is per-BATCH, so QPS scales near-linearly
    # until the wider selection merge catches up)
    try:
        big = 64
        q64 = jnp.asarray(rng.normal(size=(big, d)).astype(np.float32)).astype(jnp.bfloat16)

        def body_64(c, i_, it, qq):
            _, v = topk_mips_pallas(it, qq + c.astype(jnp.bfloat16), k)
            return c + v[0, 0] * 1e-9

        dt = _timed_inner(body_64, items_bf, q64, n_iter=16, n_rep=2)
        out["serve_topk_pallas_bf16_b64_ms"] = round(dt * 1000, 3)
        out["serve_topk_pallas_bf16_b64_qps"] = round(big / dt)
    except Exception as e:  # noqa: BLE001
        out["serve_topk_pallas_bf16_b64_error"] = _err(e)
    return out


def main():
    import jax

    try:  # persistent compile cache: repeat driver runs skip XLA compiles
        jax.config.update("jax_compilation_cache_dir", "/tmp/plotpointe_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass

    device = str(jax.devices()[0])
    result = {}

    try:  # measured ceilings for honest SOL fractions (shared device << spec)
        from plotpointe_tpu.utils.profiling import measure_device_peaks

        _PEAKS.update(measure_device_peaks(_timed_inner))
        result["device_tflops_measured"] = round(_PEAKS["tflops"], 1)
        result["device_hbm_gbps_measured"] = round(_PEAKS["hbm_gbps"], 1)
    except Exception as e:  # noqa: BLE001
        result["peak_calib_error"] = _err(e)

    # -- headline: kNN build, with retries + reduced-config fallback ---------
    knn_ok = False
    knn_errors = []
    for impl, br in (("pallas", 1024), ("pallas", 1024), ("xla", 512)):
        try:
            knn_s, knn_dev_s, knn_mfu = _bench_knn(impl=impl, block_rows=br)
            result["metric"] = "ii_knn_63001x384_k20_build_time"
            result["value"] = round(knn_s, 4)
            result["unit"] = "s"
            baseline_s = 100.40  # PHASE0_REPORT.md:180-183, n1-highmem-8
            result["vs_baseline"] = round(baseline_s / knn_s, 2)
            result["knn_device_only_s"] = round(knn_dev_s, 4)
            result["knn_impl"] = impl
            result.update(knn_mfu)
            knn_ok = True
            break
        except Exception as e:  # noqa: BLE001
            knn_errors.append(f"{impl}: {_err(e)}")
    if not knn_ok:
        result["knn_errors"] = knn_errors[:3]

    try:
        step_time, fwd_time, eps, loss, _ = _bench_gat_train(attn_impl="xla")
        result["gat_xla_step_time_s"] = round(step_time, 4)
        result["gat_xla_fwd_time_s"] = round(fwd_time, 4)
        result["gat_loss"] = round(loss, 4)
        best_eps = eps
    except Exception as e:  # noqa: BLE001 - record the failure, keep the headline metric
        result["gat_bench_error"] = _err(e)
        best_eps = 0.0

    try:
        p_step, p_fwd, p_eps, p_loss, p_mfu = _bench_gat_train(attn_impl="pallas")
        result["gat_pallas_step_time_s"] = round(p_step, 4)
        result["gat_pallas_fwd_time_s"] = round(p_fwd, 4)
        result["gat_pallas_loss"] = round(p_loss, 4)
        result.update(p_mfu)
        best_eps = max(best_eps, p_eps)
    except Exception as e:  # noqa: BLE001
        result["gat_pallas_bench_error"] = _err(e)

    if best_eps:
        # full train step (sampling+fwd+bwd+Adam) over 2*|E| directed edges x layers
        result["gat_train_edges_per_sec"] = round(best_eps)

    try:
        result.update(_bench_gat_heads2())
    except Exception as e:  # noqa: BLE001
        result["gat_heads2_error"] = _err(e)

    try:
        ui_s = _bench_ui_build()
        result["ui_build_s"] = round(ui_s, 4)
        result["ui_build_vs_baseline"] = round(11.02 / ui_s, 1)  # PHASE0_REPORT.md:172-173
        if not knn_ok:
            # fallback headline so the driver always records a populated metric
            result["metric"] = "ui_build_1689116_edges_time"
            result["value"] = round(ui_s, 4)
            result["unit"] = "s"
            result["vs_baseline"] = round(11.02 / ui_s, 2)
    except Exception as e:  # noqa: BLE001
        result["ui_build_error"] = _err(e)

    try:
        result.update(_bench_spmm())
    except Exception as e:  # noqa: BLE001
        result["spmm_error"] = _err(e)

    try:
        result.update(_bench_encoders())
    except Exception as e:  # noqa: BLE001
        result["encoder_error"] = _err(e)

    try:
        result.update(_bench_serving())
    except Exception as e:  # noqa: BLE001
        result["serving_error"] = _err(e)

    if "metric" not in result:  # last-resort: never emit an unkeyed line
        result.update({"metric": "ii_knn_63001x384_k20_build_time", "value": None,
                       "unit": "s", "vs_baseline": 0.0})

    result["device"] = device
    print(json.dumps(result))


if __name__ == "__main__":
    main()
