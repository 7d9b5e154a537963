#!/usr/bin/env python3
"""Benchmark driver — prints ONE JSON line summarizing performance vs baseline.

Headline metric: build time of the item-item cosine-kNN graph at the
reference's exact published shape (63,001 items x 384d text embeddings, k=20,
min_sim 0.3) — the reference's only hard throughput number: 100.40 s on an
n1-highmem-8 CPU (`PHASE0_REPORT.md:180-183`). vs_baseline = baseline_s / ours
(higher is better, >1 means faster than the reference).

Extra fields in the same JSON line (no reference counterpart, recorded for
round-over-round tracking):
  - gat_train_edges_per_sec: full train step (sample+fwd+bwd+Adam) throughput
    on an Amazon-Electronics-scale synthetic graph, edges x layers / step_time
  - gat_step_time_s, eval_users_per_sec, device
"""
from __future__ import annotations

import json
import time

import numpy as np


def _bench_knn():
    import jax
    import jax.numpy as jnp

    from plotpointe_tpu.graphs.knn import cosine_knn

    n, d, k = 63_001, 384, 20
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    # pre-place on device: the reference's 100.4 s baseline is compute with
    # data already in RAM; this environment's host<->device relay (~30 MB/s)
    # is a tunnel artifact, not part of the kernel being measured
    xd = jnp.asarray(x)

    # warmup/compile (full shape so the block program is cached)
    jax.block_until_ready(cosine_knn(xd, k=k, min_similarity=0.3, block_rows=1024)[0].shape)
    t0 = time.perf_counter()
    idx, sim, valid = cosine_knn(xd, k=k, min_similarity=0.3, block_rows=1024)
    dt = time.perf_counter() - t0

    # device-only portion (excludes the [N,k] result readback, which on this
    # environment crosses a ~30 MB/s tunnel relay; real hosts pay PCIe rates)
    from plotpointe_tpu.graphs.knn import _knn_blocks

    n_pad = ((n + 1023) // 1024) * 1024  # _knn_blocks needs rows % block_rows == 0
    xp = jnp.concatenate([xd, jnp.zeros((n_pad - n, d), jnp.float32)], axis=0)
    jax.block_until_ready(_knn_blocks(xp, k, 1024))  # warmup/compile
    t0 = time.perf_counter()
    didx, dsim = _knn_blocks(xp, k, 1024)
    float(dsim[0, 0])  # host read, not block_until_ready (see _bench_gat_train)
    dev_dt = time.perf_counter() - t0
    return dt, dev_dt


def _bench_gat_train(
    n_users=192_403, n_items=63_001, n_edges=1_689_116, hidden=128, layers=2, batch=200_000,
    attn_impl="xla",
):
    """Train-step throughput at Amazon Electronics scale (synthetic ids)."""
    import jax

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
    jax.block_until_ready(loss)

    n_steps = 5
    t0 = time.perf_counter()
    for s in range(n_steps):
        params, opt_state, loss = trainer._train_step(params, opt_state, jax.random.key(2 + s))
    loss_val = float(loss)  # host read: forces the full chain (block_until_ready
    # has returned early through the remote relay before, yielding bogus times)
    step_time = (time.perf_counter() - t0) / n_steps

    # forward-only (the eval/export/serving path, where the Pallas kernel runs)
    U, I = trainer._forward_eval(params)
    float(I[0, 0])
    t0 = time.perf_counter()
    for _ in range(5):
        U, I = trainer._forward_eval(params)
    float(I[0, 0])  # host read, same reason as above
    fwd_time = (time.perf_counter() - t0) / 5

    directed_edges = 2 * n_edges
    edges_per_sec = directed_edges * layers / step_time
    return step_time, fwd_time, edges_per_sec, loss_val


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
            i, v = fn(items, q, k)
            jax.block_until_ready(v)
            t0 = time.perf_counter()
            for _ in range(10):
                i, v = fn(items, q, k)
            float(v[0, 0])  # host read (see _bench_gat_train)
            dt = (time.perf_counter() - t0) / 10
            out[f"serve_topk_{name}_ms"] = round(dt * 1000, 3)
            out[f"serve_topk_{name}_qps"] = round(batch / dt)
        except Exception as e:  # noqa: BLE001
            out[f"serve_topk_{name}_error"] = f"{type(e).__name__}: {e}"[:160]
    return out


def main():
    import jax

    device = str(jax.devices()[0])
    result = {}

    knn_s, knn_dev_s = _bench_knn()
    result["metric"] = "ii_knn_63001x384_k20_build_time"
    result["value"] = round(knn_s, 4)
    result["unit"] = "s"
    baseline_s = 100.40  # PHASE0_REPORT.md:180-183, n1-highmem-8
    result["vs_baseline"] = round(baseline_s / knn_s, 2)
    result["knn_device_only_s"] = round(knn_dev_s, 4)

    try:
        step_time, fwd_time, eps, loss = _bench_gat_train(attn_impl="xla")
        result["gat_xla_step_time_s"] = round(step_time, 4)
        result["gat_xla_fwd_time_s"] = round(fwd_time, 4)
        result["gat_loss"] = round(loss, 4)
        best_eps = eps
    except Exception as e:  # noqa: BLE001 - record the failure, keep the headline metric
        result["gat_bench_error"] = f"{type(e).__name__}: {e}"[:200]
        best_eps = 0.0

    try:
        p_step, p_fwd, p_eps, p_loss = _bench_gat_train(attn_impl="pallas")
        result["gat_pallas_step_time_s"] = round(p_step, 4)
        result["gat_pallas_fwd_time_s"] = round(p_fwd, 4)
        result["gat_pallas_loss"] = round(p_loss, 4)
        best_eps = max(best_eps, p_eps)
    except Exception as e:  # noqa: BLE001
        result["gat_pallas_bench_error"] = f"{type(e).__name__}: {e}"[:200]

    if best_eps:
        # full train step (sampling+fwd+bwd+Adam) over 2*|E| directed edges x layers
        result["gat_train_edges_per_sec"] = round(best_eps)

    try:
        ui_s = _bench_ui_build()
        result["ui_build_s"] = round(ui_s, 4)
        result["ui_build_vs_baseline"] = round(11.02 / ui_s, 1)  # PHASE0_REPORT.md:172-173
    except Exception as e:  # noqa: BLE001
        result["ui_build_error"] = f"{type(e).__name__}: {e}"[:160]

    try:
        result.update(_bench_encoders())
    except Exception as e:  # noqa: BLE001
        result["encoder_error"] = f"{type(e).__name__}: {e}"[:160]

    result.update(_bench_serving())

    result["device"] = device
    print(json.dumps(result))


if __name__ == "__main__":
    main()
