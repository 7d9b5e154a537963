#!/usr/bin/env python3
"""Benchmark driver — prints ONE JSON line summarizing performance vs baseline.

Headline metric: build time of the item-item cosine-kNN graph at the
reference's exact published shape (63,001 items x 384d text embeddings, k=20,
min_sim 0.3) — the reference's only hard throughput number: 100.40 s on an
n1-highmem-8 CPU (`PHASE0_REPORT.md:180-183`). vs_baseline = baseline_s / ours
(higher is better, >1 means faster than the reference).

Survivability contract (the round-3 lesson — rc=124 recorded nothing):
  * Sections run headline-first in a fixed priority order; each section's
    results merge into the shared dict the moment it finishes and are flushed
    to docs/results/bench_partial.json incrementally.
  * A watchdog thread enforces a global wall budget (BENCH_BUDGET_S, default
    900 s). When it expires — even if the main thread is wedged inside a
    remote compile — it prints the cumulative JSON line and os._exit(0)s.
  * SIGTERM/SIGINT print the cumulative line before dying.
  * Before each section starts, its cost estimate is checked against the
    remaining budget; too-expensive sections are skipped AND recorded.
  * Exactly one JSON line is ever printed (guarded by a flag+lock), so the
    driver's tail-parse always sees a single, populated object.
  * No jax_compilation_cache_dir: with the remote-compile backend the
    persistent cache can hang compilation indefinitely.

`--fast` runs a seconds-scale CPU tier of the same section registry (used in
CI to guard the bench's structure; numbers are meaningless there).

Extra fields (no reference counterpart, recorded for round tracking):
  - gat_train_edges_per_sec: full train step (sample+fwd+bwd+Adam) throughput
  - mfu_*: per-kernel roofline accounting (achieved TFLOP/s + speed-of-light
    fraction via utils/profiling.Roofline) for attention, SpMM, kNN, top-K
  - gat_scaling_*: virtual-8-device collective audit + predicted ICI
    efficiency (tools/scaling_audit.py subprocess)
  - sections_skipped / *_error: what did not run, and why
"""
from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

import numpy as np

# ---------------------------------------------------------------------------
# Survivable result emission
# ---------------------------------------------------------------------------

_T0 = time.perf_counter()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "900"))
_LOCK = threading.Lock()
_RESULT: dict = {}
_PRINTED = False
_PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "docs", "results", "bench_partial.json")


def _left() -> float:
    return _BUDGET_S - (time.perf_counter() - _T0)


def _merge(d: dict) -> None:
    with _LOCK:
        _RESULT.update(d)
    try:
        os.makedirs(os.path.dirname(_PARTIAL_PATH), exist_ok=True)
        with open(_PARTIAL_PATH + ".tmp", "w") as f:
            json.dump(_RESULT, f)
        os.replace(_PARTIAL_PATH + ".tmp", _PARTIAL_PATH)
    except Exception:  # noqa: BLE001 - partial file is best-effort
        pass


def _finalize_and_print() -> None:
    """Compute deferred rooflines, ensure a headline, print the single line."""
    global _PRINTED
    with _LOCK:
        if _PRINTED:
            return
        _PRINTED = True
        _apply_rooflines(_RESULT)
        if "metric" not in _RESULT:
            # fallback headline so the driver always records a populated line
            if "ui_build_s" in _RESULT:
                _RESULT.update({"metric": "ui_build_1689116_edges_time",
                                "value": _RESULT["ui_build_s"], "unit": "s",
                                "vs_baseline": round(11.02 / _RESULT["ui_build_s"], 2)})
            else:
                _RESULT.update({"metric": "ii_knn_63001x384_k20_build_time",
                                "value": None, "unit": "s", "vs_baseline": 0.0})
        # honest record of what never completed (remote-compile latency
        # varies ~3x run-to-run, so the watchdog can fire mid-section)
        try:
            missing = [n for n in _INTENDED
                       if f"sec_{n}_s" not in _RESULT and f"{n}_error" not in _RESULT]
            if missing:
                _RESULT.setdefault("sections_skipped", [])
                _RESULT["sections_skipped"] = sorted(set(_RESULT["sections_skipped"]) | set(missing))
        except Exception:  # noqa: BLE001
            pass
        _RESULT["bench_wall_s"] = round(time.perf_counter() - _T0, 1)
        line = json.dumps(_RESULT)
    print(line, flush=True)


def _watchdog() -> None:
    while True:
        rem = _left()
        if rem <= 0:
            _RESULT["bench_timeout"] = True
            _finalize_and_print()
            os._exit(0)
        time.sleep(min(rem, 5.0))


def _on_signal(signum, frame):  # noqa: ANN001
    _RESULT["bench_signal"] = int(signum)
    _finalize_and_print()
    os._exit(0)


def _err(e: Exception) -> str:
    return f"{type(e).__name__}: {e}"[:200]


# ---------------------------------------------------------------------------
# Deferred roofline accounting (computed at finalize so the peak-calibration
# section can run after the headline sections, or be skipped entirely)
# ---------------------------------------------------------------------------

_PEAKS: dict = {}
_ROOFS: list = []  # (name, seconds, flops, bytes, dtype_key)
_INTENDED: list = []  # sections this invocation means to run (mode-filtered)


def _roof(name: str, seconds: float, flops: float, bytes_accessed: float,
          dtype_key: str = "bf16_tflops") -> None:
    with _LOCK:
        _ROOFS.append((name, seconds, flops, bytes_accessed, dtype_key))


def _apply_rooflines(result: dict) -> None:
    try:
        from plotpointe_tpu.utils.profiling import Roofline
    except Exception:  # noqa: BLE001
        return
    for name, seconds, flops, bytes_accessed, dtype_key in _ROOFS:
        try:
            rep = Roofline(name=name, seconds=seconds, flops=flops,
                           bytes_accessed=bytes_accessed, dtype_tflops_key=dtype_key,
                           measured_peaks=_PEAKS or None).report()
            result[f"mfu_{name}_tflops"] = round(rep["achieved_tflops"], 2)
            result[f"mfu_{name}_sol"] = round(rep["sol_fraction"], 3)
            result[f"mfu_{name}_bound"] = rep["bound_by"]
            if "sol_fraction_dev" in rep:
                # fraction of what THIS device actually delivers (shared /
                # virtualized slice well below chip spec)
                result[f"mfu_{name}_sol_dev"] = round(min(rep["sol_fraction_dev"], 1.0), 3)
        except Exception:  # noqa: BLE001
            pass


def _timed_call(body, *args, n_iter=16, n_rep=3):
    """Best total wall seconds for ONE call running `body(carry, i, *args)
    -> carry` n_iter times inside a jitted lax.scan (carry-chained so
    nothing is elided or overlapped), host-read once per rep.

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
    return best


_FLOOR = {"s": None}


def _dispatch_floor() -> float:
    """One-time calibration of the fixed per-call cost of the scan harness
    (remote dispatch RPC + host readback — measured ~26 ms through the axon
    tunnel, identical for trivial and 64 MB-argument bodies). Subtracted
    from every measurement: at n_iter=16 the floor otherwise inflates every
    sub-10 ms kernel by ~1.6 ms/iteration (round-4 captures carried it)."""
    if _FLOOR["s"] is None:
        import jax.numpy as jnp

        _FLOOR["s"] = 0.0  # re-entrancy guard while calibrating
        tiny = jnp.ones((8, 128), jnp.float32)

        def body(c, i, t):
            return c + t[0, 0] * 1e-12 + c * 1e-12

        try:
            _FLOOR["s"] = _timed_call(body, tiny, n_iter=8, n_rep=3)
            _merge({"dispatch_floor_ms": round(_FLOOR["s"] * 1000, 2)})
        except Exception:  # noqa: BLE001 - no device: floor stays 0
            pass
    return _FLOOR["s"]


def _timed_inner(body, *args, n_iter=16, n_rep=3):
    """Floor-corrected device seconds per iteration (see _dispatch_floor)."""
    best = _timed_call(body, *args, n_iter=n_iter, n_rep=n_rep)
    return max(best - _dispatch_floor(), best * 0.05) / n_iter


# ---------------------------------------------------------------------------
# Sections. Each takes the mode's parameter dict P and returns a dict.
# ---------------------------------------------------------------------------


def _sec_knn(P) -> dict:
    import jax.numpy as jnp

    from plotpointe_tpu.graphs.knn import _knn_blocks, cosine_knn
    from plotpointe_tpu.ops.knn_kernel import knn_topk_pallas

    n, d, k = P["knn_n"], P["knn_d"], P["knn_k"]
    block_rows = P["knn_block_rows"]
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    # pre-place on device: the reference's 100.4 s baseline is compute with
    # data already in RAM; this environment's host<->device relay (~30 MB/s)
    # is a tunnel artifact, not part of the kernel being measured
    xd = jnp.asarray(x)

    out: dict = {}
    errors = []
    for impl in P["knn_impls"]:
        try:
            # warmup/compile (full shape so the block program is cached)
            cosine_knn(xd, k=k, min_similarity=0.3, block_rows=block_rows, impl=impl)
            t0 = time.perf_counter()
            cosine_knn(xd, k=k, min_similarity=0.3, block_rows=block_rows, impl=impl)
            dt = time.perf_counter() - t0

            # device-only portion via the in-jit scan harness (excludes the
            # [N,k] result readback AND the per-dispatch tunnel latency)
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

            out["metric"] = "ii_knn_63001x384_k20_build_time"
            out["value"] = round(dt, 4)
            out["unit"] = "s"
            out["vs_baseline"] = round(100.40 / dt, 2)  # PHASE0_REPORT.md:180-183
            out["knn_device_only_s"] = round(dev_dt, 4)
            out["knn_impl"] = impl
            if impl == "pallas":
                try:  # approximate build (bf16 scoring + slot pre-reduction)
                    def knn_body_fast(c, i, x):
                        _, sim = knn_topk_pallas(x + c * 0, k, mode="fast")
                        return c + sim[0, 0] * 1e-9

                    out["knn_device_fast_s"] = round(
                        _timed_inner(knn_body_fast, xd, n_iter=4, n_rep=2), 4)
                except Exception as e:  # noqa: BLE001
                    out["knn_fast_error"] = _err(e)
            # dominant op: [n_pad, d] x [d, n_pad] similarity matmul at
            # f32-faithful MXU precision
            _roof("knn", dev_dt, flops=2.0 * n_pad * n_pad * d,
                  bytes_accessed=2.0 * n_pad * d * 4, dtype_key="f32_tflops")
            return out
        except Exception as e:  # noqa: BLE001
            errors.append(f"{impl}: {_err(e)}")
    out["knn_errors"] = errors[:3]
    return out


def _gat_train_core(P, attn_impl: str, time_fwd: bool = True):
    """Train-step throughput at Amazon Electronics scale (synthetic ids)."""
    import jax
    import jax.numpy as jnp

    from plotpointe_tpu.config import TrainConfig
    from plotpointe_tpu.data.splits import Splits
    from plotpointe_tpu.graphs.csr import build_bipartite_graph
    from plotpointe_tpu.models.gat import GATModel
    from plotpointe_tpu.train.trainer import Trainer

    n_users, n_items, n_edges = P["gat_users"], P["gat_items"], P["gat_edges"]
    hidden, layers, batch = P["gat_hidden"], 2, P["gat_batch"]
    feat_dim = P["gat_feat_dim"]
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
    feats = rng.normal(size=(n_items, feat_dim)).astype(np.float32)

    cfg = TrainConfig(hidden_dim=hidden, layers=layers, samples_per_epoch=batch,
                      item_features="txt", attn_impl=attn_impl)
    model = GATModel(n_users=n_users, n_items=n_items, feat_dim=feat_dim, hidden_dim=hidden,
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
    wall = time.perf_counter() - t0
    step_time = max(wall - _dispatch_floor(), wall * 0.05) / 4

    # forward-only (the eval/export/serving path, where the Pallas kernel
    # runs); params ride as scan args, not closure constants
    fwd_time = 0.0
    if time_fwd:
        def fwd_body(c, i, p):
            U, I = trainer._forward_eval(jax.tree.map(lambda t: t + c * 0, p))
            return c + I[0, 0] * 1e-9

        fwd_time = _timed_inner(fwd_body, params, n_iter=8, n_rep=2)

    if attn_impl == "pallas" and trainer.graph.layout is not None:
        # per-layer one-hot-matmul kernel flops (cost model in ops/gat_fused.py)
        L = trainer.graph.layout
        kflops = 2.0 * L.n_chunks * L.nb * L.eb * hidden * layers
        kbytes = (L.e_aligned * hidden * 2 + L.n_tiles * L.nb * hidden * 4) * layers
        _roof("gat_attn_fwd", fwd_time, flops=kflops, bytes_accessed=kbytes)

    directed_edges = 2 * n_edges
    edges_per_sec = directed_edges * layers / step_time
    return step_time, fwd_time, edges_per_sec, loss_val


def _sec_gat_xla(P) -> dict:
    # fwd-only timing skipped: the XLA impl is the comparison line, and its
    # extra compile (~40 s through the remote tunnel) pushed the full suite
    # past the driver budget in round 4
    step_time, _, eps, loss = _gat_train_core(P, "xla", time_fwd=False)
    # keep the best step throughput across impls (pallas runs first)
    best = max(eps, _RESULT.get("gat_train_edges_per_sec", 0))
    return {"gat_xla_step_time_s": round(step_time, 4),
            "gat_loss": round(loss, 4),
            "gat_train_edges_per_sec": round(best)}


def _sec_gat_pallas(P) -> dict:
    step_time, fwd_time, eps, loss = _gat_train_core(P, "pallas")
    out = {"gat_pallas_step_time_s": round(step_time, 4),
           "gat_pallas_fwd_time_s": round(fwd_time, 4),
           "gat_pallas_loss": round(loss, 4)}
    prev = _RESULT.get("gat_train_edges_per_sec", 0)
    out["gat_train_edges_per_sec"] = round(max(eps, prev))
    return out


def _sec_gat_kernels(P) -> dict:
    """Layer-level attention kernel timings at Amazon scale: heads=1
    forward/backward with backward MFU accounting (round-4 left ~160 ms of
    step time unprofiled), and the head-packed heads=2 fwd + fused fwd/bwd
    (the reference's --heads ablation, train_gat_pyg.py:203)."""
    import jax
    import jax.numpy as jnp

    from plotpointe_tpu.graphs.csr import build_bipartite_graph
    from plotpointe_tpu.ops.gat_kernel import segment_softmax_attention_pallas

    n_users, n_items, n_edges = P["gat_users"], P["gat_items"], P["gat_edges"]
    d = P["gat_hidden"]
    rng = np.random.default_rng(0)
    tu = rng.integers(0, n_users, n_edges).astype(np.int32)
    ti = rng.integers(0, n_items, n_edges).astype(np.int32)
    g = build_bipartite_graph(tu, ti, n_users, n_items).with_layout().to_device()
    L = g.layout
    out: dict = {}

    def fwd_body(heads):
        h = jnp.asarray(rng.normal(size=(g.n_nodes, heads, d)).astype(np.float32) * 0.1)
        a_s = jnp.asarray(rng.normal(size=(heads, d)).astype(np.float32))
        a_d = jnp.asarray(rng.normal(size=(heads, d)).astype(np.float32))

        def body(c, i, h, a_s, a_d):
            o = segment_softmax_attention_pallas(h + c * 0, a_s, a_d, g)
            return c + o[0, 0, 0] * 1e-9

        def bodyb(c, i, h, a_s, a_d):
            gr = jax.grad(lambda hh: jnp.sum(
                segment_softmax_attention_pallas(hh, a_s, a_d, g) ** 2))(h + c * 0)
            return c + gr[0, 0, 0] * 1e-9

        return (h, a_s, a_d), body, bodyb

    args1, b1, bb1 = fwd_body(1)
    dt_f1 = _timed_inner(b1, *args1, n_iter=8, n_rep=2)
    dt_fb1 = _timed_inner(bb1, *args1, n_iter=8, n_rep=2)
    out["gat_attn_layer_fwd_ms"] = round(dt_f1 * 1000, 2)
    out["gat_attn_layer_fwdbwd_ms"] = round(dt_fb1 * 1000, 2)
    # backward = fwd+bwd - fwd; traffic model: B1 re-reads the hs stream,
    # B2 reads the gathered Gt rows + the 128-lane scalar table, and the two
    # node-table gathers write those streams once each (bf16 rows)
    bwd_s = max(dt_fb1 - dt_f1, 1e-6)
    e_al, e_al_t = L.e_aligned, L.n_chunks_t * L.eb
    bwd_bytes = e_al * d * 2.0 + e_al_t * (2 * d + 2 * 128) * 2.0
    bwd_flops = 4.0 * (L.n_chunks + L.n_chunks_t) * L.nb * L.eb * d
    _roof("gat_attn_bwd", bwd_s, flops=bwd_flops, bytes_accessed=bwd_bytes)

    args2, b2, bb2 = fwd_body(2)
    dt_f2 = _timed_inner(b2, *args2, n_iter=8, n_rep=2)
    out["gat_heads2_fwd_ms"] = round(dt_f2 * 1000, 2)
    out["gat_heads2_vs_heads1"] = round(dt_f2 / dt_f1, 2)
    if _left() > 60:
        dt_fb2 = _timed_inner(bb2, *args2, n_iter=8, n_rep=2)
        out["gat_heads2_fwdbwd_ms"] = round(dt_fb2 * 1000, 2)
    return out


def _sec_ui_build(P) -> dict:
    """U-I bipartite CSR build at the reference's exact scale: 11.02 s on
    n1-standard-4 (`PHASE0_REPORT.md:172-173`). Host-side (native C++ counting
    sort with numpy fallback) — no device involved."""
    from plotpointe_tpu.graphs.csr import build_bipartite_graph

    n_users, n_items, n_edges = P["gat_users"], P["gat_items"], P["gat_edges"]
    rng = np.random.default_rng(0)
    tu = rng.integers(0, n_users, n_edges).astype(np.int32)
    ti = rng.integers(0, n_items, n_edges).astype(np.int32)
    tw = rng.random(n_edges).astype(np.float32)
    build_bipartite_graph(tu, ti, n_users, n_items, weight=tw)  # warm page cache
    t0 = time.perf_counter()
    g = build_bipartite_graph(tu, ti, n_users, n_items, weight=tw)
    dt = time.perf_counter() - t0
    assert g.n_edges == 2 * n_edges  # symmetric u->i and i->u
    return {"ui_build_s": round(dt, 4),
            "ui_build_vs_baseline": round(11.02 / dt, 1)}


def _sec_spmm(P) -> dict:
    """LightGCN propagation kernel (replaces torch.sparse.mm,
    train_lightgcn.py:70-71) at the reference shape (embed_dim=64): the static
    Pallas operator (make_spmm: host-aligned weights, transpose-layout bwd)
    vs the XLA segment_sum golden — headline spmm_ms is the winner."""
    import jax
    import jax.numpy as jnp

    from plotpointe_tpu.graphs.csr import build_bipartite_graph, symmetric_normalized_weights
    from plotpointe_tpu.ops import segment as _seg
    from plotpointe_tpu.ops.spmm_kernel import make_spmm

    n_users, n_items, n_edges = P["gat_users"], P["gat_items"], P["gat_edges"]
    d = P["spmm_d"]
    rng = np.random.default_rng(0)
    tu = rng.integers(0, n_users, n_edges).astype(np.int32)
    ti = rng.integers(0, n_items, n_edges).astype(np.int32)
    graph = build_bipartite_graph(tu, ti, n_users, n_items).with_layout()
    vals = symmetric_normalized_weights(graph)
    vals_j = jnp.asarray(vals)
    L = graph.layout
    graph = graph.to_device()
    x = jnp.asarray(rng.normal(size=(graph.n_nodes, d)).astype(np.float32))

    out: dict = {}
    op = make_spmm(graph, vals)
    dt_pl = _timed_inner(lambda c, i, xx: c + op(xx + c * 0)[0, 0] * 1e-9, x, n_iter=8, n_rep=2)
    out["spmm_pallas_ms"] = round(dt_pl * 1000, 3)
    dt_xla = _timed_inner(
        lambda c, i, xx, v: c + _seg.spmm(graph, v, xx + c * 0)[0, 0] * 1e-9,
        x, vals_j, n_iter=8, n_rep=2)
    out["spmm_xla_ms"] = round(dt_xla * 1000, 3)
    dt = min(dt_pl, dt_xla)
    out["spmm_ms"] = round(dt * 1000, 3)
    out["spmm_winner"] = "pallas" if dt_pl <= dt_xla else "xla"
    # memory roofline on the winner: gather traffic (bf16 rows, lane-padded
    # width) + aligned output writeback
    d_al = ((d + 127) // 128) * 128
    _roof("spmm", dt, flops=2.0 * 2 * n_edges * d,
          bytes_accessed=L.e_aligned * d_al * 2 + L.n_tiles * L.nb * d_al * 4)
    out["spmm_useful_tflops"] = round(2.0 * 2 * n_edges * d / dt / 1e12, 3)

    if _left() > P["spmm_bwd_min_left_s"]:
        dt_pl_bwd = _timed_inner(
            lambda c, i, xx: c + jax.grad(lambda y: op(y).sum())(xx + c * 0)[0, 0] * 1e-9,
            x, n_iter=8, n_rep=2)
        out["spmm_pallas_bwd_ms"] = round(dt_pl_bwd * 1000, 3)
    else:
        out["spmm_bwd_skipped"] = True

    # full LightGCN training batch at Amazon scale: 3 propagation rounds
    # fwd+bwd + BPR loss + Adam, the reference's per-batch unit of work
    if _left() > P["spmm_bwd_min_left_s"]:
        try:
            out.update(_lightgcn_step(graph, vals, n_users, n_items, d=d,
                                      bs=P["lgcn_bs"], n_edges=n_edges))
        except Exception as e:  # noqa: BLE001
            out["lightgcn_step_error"] = _err(e)
    else:
        out["lightgcn_step_skipped"] = True
    return out


def _lightgcn_step(graph, vals, n_users, n_items, d, bs, n_edges, npp=5):
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
    wall = time.perf_counter() - t0
    dt = max(wall - _dispatch_floor(), wall * 0.05) / 4
    n_batches = max(1, n_edges // bs)  # train interactions / batch size
    return {"lightgcn_step_ms": round(dt * 1000, 2),
            "lightgcn_epoch_s_est": round(dt * n_batches, 2)}


def _sec_serving(P) -> dict:
    """Top-K retrieval over the full reference catalog size (serving/runtime.py:67
    scores 498k items per request on CPU numpy)."""
    import jax.numpy as jnp

    from plotpointe_tpu.ops.topk_kernel import topk_mips_pallas, topk_mips_xla

    n_items, d, k, batch = P["serve_items"], P["serve_d"], 20, P["serve_batch"]
    rng = np.random.default_rng(0)
    items = jnp.asarray(rng.normal(size=(n_items, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(batch, d)).astype(np.float32))

    out: dict = {}
    # bf16-streamed Pallas kernel FIRST: the production serving config
    items_bf = items.astype(jnp.bfloat16)
    q_bf = q.astype(jnp.bfloat16)
    try:
        def body_bf(c, i_, it, qq):
            _, v = topk_mips_pallas(it, qq + c.astype(jnp.bfloat16), k)
            return c + v[0, 0] * 1e-9

        dt = _timed_inner(body_bf, items_bf, q_bf, n_iter=32, n_rep=2)
        out["serve_topk_pallas_bf16_ms"] = round(dt * 1000, 3)
        out["serve_topk_pallas_bf16_qps"] = round(batch / dt)
        # stream + phase-2 chunk rescore (k+8 chunks x 128 rows per query)
        _roof("topk_bf16", dt, flops=2.0 * batch * n_items * d,
              bytes_accessed=n_items * d * 2.0 + batch * 28 * 128 * d * 2.0)
    except Exception as e:  # noqa: BLE001
        out["serve_topk_pallas_bf16_error"] = _err(e)

    # batch-scaled production line: one catalog stream amortized over 64
    # queries (the stream floor is per-BATCH, so QPS scales near-linearly
    # until the wider selection merge catches up)
    try:
        big = P["serve_batch_big"]
        q64 = jnp.asarray(rng.normal(size=(big, d)).astype(np.float32)).astype(jnp.bfloat16)

        def body_64(c, i_, it, qq):
            _, v = topk_mips_pallas(it, qq + c.astype(jnp.bfloat16), k)
            return c + v[0, 0] * 1e-9

        dt = _timed_inner(body_64, items_bf, q64, n_iter=32, n_rep=2)
        out["serve_topk_pallas_bf16_b64_ms"] = round(dt * 1000, 3)
        out["serve_topk_pallas_bf16_b64_qps"] = round(big / dt)
        _roof("topk_bf16_b64", dt, flops=2.0 * big * n_items * d,
              bytes_accessed=n_items * d * 2.0 + big * 28 * 128 * d * 2.0)

    except Exception as e:  # noqa: BLE001
        out["serve_topk_pallas_bf16_b64_error"] = _err(e)

    # f32 Pallas + XLA comparison lines
    for name, fn in (("pallas", topk_mips_pallas), ("xla", topk_mips_xla)):
        if name == "xla" and _left() < P["serve_xla_min_left_s"]:
            out["serve_topk_xla_skipped"] = True
            break
        try:
            def body(c, i_, it, qq, fn=fn):
                _, v = fn(it, qq + c.astype(qq.dtype), k)
                return c + v[0, 0].astype(jnp.float32) * 1e-9

            dt = _timed_inner(body, items, q, n_iter=32, n_rep=2)
            out[f"serve_topk_{name}_ms"] = round(dt * 1000, 3)
            out[f"serve_topk_{name}_qps"] = round(batch / dt)
            if name == "pallas":
                # memory-bound: streams the [n_items, d] f32 table once
                _roof("topk", dt, flops=2.0 * batch * n_items * d,
                      bytes_accessed=n_items * d * 4.0 + batch * 28 * 128 * d * 4.0)
        except Exception as e:  # noqa: BLE001
            out[f"serve_topk_{name}_error"] = _err(e)
    return out


def _sec_encoders(P) -> dict:
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

    img_batch, txt_batch = P["enc_img_batch"], P["enc_txt_batch"]
    out = {}
    bf16 = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16), t)  # noqa: E731
    rng = np.random.default_rng(0)

    vit = ViTImageEncoder()
    vparams = bf16(vit.init(jax.random.key(0)))
    imgs = jnp.asarray(rng.random((img_batch, 224, 224, 3), dtype=np.float32), jnp.bfloat16)
    vfn = jax.jit(vit.apply)
    float(vfn(vparams, imgs)[0, 0].astype(jnp.float32))  # compile
    t0 = time.perf_counter()
    for _ in range(6):
        v = vfn(vparams, imgs)
    float(v[0, 0].astype(jnp.float32))  # host read (see _timed_inner notes)
    wall = time.perf_counter() - t0
    dt = max(wall - _dispatch_floor(), wall * 0.05) / 6
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
    for _ in range(6):
        t = tfn(tparams, ids, mask)
    float(t[0, 0].astype(jnp.float32))
    wall = time.perf_counter() - t0
    dt = max(wall - _dispatch_floor(), wall * 0.05) / 6
    out["minilm_txt_per_sec"] = round(txt_batch / dt)
    return out


def _sec_peaks(P) -> dict:
    """Measured device ceilings for honest SOL fractions (shared device is
    well below chip spec). Runs AFTER the headline sections; rooflines are
    computed at finalize so they pick these up whenever this completes."""
    from plotpointe_tpu.utils.profiling import measure_device_peaks

    _PEAKS.update(measure_device_peaks(_timed_inner))
    return {"device_tflops_measured": round(_PEAKS["tflops"], 1),
            "device_hbm_gbps_measured": round(_PEAKS["hbm_gbps"], 1)}


def _sec_scaling(P) -> dict:
    """Multi-device scaling audit in a CPU-mesh subprocess: measured collective
    counts/bytes per train step at 1..8 shards + predicted ICI efficiency
    (tools/scaling_audit.py; SURVEY §7 item 6 — no reference counterpart)."""
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
    budget = min(_left() - 10, P["scaling_budget_s"])
    step_t = _RESULT.get("gat_pallas_step_time_s") or _RESULT.get("gat_xla_step_time_s") or 0.208
    proc = subprocess.run(
        # niced: the audit's full-scale layout builds + CPU-mesh lowering are
        # host-CPU-heavy and this thread runs concurrently with the main
        # sections' tracing (which is also host CPU)
        ["nice", "-n", "15", sys.executable, "-m",
         "plotpointe_tpu.tools.scaling_audit", "--json",
         "--edges", str(P["scaling_edges"]), "--step-time-s", str(step_t)],
        capture_output=True, text=True, timeout=max(30, budget), env=env,
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    parsed = json.loads(line)
    if proc.returncode != 0 and not parsed:
        raise RuntimeError(f"scaling_audit rc={proc.returncode}: {proc.stderr[-200:]}")
    return parsed


# ---------------------------------------------------------------------------
# Mode parameter sets + section registry
# ---------------------------------------------------------------------------

FULL_PARAMS = {
    "knn_n": 63_001, "knn_d": 384, "knn_k": 20, "knn_block_rows": 1024,
    "knn_impls": ("pallas", "pallas", "xla"),  # retry pallas once, then fall back
    "gat_users": 192_403, "gat_items": 63_001, "gat_edges": 1_689_116,
    "gat_hidden": 128, "gat_batch": 200_000, "gat_feat_dim": 384,
    "spmm_d": 64, "spmm_bwd_min_left_s": 150, "lgcn_bs": 8192,
    "serve_items": 498_196, "serve_d": 128, "serve_batch": 8, "serve_batch_big": 64,
    "serve_xla_min_left_s": 120,
    "enc_img_batch": 128, "enc_txt_batch": 256,
    "scaling_edges": 200_000, "scaling_budget_s": 240,
}

FAST_PARAMS = {
    "knn_n": 2048, "knn_d": 128, "knn_k": 10, "knn_block_rows": 256,
    "knn_impls": ("xla",),  # CPU tier: no Mosaic
    "gat_users": 3_000, "gat_items": 1_000, "gat_edges": 30_000,
    "gat_hidden": 32, "gat_batch": 4_096, "gat_feat_dim": 64,
    "spmm_d": 16, "spmm_bwd_min_left_s": 30, "lgcn_bs": 1024,
    "serve_items": 20_000, "serve_d": 64, "serve_batch": 4, "serve_batch_big": 8,
    "serve_xla_min_left_s": 30,
    "enc_img_batch": 2, "enc_txt_batch": 4,
    "scaling_edges": 20_000, "scaling_budget_s": 120,
}

# (name, est_seconds_full, fn, run_in_fast). Ordered headline-first: the
# watchdog cuts from the tail, never the head. HOST_PARALLEL sections touch
# no device and run in background threads overlapped with the serial device
# sections (scaling waits for gat_pallas, whose measured step time seeds its
# efficiency model) — that overlap is what fits all ten sections in the
# 900 s driver budget.
SECTIONS = [
    ("knn", 120, _sec_knn, True),
    ("serving", 95, _sec_serving, True),
    ("gat_pallas", 165, _sec_gat_pallas, False),  # fast tier: pallas needs TPU
    ("spmm", 140, _sec_spmm, True),
    ("peaks", 70, _sec_peaks, False),  # before gat_kernels: mfu_*_sol_dev needs it
    ("gat_kernels", 160, _sec_gat_kernels, False),
    ("encoders", 80, _sec_encoders, False),
    ("gat_xla", 85, _sec_gat_xla, True),  # tail: pure-XLA comparison line
    ("ui_build", 15, _sec_ui_build, True),
    ("scaling", 180, _sec_scaling, True),
]

HOST_PARALLEL = {"ui_build": None, "scaling": "gat_pallas"}  # name -> start-after


def main() -> None:
    fast = "--fast" in sys.argv
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]

    global _BUDGET_S
    if fast and "BENCH_BUDGET_S" not in os.environ:
        _BUDGET_S = 300.0

    threading.Thread(target=_watchdog, daemon=True).start()
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_signal)
        except Exception:  # noqa: BLE001
            pass

    import jax

    if fast:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # noqa: BLE001
            pass
    # the remote-TPU grant can refuse attachment transiently ("Unable to
    # initialize backend 'axon'"); retry with cooldowns, and if the device
    # never comes up still run the host-only + subprocess sections and emit
    # a populated line instead of crashing with nothing recorded
    device_ok = False
    for attempt in range(3):
        try:
            _merge({"device": str(jax.devices()[0]),
                    "bench_mode": "fast" if fast else "full"})
            device_ok = True
            break
        except Exception as e:  # noqa: BLE001
            _merge({"device_error": _err(e), "bench_mode": "fast" if fast else "full"})
            if _left() < 200:
                break
            time.sleep(60)

    HOST_ONLY = {"ui_build", "scaling"}  # no live device needed
    P = FAST_PARAMS if fast else FULL_PARAMS
    skipped = []

    def run_one(name, fn):
        t0 = time.perf_counter()
        _merge({f"sec_{name}_start_s": round(t0 - _T0, 1)})
        try:
            _merge(fn(P))
        except Exception as e:  # noqa: BLE001
            _merge({f"{name}_error": _err(e)})
        _merge({f"sec_{name}_s": round(time.perf_counter() - t0, 1)})

    threads: dict = {}

    def spawn(name, fn):
        t = threading.Thread(target=run_one, args=(name, fn), daemon=True)
        t.start()
        threads[name] = t

    by_name = {n: f for n, _, f, _ in SECTIONS}
    _INTENDED.extend(
        n for n, _, _, in_f in SECTIONS
        if (only is None or n == only) and (not fast or in_f or only is not None))
    if only is None and not fast:
        # pre-import everything the host-parallel sections touch: a thread
        # importing a module the main thread is mid-importing raises
        # _DeadlockError on the module lock
        import plotpointe_tpu.graphs.csr  # noqa: F401
        import plotpointe_tpu.graphs.knn  # noqa: F401

        for pname, after in HOST_PARALLEL.items():
            if after is None:
                spawn(pname, by_name[pname])

    for name, est_s, fn, in_fast in SECTIONS:
        if only is not None and name != only:
            continue
        if only is None and not fast and name in HOST_PARALLEL:
            continue  # runs (or ran) in its background thread
        if fast and not in_fast and only is None:
            continue
        if not device_ok and name not in HOST_ONLY:
            skipped.append(name)
            continue
        est = est_s if not fast else min(est_s, 45)
        if _left() < 0.5 * est:
            skipped.append(name)
            continue
        run_one(name, fn)
        if only is None and not fast:
            for pname, after in HOST_PARALLEL.items():
                if after == name and pname not in threads:
                    spawn(pname, by_name[pname])

    # dependency-gated parallel sections whose trigger never ran
    if only is None and not fast:
        for pname in HOST_PARALLEL:
            if pname not in threads and _left() > 30:
                spawn(pname, by_name[pname])
        for pname, t in threads.items():
            t.join(timeout=max(1.0, _left() - 10))
            if t.is_alive():
                skipped.append(pname)
    if skipped:
        _merge({"sections_skipped": skipped})

    _finalize_and_print()


if __name__ == "__main__":
    main()
