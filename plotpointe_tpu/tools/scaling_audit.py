"""Multi-device scaling audit: collective traffic + predicted ICI efficiency.

BASELINE.md targets ">=80% multi-host scaling efficiency" but no real multi-chip
hardware is reachable from this environment, so this tool does what CAN be done
honestly without a pod (SURVEY §7 item 6 — the reference has no analog, it has
no distributed training at all, SURVEY §2.3):

  1. **Collective audit** — lower the sharded GAT train step
     (parallel/spmd.py::make_sharded_gat_step) at 1/2/4/8 shards on the
     virtual CPU mesh and statically count every collective and its
     per-device payload bytes straight out of the StableHLO. This is exact:
     shard_map collectives are explicit in the lowered module, nothing is
     estimated. (The fused-Pallas step has the same collective structure —
     2 psums/layer + 1 user-table all_gather fwd / psum_scatter bwd + small
     replicated-grad psums — its differences vs the XLA step are all
     *within*-device, so the audit transfers.)
  2. **Measured CPU-mesh trend** — run the step for real at each shard count
     on a small graph and record edges/sec. On shared host cores this shows
     collective correctness + shard_map overhead, NOT speedup; labeled as such.
  3. **ICI roofline prediction** — per-step wire bytes (ring-algorithm cost
     per chip) / v5e ICI bandwidth vs measured single-chip step time gives a
     no-overlap lower bound on scaling efficiency at 8 chips:
         eff(n) = (T1/n) / (T1/n + wire_bytes(n)/BW_ici)
     reported as gat_scaling_pred_eff_8dev. With compute/comm overlap the
     real number is >= this bound.

Run standalone (`python -m plotpointe_tpu.tools.scaling_audit --json`) or via
bench.py's "scaling" section (CPU subprocess). Prints one JSON line with
--json, a human table otherwise.
"""
from __future__ import annotations

import argparse
import json
import re
import time
from typing import Dict, List

import numpy as np

# v5e per-chip ICI: 4 links x 400 Gbps bidirectional ~= 200 GB/s aggregate
# (public v5e spec; the scaling-book mental model). Conservative: assumes no
# compute/comm overlap and all collectives ride ICI (true within one slice).
ICI_GBPS = {"v5e": 200.0, "v5p": 600.0, "v4": 300.0}

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8, "i32": 4, "ui32": 4,
                "i64": 8, "i8": 1, "i1": 1, "i16": 2}

_COLL_OP_RE = re.compile(
    r'"stablehlo\.(all_reduce|all_gather|reduce_scatter|collective_permute|all_to_all)"'
)
# operand type in the op's trailing signature `: (tensor<31925x128xf32>, ...)`;
# region bodies and attribute tensors never contain the literal `(tensor<`
_OPERAND_RE = re.compile(
    r"\(tensor<(?:([0-9x]+)x)?(f32|bf16|f16|f64|i32|ui32|i64|i16|i8|i1)>"
)


def _tensor_bytes(dims: str, dtype: str) -> int:
    n = 1
    for d in dims.split("x"):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def parse_collectives(stablehlo_text: str) -> List[Dict]:
    """Every collective op in a lowered module with its operand payload bytes
    (per-device: shard_map bodies lower with shard-local shapes)."""
    out = []
    for m in _COLL_OP_RE.finditer(stablehlo_text):
        op = m.group(1)
        om = _OPERAND_RE.search(stablehlo_text, m.end(), m.end() + 4000)
        if om is None:
            continue
        dims, dtype = om.group(1) or "", om.group(2)
        out.append({"op": op, "shape": dims or "scalar", "dtype": dtype,
                    "bytes": _tensor_bytes(dims, dtype)})
    return out


def wire_bytes_per_chip(collectives: List[Dict], n: int) -> float:
    """Ring-algorithm wire traffic per chip per step.

    all_reduce of per-device payload S: 2*S*(n-1)/n on the wire;
    all_gather (operand = local shard S_l): S_l*(n-1) received;
    reduce_scatter (operand = full per-device S): S*(n-1)/n;
    collective_permute / all_to_all: payload S.
    """
    total = 0.0
    for c in collectives:
        s = float(c["bytes"])
        if c["op"] == "all_reduce":
            total += 2.0 * s * (n - 1) / n
        elif c["op"] == "all_gather":
            total += s * (n - 1)
        elif c["op"] == "reduce_scatter":
            total += s * (n - 1) / n
        else:
            total += s
    return total


_GRAPH_CACHE: Dict = {}


def _synthetic_graph(n_users: int, n_items: int, n_edges: int):
    """Full-scale synthetic bipartite graph, built once per process."""
    key = (n_users, n_items, n_edges)
    if key not in _GRAPH_CACHE:
        from plotpointe_tpu.graphs.csr import build_bipartite_graph

        rng = np.random.default_rng(0)
        tu = rng.integers(0, n_users, n_edges).astype(np.int32)
        ti = rng.integers(0, n_items, n_edges).astype(np.int32)
        _GRAPH_CACHE[key] = build_bipartite_graph(tu, ti, n_users, n_items)
    return _GRAPH_CACHE[key]


def _build_step_and_args(n_shards: int, n_users: int, n_items: int, n_edges: int,
                         hidden: int, layers: int, batch: int, feat_dim: int):
    """The FLAGSHIP sharded step (fused Pallas kernels, bf16 psum overlays —
    parallel/spmd.py::make_sharded_gat_step_fused defaults) + abstract arg
    shapes for lowering. Round 4 audited the XLA sharded step, which is the
    comparison line, not the config the efficiency target is set on."""
    import jax

    from plotpointe_tpu.models.gat import GATModel
    from plotpointe_tpu.parallel.mesh import make_mesh
    from plotpointe_tpu.parallel.spmd import (
        make_sharded_gat_step_fused,
        shard_layout_by_tiles,
    )

    mesh = make_mesh({"data": n_shards}, jax.devices()[:n_shards])
    model = GATModel(n_users=n_users, n_items=n_items, feat_dim=feat_dim,
                     hidden_dim=hidden, n_layers=layers, attn_impl="pallas")
    graph = _synthetic_graph(n_users, n_items, n_edges)
    lkey = (n_users, n_items, n_edges, n_shards)
    stacked = _GRAPH_CACHE.get(lkey)
    if stacked is None:
        # the host-side layout build at full scale costs seconds per shard
        # count; deterministic per (graph, n_shards), so cache alongside
        stacked = shard_layout_by_tiles(graph, n_shards)
        _GRAPH_CACHE[lkey] = stacked
    step = make_sharded_gat_step_fused(model, "bpr", mesh, n_users, n_items, stacked)

    params_s = dict(jax.eval_shape(model.init, jax.random.key(0)))
    # user table rows padded to divide the mesh (parallel/sharded_table.py)
    u_pad = ((n_users + n_shards - 1) // n_shards) * n_shards
    ue = params_s["user_emb"]
    params_s["user_emb"] = jax.ShapeDtypeStruct((u_pad,) + ue.shape[1:], ue.dtype)
    b = ((batch + n_shards - 1) // n_shards) * n_shards
    f32, i32 = np.float32, np.int32
    sds = jax.ShapeDtypeStruct
    args_s = (
        params_s,
        sds((n_items, feat_dim), f32),
        jax.random.key(0),
        sds((b,), i32), sds((b,), i32), sds((b,), i32),
    )
    return step, args_s, mesh, model, int(stacked.src.shape[1])


def audit_collectives(n_shards: int, n_users: int, n_items: int, n_edges: int,
                      hidden: int = 128, layers: int = 2, batch: int = 200_000,
                      feat_dim: int = 384) -> Dict:
    """Static per-step collective inventory at full Amazon scale (no execution
    — abstract lowering only, plus a one-time host-side layout build)."""
    import jax

    step, args_s, _, _, e_pad = _build_step_and_args(
        n_shards, n_users, n_items, n_edges, hidden, layers, batch, feat_dim)
    text = jax.jit(step).lower(*args_s).as_text()
    colls = parse_collectives(text)
    by_op: Dict[str, int] = {}
    for c in colls:
        by_op[c["op"]] = by_op.get(c["op"], 0) + 1
    return {
        "n_shards": n_shards,
        "collective_count": len(colls),
        "collective_ops": by_op,
        "payload_bytes_per_device": int(sum(c["bytes"] for c in colls)),
        "wire_bytes_per_chip": int(wire_bytes_per_chip(colls, n_shards)),
        "e_pad": e_pad,
    }


def measured_cpu_trend(shard_counts, n_users=6_000, n_items=2_000, n_edges=60_000,
                       hidden: int = 64, layers: int = 2, batch: int = 8_192) -> Dict:
    """Execute the sharded step at each shard count on the virtual CPU mesh.
    Shared host cores => this validates collectives + measures shard_map
    overhead, not speedup."""
    import jax
    import jax.numpy as jnp

    from plotpointe_tpu.graphs.csr import build_bipartite_graph
    from plotpointe_tpu.models.gat import GATModel
    from plotpointe_tpu.parallel.mesh import make_mesh
    from plotpointe_tpu.parallel.spmd import make_sharded_gat_step, shard_graph_by_edges

    rng = np.random.default_rng(0)
    tu = rng.integers(0, n_users, n_edges).astype(np.int32)
    ti = rng.integers(0, n_items, n_edges).astype(np.int32)
    base = build_bipartite_graph(tu, ti, n_users, n_items)
    feats = jnp.asarray(rng.normal(size=(n_items, 64)).astype(np.float32))
    u = jnp.asarray(rng.integers(0, n_users, batch).astype(np.int32))
    i = jnp.asarray(rng.integers(0, n_items, batch).astype(np.int32))
    j = jnp.asarray(rng.integers(0, n_items, batch).astype(np.int32))

    out = {}
    for n_sh in shard_counts:
        mesh = make_mesh({"data": n_sh}, jax.devices()[:n_sh])
        model = GATModel(n_users=n_users, n_items=n_items, feat_dim=64,
                         hidden_dim=hidden, n_layers=layers, attn_impl="xla")
        step = make_sharded_gat_step(model, "bpr", mesh, n_users, n_items)
        g = shard_graph_by_edges(base, n_sh)
        src, dst = jnp.asarray(g.src), jnp.asarray(g.dst)
        masks = jnp.ones((layers, g.n_padded, 1), jnp.float32)
        params = model.init(jax.random.key(0))
        grads, loss = step(params, feats, src, dst, masks, u, i, j)  # compile
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(3):
            grads, loss = step(params, feats, src, dst, masks, u, i, j)
        jax.block_until_ready((grads, loss))
        dt = (time.perf_counter() - t0) / 3
        out[f"cpu_mesh_edges_per_sec_{n_sh}dev"] = round(2 * n_edges * layers / dt)
    return out


def predict_efficiency(audits: List[Dict], step_time_1chip_s: float,
                       gen: str = "v5e") -> Dict:
    """No-overlap lower bound on scaling efficiency from the audited wire
    traffic: eff(n) = (T1/n) / (T1/n + wire_bytes(n)/BW)."""
    bw = ICI_GBPS[gen] * 1e9
    out = {}
    for a in audits:
        n = a["n_shards"]
        if n == 1:
            out["gat_scaling_pred_eff_1dev"] = 1.0
            continue
        t_comp = step_time_1chip_s / n
        t_comm = a["wire_bytes_per_chip"] / bw
        out[f"gat_scaling_pred_eff_{n}dev"] = round(t_comp / (t_comp + t_comm), 3)
        out[f"gat_scaling_wire_mb_{n}dev"] = round(a["wire_bytes_per_chip"] / 1e6, 1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--json", action="store_true", help="print one JSON line")
    ap.add_argument("--edges", type=int, default=200_000,
                    help="edge count for the measured CPU trend (small; the "
                         "static audit always runs at full Amazon scale)")
    ap.add_argument("--step-time-s", type=float, default=0.208,
                    help="measured single-chip fused step time at Amazon scale "
                         "(default: BENCH_r02 gat_pallas_step_time_s)")
    ap.add_argument("--gen", default="v5e", choices=sorted(ICI_GBPS))
    ap.add_argument("--skip-measured", action="store_true")
    args = ap.parse_args()

    import jax

    n_dev = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8) if c <= n_dev]

    result: Dict = {"gat_scaling_shards": counts}
    audits = []
    for c in counts:
        a = audit_collectives(c, 192_403, 63_001, 1_689_116)
        audits.append(a)
        result[f"gat_scaling_collectives_{c}dev"] = a["collective_count"]
    result.update(predict_efficiency(audits, args.step_time_s, gen=args.gen))

    if not args.skip_measured:
        n_e = args.edges
        result.update(measured_cpu_trend(counts, n_users=max(100, n_e // 10),
                                         n_items=max(50, n_e // 30), n_edges=n_e))

    if args.json:
        print(json.dumps(result))
    else:
        print(f"Sharded GAT step collective audit (full Amazon scale, {args.gen} ICI "
              f"{ICI_GBPS[args.gen]:.0f} GB/s, T1={args.step_time_s*1e3:.0f} ms):")
        for a in audits:
            n = a["n_shards"]
            eff = result.get(f"gat_scaling_pred_eff_{n}dev", 1.0)
            print(f"  {n} shard(s): {a['collective_count']:3d} collectives "
                  f"{a['collective_ops']}, wire {a['wire_bytes_per_chip']/1e6:8.1f} MB/chip, "
                  f"predicted eff >= {eff:.1%}")
        for k, v in result.items():
            if k.startswith("cpu_mesh"):
                print(f"  {k}: {v:,}")


if __name__ == "__main__":
    main()
