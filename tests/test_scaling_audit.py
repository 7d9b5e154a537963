"""Scaling audit (tools/scaling_audit.py): StableHLO collective parsing, ring
wire-cost model, and the end-to-end static audit on the virtual CPU mesh."""
import numpy as np
import pytest

from plotpointe_tpu.tools.scaling_audit import (
    audit_collectives, parse_collectives, predict_efficiency, wire_bytes_per_chip,
)

SNIPPET = '''
%41 = "stablehlo.all_reduce"(%40) <{channel_handle = #stablehlo.channel_handle<handle = 1, type = 1>, replica_groups = dense<[[0, 1, 2, 3]]> : tensor<1x4xi64>, use_global_device_ids}> ({
^bb0(%arg35: tensor<f32>, %arg36: tensor<f32>):
  %r = stablehlo.add %arg35, %arg36 : tensor<f32>
  stablehlo.return %r : tensor<f32>
}) : (tensor<255405x128xf32>) -> tensor<255405x128xf32>
%1 = "stablehlo.all_gather"(%arg24) <{all_gather_dim = 0 : i64, replica_groups = dense<[[0, 1, 2, 3]]> : tensor<1x4xi64>}> : (tensor<48101x128xf32>) -> tensor<192404x128xf32>
%374 = "stablehlo.reduce_scatter"(%366) <{scatter_dimension = 0 : i64}> : (tensor<192404x128xbf16>) -> tensor<48101x128xbf16>
'''


def test_parse_collectives_shapes_and_dtypes():
    colls = parse_collectives(SNIPPET)
    assert [c["op"] for c in colls] == ["all_reduce", "all_gather", "reduce_scatter"]
    assert colls[0]["bytes"] == 255405 * 128 * 4
    assert colls[1]["bytes"] == 48101 * 128 * 4  # operand (local shard), not result
    assert colls[2]["bytes"] == 192404 * 128 * 2  # bf16


def test_wire_model_ring_formulas():
    n = 4
    ar = [{"op": "all_reduce", "bytes": 100}]
    ag = [{"op": "all_gather", "bytes": 100}]
    rs = [{"op": "reduce_scatter", "bytes": 100}]
    assert wire_bytes_per_chip(ar, n) == pytest.approx(2 * 100 * 3 / 4)
    assert wire_bytes_per_chip(ag, n) == pytest.approx(100 * 3)
    assert wire_bytes_per_chip(rs, n) == pytest.approx(100 * 3 / 4)
    # single shard: all_reduce/reduce_scatter cost nothing on the wire
    assert wire_bytes_per_chip(ar, 1) == 0.0


def test_predict_efficiency_monotone_in_bandwidth_use():
    audits = [{"n_shards": 1, "wire_bytes_per_chip": 0},
              {"n_shards": 2, "wire_bytes_per_chip": int(1e9)},
              {"n_shards": 8, "wire_bytes_per_chip": int(2e9)}]
    eff = predict_efficiency(audits, step_time_1chip_s=0.2, gen="v5e")
    assert eff["gat_scaling_pred_eff_1dev"] == 1.0
    assert 0 < eff["gat_scaling_pred_eff_8dev"] < eff["gat_scaling_pred_eff_2dev"] < 1


@pytest.mark.multidevice
def test_static_audit_small_shape(devices8):
    """Abstract lowering at a small shape: >= the structural minimum of
    collectives (2 psums/layer fwd + transposes + grad reductions) and wire
    bytes that grow with shard count."""
    a2 = audit_collectives(2, n_users=2_000, n_items=600, n_edges=20_000,
                           hidden=32, layers=2, batch=4_096, feat_dim=64)
    a8 = audit_collectives(8, n_users=2_000, n_items=600, n_edges=20_000,
                           hidden=32, layers=2, batch=4_096, feat_dim=64)
    assert a2["collective_count"] == a8["collective_count"] >= 10
    assert a8["wire_bytes_per_chip"] > a2["wire_bytes_per_chip"] > 0
    assert set(a2["collective_ops"]) >= {"all_reduce", "all_gather"}
