"""CLI wiring tests (in-process, CPU): every subcommand parses and the fast
ones run end-to-end against tmp artifacts."""
import json

import numpy as np
import pytest

from plotpointe_tpu import cli


def _run(argv, capsys):
    cli.main(argv)
    return capsys.readouterr().out


def test_synth_validate_buildui(tmp_path, capsys):
    out = _run(["synth", "--out", f"{tmp_path}/s", "--users", "50", "--items", "40",
                "--interactions", "600", "--extra-items", "5"], capsys)
    assert json.loads(out.strip().splitlines()[-1])["n_interactions"] == 600

    with pytest.raises(SystemExit) as e:
        _run(["validate", "--prefix", f"{tmp_path}/s"], capsys)
    assert e.value.code == 0
    capsys.readouterr()  # drain the validate report left by the SystemExit

    out = _run(["build-ui", "--staging-prefix", f"{tmp_path}/s", "--output-prefix", f"{tmp_path}/g"], capsys)
    stats = json.loads(out[out.index("{"):])
    assert stats["n_edges"] == 600


def test_embed_and_subset(tmp_path, capsys):
    _run(["synth", "--out", f"{tmp_path}/s", "--users", "40", "--items", "30", "--interactions", "400"], capsys)
    out = _run(["embed-text", "--staging-prefix", f"{tmp_path}/s", "--output-prefix", f"{tmp_path}/e"], capsys)
    meta = json.loads(out[out.index("{"):])
    assert meta["dims"] == 384
    out = _run(["build-subset", "--staging-prefix", f"{tmp_path}/s", "--features", f"{tmp_path}/e/txt.npy",
                "--output-prefix", f"{tmp_path}/e", "--feature-name", "txt"], capsys)
    assert "n_interacted" in out


def test_gate_exit_codes(tmp_path, capsys):
    cur = tmp_path / "cur.json"
    base = tmp_path / "base.json"
    cur.write_text(json.dumps({"test": {"ndcg@20": 0.02}}))
    base.write_text(json.dumps({"test": {"ndcg@20": 0.01}}))
    with pytest.raises(SystemExit) as e:
        _run(["gate", "--current", str(cur), "--baseline", str(base)], capsys)
    assert e.value.code == 0
    base.write_text(json.dumps({"test": {"ndcg@20": 0.9}}))
    with pytest.raises(SystemExit) as e:
        _run(["gate", "--current", str(cur), "--baseline", str(base)], capsys)
    assert e.value.code == 3


def test_validate_manifests_cli(capsys, monkeypatch, tmp_path):
    reg = tmp_path / "registry.json"
    man = tmp_path / "m.json"
    good = tmp_path / "exists"
    good.mkdir()
    man.write_text(json.dumps({
        "id": "t", "dataset": "d",
        "paths": {"staging_prefix": str(good), "embeddings_prefix": str(good), "graphs_prefix": str(good)},
        "defaults": {},
    }))
    reg.write_text(json.dumps({"manifests": {"t": str(man)}}))
    with pytest.raises(SystemExit) as e:
        _run(["validate-manifests", "--registry", str(reg)], capsys)
    assert e.value.code == 0


def test_unknown_command_errors(capsys):
    with pytest.raises(SystemExit) as e:
        cli.main(["frobnicate"])
    assert e.value.code == 2


def test_train_mesh_flag(tmp_path, capsys):
    """`train --mesh data:8` routes through ShardedTrainer (pipeline wiring)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    _run(["synth", "--out", f"{tmp_path}/s", "--users", "40", "--items", "30",
          "--interactions", "500"], capsys)
    _run(["embed-text", "--staging-prefix", f"{tmp_path}/s",
          "--output-prefix", f"{tmp_path}/e"], capsys)
    _run(["build-subset", "--staging-prefix", f"{tmp_path}/s",
          "--features", f"{tmp_path}/e/txt.npy",
          "--output-prefix", f"{tmp_path}/e", "--feature-name", "txt"], capsys)
    out = _run(["train", "--staging-prefix", f"{tmp_path}/s",
                "--embeddings-prefix", f"{tmp_path}/e", "--models-prefix", f"{tmp_path}/m",
                "--item-features", "txt", "--hidden-dim", "16", "--epochs", "2",
                "--samples-per-epoch", "64", "--eval-neg-k", "16",
                "--mesh", "data:8"], capsys)
    res = json.loads(out[out.index("{"):])
    assert np.isfinite(res["best_val_ndcg@20"]) and "ndcg@20" in res["test"]


def test_pipeline_continue_skips_stages(tmp_path, capsys):
    """--continue skips stages whose artifacts exist (auto_continue parity).
    In-process serial driver at tiny scale; the subprocess/parallel driver
    shares the same _stage_done logic."""
    args = ["pipeline", "--workdir", str(tmp_path), "--users", "40", "--items", "30",
            "--interactions", "400", "--extra-items", "5", "--epochs", "1",
            "--samples-per-epoch", "500", "--eval-neg-k", "10", "--hidden-dim", "8",
            "--in-process"]
    out = _run(args, capsys)
    done = json.loads(out.strip().splitlines()[-1])
    assert done["pipeline"] == "complete" and done["skipped"] == []

    out = _run(args + ["--continue"], capsys)
    done = json.loads(out.strip().splitlines()[-1])
    assert "synth" in done["skipped"] and "build_knn" in done["skipped"]
    assert "fuse" in done["skipped"]


def test_anchor_mini_smoke(tmp_path, capsys):
    """cli anchor at micro scale: baselines + exact-protocol GAT + gate file."""
    import json as _json

    gate = tmp_path / "gate.json"
    gate.write_text(_json.dumps({"min": {"popularity.ndcg@20": 0.001}}))
    out = _run(["anchor", "--scale", "micro", "--epochs", "1", "--skip-beyond",
                "--out", str(tmp_path / "a"), "--gate-baseline", str(gate)], capsys)
    res = _json.loads((tmp_path / "a" / "anchor.json").read_text())
    for k in ("chance", "popularity", "inverse_popularity", "factor_oracle",
              "gat_init", "gat_reference_protocol", "dataset"):
        assert k in res, k
    assert '"anchor_gate": "PASS"' in out
