"""Multi-host (multi-process) execution: 2 processes x 4 virtual CPU devices,
collectives crossing the process boundary over the distributed runtime — the
DCN-style split of the BASELINE.json north star, tested without a pod.

Each subprocess runs tools/multihost_smoke.py (the same per-host entry a TPU
pod launcher would run). Assertions: both processes see the 8-device global
mesh, produce IDENTICAL losses (the cross-host psums agree), and the full
ShardedTrainer.fit() protocol (epochs + sampled eval + best-checkpoint
host-gather) completes cleanly. The reference has no counterpart — it has no
distributed training at all (SURVEY §2.3)."""
import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(extra, timeout=420):
    port = _free_port()
    procs = []
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "plotpointe_tpu.tools.multihost_smoke",
             "--coordinator", f"127.0.0.1:{port}", "--num-processes", "2",
             "--process-id", str(pid), "--devices-per-process", "4", *extra],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        ))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


@pytest.mark.multihost
def test_two_process_sharded_step():
    r0, r1 = _launch([])
    assert r0["n_processes"] == r1["n_processes"] == 2
    assert r0["n_devices"] == r1["n_devices"] == 8
    # cross-host collectives agreed: replicated loss identical on both hosts
    assert r0["loss"] == r1["loss"]
    # each host holds a different user-table shard -> different local grads
    assert r0["grad_user_norm"] != r1["grad_user_norm"]


@pytest.mark.multihost
def test_two_process_full_fit():
    r0, r1 = _launch(["--fit"])
    assert r0["loss"] == r1["loss"]
    assert r0["best_val_ndcg20"] == r1["best_val_ndcg20"] > 0.0
    assert r0["test_ndcg20"] == r1["test_ndcg20"] > 0.0


@pytest.mark.multihost
def test_two_process_lightgcn_fit():
    """Second model family over DCN: row-sharded user+item tables, edge-
    sharded propagation, per-process placement of norm weights/batches."""
    r0, r1 = _launch(["--fit", "--family", "lightgcn"])
    assert r0["loss"] == r1["loss"]
    assert r0["test_ndcg20"] == r1["test_ndcg20"] > 0.0
