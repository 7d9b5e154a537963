"""Per-stage job specs + runner — the Vertex custom-job config analog.

The reference launches every pipeline stage as a Vertex AI custom job from
one of 43 YAMLs (`vertex/configs/*.yaml`: pinned image, machine/accelerator
spec, CLI args with `${VAR:-default}` env overrides,
`gcloud ai custom-jobs create --config=...`). The TPU-native analog is
`deploy/jobs/*.yaml`: each spec names a stage, its accelerator request, its
container image, and the CLI command with the SAME `${VAR:-default}`
substitution pattern — executed by this runner either locally on the current
VM (the single-TPU-VM deployment) or rendered as the `gcloud compute tpus
tpu-vm ssh` command for a remote worker.

    python -m plotpointe_tpu.tools.jobs list
    python -m plotpointe_tpu.tools.jobs run deploy/jobs/train_gat_v5e.yaml \
        --set EPOCHS=5 --set ARTIFACTS=/tmp/artifacts
    python -m plotpointe_tpu.tools.jobs run ... --remote plotpointe-v5e --dry-run
"""
from __future__ import annotations

import argparse
import json
import os
import re
import shlex
import subprocess
import sys
import time
from pathlib import Path
from typing import Dict, List

_SUB_RE = re.compile(r"\$\{(\w+)(?::-([^}]*))?\}")


def substitute(text: str, env: Dict[str, str]) -> str:
    """`${VAR}` / `${VAR:-default}` substitution (the reference's Vertex YAML
    arg pattern, e.g. vertex/configs/train_gat_pyg_l4.yaml)."""

    def repl(m):
        var, default = m.group(1), m.group(2)
        val = env.get(var, default)
        if val is None:
            raise KeyError(f"undefined variable ${{{var}}} with no default")
        return val

    return _SUB_RE.sub(repl, text)


def load_job(path: str | Path) -> Dict:
    import yaml

    spec = yaml.safe_load(Path(path).read_text())
    for field in ("name", "command"):
        if field not in spec:
            raise ValueError(f"{path}: job spec missing '{field}'")
    return spec


def render_command(spec: Dict, overrides: Dict[str, str]) -> str:
    env = dict(spec.get("env", {}))
    env.update({k: v for k, v in os.environ.items() if k in env or _SUB_RE.search(spec["command"] or "")})
    env.update(overrides)
    return substitute(" ".join(spec["command"].split()), env)


def run_job(spec: Dict, overrides: Dict[str, str], remote: str | None = None,
            dry_run: bool = False, zone: str = "us-west4-a") -> int:
    cmd = render_command(spec, overrides)
    if remote:
        cmd = (f"gcloud compute tpus tpu-vm ssh {remote} --zone={zone} "
               f"--command={shlex.quote(cmd)}")
    meta = {"job": spec["name"], "accelerator": spec.get("accelerator", "none"),
            "restart_on_preemption": spec.get("restart_on_preemption", False),
            "command": cmd}
    print(json.dumps(meta))
    if dry_run:
        return 0
    t0 = time.time()
    attempts = 1 + (2 if spec.get("restart_on_preemption") else 0)
    rc = 1
    for i in range(attempts):
        rc = subprocess.call(cmd, shell=True)
        if rc == 0:
            break
        if i + 1 < attempts:
            print(json.dumps({"job": spec["name"], "attempt": i + 1, "rc": rc,
                              "action": "restart (restartJobOnWorkerRestart analog)"}),
                  file=sys.stderr)
    print(json.dumps({"job": spec["name"], "rc": rc, "wall_s": round(time.time() - t0, 1)}))
    return rc


def race_job(spec: Dict, overrides: Dict[str, str], workers: List[str],
             grace_s: float = 3.0, timeout_s: float = 3600.0,
             dry_run: bool = False) -> int:
    """First-capacity-wins job racing across zones/workers.

    The reference submits the SAME Vertex job to three regions, polls until
    one reaches RUNNING, keeps it and cancels the rest
    (`scripts/launch_lightgcn_race.sh:9-60` — a capacity-hunting pattern for
    scarce accelerators). TPU-native analog: launch the rendered command on
    every worker ("name:zone" TPU VMs via gcloud ssh, or "local" for
    tests/single-VM); a capacity-denied submission exits immediately
    non-zero and drops out; the FIRST submission still alive after
    `grace_s` (or already completed cleanly) wins and the others are
    terminated. Exit code = the winner's."""
    cmds = []
    for w in workers:
        if w == "local":
            cmd = render_command(spec, dict(overrides, WORKER="local"))
        else:
            name, _, zone = w.partition(":")
            base = render_command(spec, dict(overrides, WORKER=name))
            cmd = (f"gcloud compute tpus tpu-vm ssh {name} --zone={zone or 'us-west4-a'} "
                   f"--command={shlex.quote(base)}")
        cmds.append((w, cmd))
        print(json.dumps({"race": spec["name"], "worker": w, "command": cmd}))
    if dry_run:
        return 0

    # each submission gets its own process GROUP so cancellation reaches the
    # whole shell pipeline (a bare terminate() on shell=True hits only the
    # outer sh, leaving nested commands running)
    procs = [(w, subprocess.Popen(cmd, shell=True, start_new_session=True), time.time())
             for w, cmd in cmds]
    winner = None
    t0 = time.time()
    try:
        while winner is None and time.time() - t0 < timeout_s:
            alive = []
            for w, pr, ts in procs:
                rc = pr.poll()
                if rc == 0:  # finished cleanly before the grace window: winner
                    winner = (w, pr, ts)
                    break
                if rc is not None:  # capacity denied / failed: drops out
                    print(json.dumps({"race": spec["name"], "worker": w,
                                      "rc": rc, "action": "dropped"}), file=sys.stderr)
                    continue
                if time.time() - ts >= grace_s:  # running past grace: winner
                    winner = (w, pr, ts)
                    break
                alive.append((w, pr, ts))
            else:
                procs = alive
                if not procs:
                    print(json.dumps({"race": spec["name"],
                                      "error": "no worker accepted the job"}))
                    return 1
                time.sleep(0.1)
                continue
            break
    finally:
        import signal as _signal

        for w, pr, _ in procs:
            if winner is not None and pr is winner[1]:
                continue
            if pr.poll() is None:
                try:
                    os.killpg(os.getpgid(pr.pid), _signal.SIGTERM)
                except (ProcessLookupError, PermissionError):
                    pr.terminate()
                print(json.dumps({"race": spec["name"], "worker": w,
                                  "action": "cancelled (lost the race)"}), file=sys.stderr)
            try:
                pr.wait(timeout=10)  # reap; no zombies in a long-lived runner
            except subprocess.TimeoutExpired:
                try:
                    os.killpg(os.getpgid(pr.pid), _signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    pr.kill()
                pr.wait(timeout=5)
    if winner is None:
        return 1
    w, pr, _ = winner
    print(json.dumps({"race": spec["name"], "winner": w}))
    rc = pr.wait()
    print(json.dumps({"job": spec["name"], "worker": w, "rc": rc,
                      "wall_s": round(time.time() - t0, 1)}))
    return rc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("list", help="list job specs")
    p.add_argument("--dir", default="deploy/jobs")
    p = sub.add_parser("run", help="run one job spec")
    p.add_argument("spec")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL")
    p.add_argument("--remote", default=None, help="TPU VM name (render gcloud ssh)")
    p.add_argument("--zone", default="us-west4-a")
    p.add_argument("--dry-run", action="store_true")
    p = sub.add_parser("race", help="submit one job to several workers; first "
                                    "with capacity wins, the rest are cancelled")
    p.add_argument("spec")
    p.add_argument("--worker", action="append", required=True, metavar="NAME:ZONE",
                   help="repeatable; 'local' runs the command locally (tests)")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VAL")
    p.add_argument("--grace", type=float, default=3.0)
    p.add_argument("--timeout", type=float, default=3600.0)
    p.add_argument("--dry-run", action="store_true")
    args = ap.parse_args(argv)

    if args.cmd == "list":
        rows: List[Dict] = []
        for f in sorted(Path(args.dir).glob("*.yaml")):
            s = load_job(f)
            rows.append({"file": str(f), "name": s["name"],
                         "accelerator": s.get("accelerator", "none")})
        print(json.dumps(rows, indent=2))
        return 0

    overrides = {}
    for kv in args.set:
        k, _, v = kv.partition("=")
        overrides[k] = v
    if args.cmd == "race":
        return race_job(load_job(args.spec), overrides, args.worker,
                        grace_s=args.grace, timeout_s=args.timeout,
                        dry_run=args.dry_run)
    return run_job(load_job(args.spec), overrides, remote=args.remote,
                   dry_run=args.dry_run, zone=args.zone)


if __name__ == "__main__":
    raise SystemExit(main())
