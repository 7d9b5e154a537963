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
    return run_job(load_job(args.spec), overrides, remote=args.remote,
                   dry_run=args.dry_run, zone=args.zone)


if __name__ == "__main__":
    raise SystemExit(main())
