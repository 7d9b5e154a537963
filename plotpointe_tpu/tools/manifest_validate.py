"""Manifest validator: check that every manifest's artifact prefixes exist.

Parity with `tools/manifest_validate.py:26-59` of the reference (list one
object per GCS prefix, exit 2 on missing, for CI wiring) — generalized to the
ArtifactStore so local prefixes validate the same way.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

from plotpointe_tpu.config import FeatureManifest, load_manifest, load_registry
from plotpointe_tpu.utils.artifacts import ArtifactStore


def prefix_exists(store: ArtifactStore, prefix: str) -> bool:
    if str(prefix).startswith("gs://"):  # pragma: no cover - needs GCS
        client = store._client()
        bucket, blob = store._split(prefix)
        return any(True for _ in client.list_blobs(bucket, prefix=blob, max_results=1))
    return Path(str(prefix).removeprefix("file://")).exists()


def validate_manifest(manifest: FeatureManifest, store: ArtifactStore | None = None) -> dict:
    store = store or ArtifactStore()
    results = {}
    for key in FeatureManifest.REQUIRED_PATHS:
        prefix = manifest.paths[key]
        results[key] = {"prefix": prefix, "exists": prefix_exists(store, prefix)}
    return {"id": manifest.id, "paths": results, "ok": all(r["exists"] for r in results.values())}


def main(argv=None):
    ap = argparse.ArgumentParser(description="Validate feature-manifest artifact prefixes")
    ap.add_argument("--registry", default="manifests/registry.json")
    ap.add_argument("--manifest-id", default=None, help="validate one manifest; default: all")
    args = ap.parse_args(argv)

    store = ArtifactStore()
    ids = [args.manifest_id] if args.manifest_id else list(load_registry(args.registry))
    reports = [validate_manifest(load_manifest(i, args.registry), store) for i in ids]
    print(json.dumps(reports, indent=2))
    raise SystemExit(0 if all(r["ok"] for r in reports) else 2)


if __name__ == "__main__":
    main()
