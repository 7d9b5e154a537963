"""Artifact store: the file contracts between pipeline stages.

The reference's stages communicate only through files on GCS
(`SYSTEM_OVERVIEW.md:106-117`): items.parquet / interactions.parquet,
txt.npy / img.npy + img_items.parquet, fused.npy, ui_edges.npz +
node_maps.json + ui_stats.json, ii_edges_*.npz, checkpoints, metrics_*.json,
exports/item_embeddings.npy. We keep the same contract names so reference
artifacts are drop-in inputs, but back them with a URI-addressed store that is
local-filesystem first (gs:// gated behind optional google-cloud-storage).
"""
from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


def _is_gcs(uri: str) -> bool:
    return str(uri).startswith("gs://")


class ArtifactStore:
    """Resolve artifact URIs to local paths, downloading/uploading as needed.

    Local URIs (plain paths or file://) are used directly. gs:// URIs are
    staged through `cache_dir` using google-cloud-storage when available.
    """

    def __init__(self, cache_dir: str = "tmp/artifacts", project_id: Optional[str] = None):
        self.cache_dir = Path(cache_dir)
        self.project_id = project_id
        self._gcs_client = None

    # -- URI resolution ------------------------------------------------------

    def fetch(self, uri: str) -> Path:
        """Return a local path with the artifact's bytes, downloading if remote."""
        if not _is_gcs(uri):
            p = Path(str(uri).removeprefix("file://"))
            if not p.exists():
                raise FileNotFoundError(f"artifact not found: {uri}")
            return p
        local = self.cache_dir / str(uri).removeprefix("gs://")
        local.parent.mkdir(parents=True, exist_ok=True)
        self._gcs_download(uri, local)
        return local

    def publish(self, local_path: str | Path, uri: str) -> str:
        """Copy/upload `local_path` to `uri`; returns the uri."""
        local_path = Path(local_path)
        if not _is_gcs(uri):
            dst = Path(str(uri).removeprefix("file://"))
            dst.parent.mkdir(parents=True, exist_ok=True)
            if local_path.resolve() != dst.resolve():
                shutil.copy2(local_path, dst)
            return uri
        self._gcs_upload(local_path, uri)
        return uri

    def exists(self, uri: str) -> bool:
        if not _is_gcs(uri):
            return Path(str(uri).removeprefix("file://")).exists()
        client = self._client()
        bucket, blob = self._split(uri)
        return client.bucket(bucket).blob(blob).exists()

    # -- typed helpers (the contract formats) --------------------------------

    def load_npy(self, uri: str, mmap: bool = False) -> np.ndarray:
        p = self.fetch(uri)
        return np.load(p, mmap_mode="r" if mmap else None)

    def save_npy(self, arr: np.ndarray, uri: str) -> str:
        tmp = self._tmp_for(uri, ".npy")
        np.save(tmp, arr)
        return self.publish(tmp, uri)

    def load_json(self, uri: str) -> Any:
        with open(self.fetch(uri)) as f:
            return json.load(f)

    def save_json(self, obj: Any, uri: str) -> str:
        tmp = self._tmp_for(uri, ".json")
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=2, sort_keys=False)
        return self.publish(tmp, uri)

    def load_npz(self, uri: str) -> Dict[str, np.ndarray]:
        with np.load(self.fetch(uri), allow_pickle=False) as z:
            return {k: z[k] for k in z.files}

    def save_npz(self, arrays: Dict[str, np.ndarray], uri: str) -> str:
        tmp = self._tmp_for(uri, ".npz")
        np.savez_compressed(tmp, **arrays)
        return self.publish(tmp, uri)

    def load_parquet(self, uri: str):
        import pandas as pd

        return pd.read_parquet(self.fetch(uri))

    def save_parquet(self, df, uri: str) -> str:
        tmp = self._tmp_for(uri, ".parquet")
        df.to_parquet(tmp, index=False)
        return self.publish(tmp, uri)

    # -- internals -----------------------------------------------------------

    def _tmp_for(self, uri: str, suffix: str) -> Path:
        if not _is_gcs(uri):
            p = Path(str(uri).removeprefix("file://"))
            p.parent.mkdir(parents=True, exist_ok=True)
            return p
        local = self.cache_dir / str(uri).removeprefix("gs://")
        local.parent.mkdir(parents=True, exist_ok=True)
        return local

    @staticmethod
    def _split(uri: str):
        parts = str(uri).removeprefix("gs://").split("/", 1)
        return parts[0], parts[1] if len(parts) > 1 else ""

    def _client(self):
        if self._gcs_client is None:
            try:
                from google.cloud import storage  # type: ignore
            except ImportError as e:  # pragma: no cover - gated dependency
                raise ImportError(
                    "gs:// URIs require google-cloud-storage; use local paths instead"
                ) from e
            self._gcs_client = storage.Client(project=self.project_id)
        return self._gcs_client

    def _gcs_download(self, uri: str, local: Path) -> None:  # pragma: no cover
        bucket, blob = self._split(uri)
        self._client().bucket(bucket).blob(blob).download_to_filename(str(local))

    def _gcs_upload(self, local: Path, uri: str) -> None:  # pragma: no cover
        bucket, blob = self._split(uri)
        self._client().bucket(bucket).blob(blob).upload_from_filename(str(local))


# Canonical artifact names (contract parity with SYSTEM_OVERVIEW.md:106-117).
CONTRACTS = {
    "interactions": "interactions.parquet",
    "items": "items.parquet",
    "txt": "txt.npy",
    "txt_meta": "txt_meta.json",
    "img": "img.npy",
    "img_items": "img_items.parquet",
    "fused": "fused.npy",
    "fusion_config": "fusion_config.json",
    "txt_interacted": "txt_interacted.npy",
    "fused_interacted": "fused_interacted.npy",
    "interacted_items": "interacted_items.json",
    "ui_edges": "ui_edges.npz",
    "node_maps": "node_maps.json",
    "ui_stats": "ui_stats.json",
    "item_embeddings": "exports/item_embeddings.npy",
}
