"""Config system: dataclass configs + env-var overrides + manifest registry.

Mirrors the reference's three config layers (SURVEY.md section 5):
  - per-trainer Config dataclass stored in checkpoints
    (`scripts/train_gat_custom.py:40-59`),
  - `${VAR:-default}` env overrides in the Vertex YAMLs,
  - JSON feature-manifest registry (`plotpointe/feature_registry.py:17-64`).
Here all three are one module: dataclasses with `from_env` override support and
a registry loader compatible with the reference's manifest JSON schema.
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional


def _env_override(cfg, prefix: str = ""):
    """Apply FIELD_NAME (upper-cased, dashes->underscores) env overrides."""
    for f in dataclasses.fields(cfg):
        env_key = (prefix + f.name).upper()
        raw = os.environ.get(env_key)
        if raw is None:
            continue
        typ = f.type if isinstance(f.type, type) else type(getattr(cfg, f.name))
        if typ is bool or isinstance(getattr(cfg, f.name), bool):
            val: Any = raw.lower() in ("1", "true", "yes")
        elif isinstance(getattr(cfg, f.name), int):
            val = int(raw)
        elif isinstance(getattr(cfg, f.name), float):
            val = float(raw)
        else:
            val = raw
        setattr(cfg, f.name, val)
    return cfg


@dataclass
class TrainConfig:
    """Training config, field-parity with the reference trainer Configs
    (`scripts/train_gat_custom.py:40-59`, `scripts/train_gat_pyg.py:46-65`)
    minus the GCP-project plumbing, plus TPU-specific knobs."""

    # model
    model_family: str = "gat"  # {gat, lightgcn}
    hidden_dim: int = 128
    layers: int = 2
    heads: int = 1
    attn_dropout: float = 0.1
    # optimization
    lr: float = 1e-3
    l2: float = 1e-4
    epochs: int = 20
    samples_per_epoch: int = 200_000
    steps_per_epoch: int = 1  # reference protocol: ONE optimizer step per epoch
    # beyond-parity: "adamw" decouples weight decay (prevents the long-schedule
    # plateau collapse, see train/trainer.py::make_optimizer); warmup ramps lr
    optimizer: str = "adam"  # {adam (reference parity), adamw}
    warmup_steps: int = 0
    loss: str = "bpr"  # {bpr, bce}
    seed: int = 42
    # eval protocol (1 positive + eval_neg_k sampled negatives per user)
    eval_neg_k: int = 1000
    eval_chunk: int = 2048
    # features
    item_features: str = "fused"  # {fused, txt}
    # lightgcn-specific
    embed_dim: int = 64
    n_prop_layers: int = 3
    batch_size: int = 8192
    neg_per_pos: int = 5
    # TPU execution
    # auto = fused Pallas kernels on TPU, XLA golden path elsewhere
    attn_impl: str = "auto"  # {auto, xla, pallas} — GAT attention aggregation kernel
    spmm_impl: str = "auto"  # {auto, xla, pallas} — LightGCN propagation SpMM kernel
    param_dtype: str = "float32"
    compute_dtype: str = "float32"  # bfloat16 for large runs
    mesh_shape: Optional[str] = None  # e.g. "data:4,model:2"; None = single device
    # io
    artifacts_prefix: str = "tmp/artifacts"
    models_prefix: str = "tmp/models"
    run_id: Optional[str] = None
    structured_logs: bool = False

    @classmethod
    def from_env(cls, **kwargs) -> "TrainConfig":
        return _env_override(cls(**kwargs))

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclass
class FusionConfig:
    """Fusion-MLP config (`embeddings/fuse_modal.py:18-36` semantics)."""

    text_dim: int = 384
    img_dim: int = 512
    output_dim: int = 128
    hidden_dim: int = 256
    dropout: float = 0.1
    temperature: float = 0.07
    epochs: int = 5
    batch_size: int = 1024
    lr: float = 1e-3
    seed: int = 42

    @classmethod
    def from_env(cls, **kwargs) -> "FusionConfig":
        return _env_override(cls(**kwargs), prefix="FUSION_")

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


@dataclass
class KnnConfig:
    """Item-item cosine-kNN config (`graphs/build_ii_knn.py:79-99` semantics)."""

    k: int = 20
    min_similarity: float = 0.3
    block_rows: int = 1024

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


# ---------------------------------------------------------------------------
# Feature manifest registry (schema parity with plotpointe/feature_registry.py)
# ---------------------------------------------------------------------------


@dataclass
class FeatureManifest:
    id: str
    dataset: str
    paths: Dict[str, str]
    defaults: Dict[str, str] = field(default_factory=dict)

    REQUIRED_PATHS = ("staging_prefix", "embeddings_prefix", "graphs_prefix")

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "FeatureManifest":
        for k in ("id", "dataset", "paths", "defaults"):
            if k not in d:
                raise ValueError(f"Manifest missing required key: {k}")
        for p in FeatureManifest.REQUIRED_PATHS:
            if p not in d["paths"]:
                raise ValueError(f"Manifest.paths missing required key: {p}")
        return FeatureManifest(id=d["id"], dataset=d["dataset"], paths=d["paths"], defaults=d.get("defaults", {}))

    def resolve_paths(self) -> Dict[str, str]:
        """Map manifest entries to trainer flag names."""
        return {
            "staging_prefix": self.paths["staging_prefix"],
            "embeddings_prefix": self.paths["embeddings_prefix"],
            "graphs_prefix": self.paths["graphs_prefix"],
            "item_features": self.defaults.get("item_features", "fused"),
        }


def load_registry(registry_path: str | Path = "manifests/registry.json") -> Dict[str, str]:
    with open(registry_path) as f:
        reg = json.load(f)
    if "manifests" not in reg:
        raise ValueError("Registry missing 'manifests'")
    return reg["manifests"]


def load_manifest(manifest_id: str, registry_path: str | Path = "manifests/registry.json") -> FeatureManifest:
    manifests = load_registry(registry_path)
    if manifest_id not in manifests:
        raise KeyError(f"Manifest id not found in registry: {manifest_id}")
    base = Path(registry_path).parent.parent
    p = Path(manifests[manifest_id])
    if not p.is_absolute() and not p.exists():
        p = base / p
    with open(p) as f:
        return FeatureManifest.from_dict(json.load(f))
