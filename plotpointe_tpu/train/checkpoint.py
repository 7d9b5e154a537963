"""Self-describing checkpoints: params pytree + embedded config in one npz.

Parity with the reference's `torch.save({"state_dict", "config"})`
(`train_gat_custom.py:374-377`) and the exporter's reliance on the embedded
config (`tools/export_item_embeddings.py:125-137`): a checkpoint alone is
enough to rebuild the model. Format is a flat npz keyed by pytree key-paths
plus a `__config__` JSON string — no pickle, portable across hosts.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np

import jax

_CONFIG_KEY = "__config__"


def _flatten(params) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {jax.tree_util.keystr(kp): np.asarray(v) for kp, v in flat}


def save_checkpoint(path: str | Path, params: Any, config: Dict[str, Any]) -> str:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = _flatten(params)
    np.savez(path, **{_CONFIG_KEY: np.array(json.dumps(config))}, **arrays)
    return str(path)


def load_config(path: str | Path) -> Dict[str, Any]:
    with np.load(path, allow_pickle=False) as z:
        return json.loads(str(z[_CONFIG_KEY]))


def save_resume_state(path: str | Path, params: Any, opt_state: Any, best_params: Any, meta: Dict[str, Any]) -> str:
    """Full mid-training state (params + optimizer moments + best params +
    epoch/metric meta) — enables preemption-safe resume, which the reference
    lacks entirely (SURVEY.md section 5: 'a preempted training job restarts
    from scratch')."""
    bundle = {"params": params, "opt_state": opt_state, "best_params": best_params}
    return save_checkpoint(path, bundle, {"resume_meta": meta})


def load_resume_state(path: str | Path, params_template: Any, opt_template: Any) -> Tuple[Any, Any, Any, Dict[str, Any]]:
    bundle_template = {"params": params_template, "opt_state": opt_template, "best_params": params_template}
    bundle, config = load_checkpoint(path, bundle_template)
    return bundle["params"], bundle["opt_state"], bundle["best_params"], config["resume_meta"]


def load_checkpoint(path: str | Path, params_template: Any) -> Tuple[Any, Dict[str, Any]]:
    """Restore params into the structure of `params_template` (e.g. from
    model.init on the embedded config) and return (params, config)."""
    with np.load(path, allow_pickle=False) as z:
        config = json.loads(str(z[_CONFIG_KEY]))
        stored = {k: z[k] for k in z.files if k != _CONFIG_KEY}

    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    new_leaves = []
    for kp, leaf in leaves_with_path:
        key = jax.tree_util.keystr(kp)
        if key not in stored:
            raise KeyError(f"checkpoint missing parameter {key}")
        arr = stored[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(f"shape mismatch for {key}: ckpt {arr.shape} vs template {np.shape(leaf)}")
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), config
