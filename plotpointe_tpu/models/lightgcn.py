"""LightGCN baseline on the same graph layout and trainer harness.

Parity with `scripts/train_lightgcn.py:51-76`: user/item embedding tables
N(0, 0.1) [*, 64], K rounds of normalized-adjacency propagation
(D^{-1/2} A D^{-1/2}) with layer-mean combination. The reference rebuilds a
COO sparse tensor and calls cuSPARSE per batch; here propagation is the
`spmm` segment op over the static dst-sorted layout, jitted once.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from plotpointe_tpu.graphs.csr import Graph
from plotpointe_tpu.ops.segment import spmm


@dataclass(frozen=True)
class LightGCNModel:
    n_users: int
    n_items: int
    embed_dim: int = 64
    n_prop_layers: int = 3
    param_dtype: Any = jnp.float32
    spmm_impl: str = "xla"

    @property
    def n_nodes(self) -> int:
        return self.n_users + self.n_items

    def init(self, key: jax.Array) -> Dict[str, Any]:
        ku, ki = jax.random.split(key)
        return {
            "user_emb": 0.1 * jax.random.normal(ku, (self.n_users, self.embed_dim), self.param_dtype),
            "item_emb": 0.1 * jax.random.normal(ki, (self.n_items, self.embed_dim), self.param_dtype),
        }

    def _spmm(self, graph: Graph, values: jax.Array, x: jax.Array) -> jax.Array:
        from plotpointe_tpu.ops.segment import resolve_attn_impl

        if resolve_attn_impl(self.spmm_impl) == "pallas" and graph.layout is not None:
            from plotpointe_tpu.ops.spmm_kernel import spmm_pallas

            return spmm_pallas(graph, values, x)
        return spmm(graph, values, x)

    def propagate(
        self, params: Dict[str, Any], graph: Graph, norm_values: jax.Array, spmm_op=None
    ) -> Tuple[jax.Array, jax.Array]:
        """K propagation rounds, mean over layers 0..K (train_lightgcn.py:64-76).

        `spmm_op` — optional prebuilt static operator (ops.spmm_kernel.make_spmm)
        for the FIXED (graph, norm_values) training pair: edge weights are
        host-aligned once instead of re-gathered on device every step."""
        x = jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)
        acc = x
        out = x
        for _ in range(self.n_prop_layers):
            out = spmm_op(out) if spmm_op is not None else self._spmm(graph, norm_values, out)
            acc = acc + out
        acc = acc / (self.n_prop_layers + 1)
        return acc[: self.n_users], acc[self.n_users :]

    def apply(self, params, item_feats, graph, norm_values=None, spmm_op=None, **_):
        """Trainer-harness-compatible forward -> [n_nodes, embed_dim].
        `item_feats` is unused (LightGCN is ID-only) but kept for signature parity."""
        if norm_values is None and spmm_op is None:
            raise ValueError("LightGCN requires norm_values (symmetric_normalized_weights)")
        u, i = self.propagate(params, graph, norm_values, spmm_op=spmm_op)
        return jnp.concatenate([u, i], axis=0)

    def config_dict(self) -> Dict[str, Any]:
        return {
            "model_family": "lightgcn",
            "n_users": self.n_users,
            "n_items": self.n_items,
            "embed_dim": self.embed_dim,
            "n_prop_layers": self.n_prop_layers,
        }

    @staticmethod
    def from_config(d: Dict[str, Any]) -> "LightGCNModel":
        return LightGCNModel(
            n_users=int(d["n_users"]),
            n_items=int(d["n_items"]),
            embed_dim=int(d.get("embed_dim", 64)),
            n_prop_layers=int(d.get("n_prop_layers", 3)),
        )
