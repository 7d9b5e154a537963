"""GAT recommender tower: learned user table + item feature projection into a
unified node space, L stacked segment-softmax attention layers.

Architecture parity with the reference's CustomGAT
(`scripts/train_gat_custom.py:96-115`): user embeddings N(0, 0.1) [n_users, H],
item projection Linear(feat_dim -> H), nodes = concat([users, items]), then L
GAT layers (hidden -> hidden). `heads > 1` generalizes to the PyG GATConv
configuration (`scripts/train_gat_pyg.py:68-88`: concat=False i.e. head-mean,
add_self_loops=False) so one model family covers both reference trainers.

Functional-JAX design: params are a plain pytree; `apply` is pure and jit/pjit
friendly; attention dispatches to the XLA reference op or the Pallas kernel.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from plotpointe_tpu.graphs.csr import Graph
from plotpointe_tpu.ops.segment import segment_softmax_attention


def _xavier_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


@dataclass(frozen=True)
class GATModel:
    """Static model config + init/apply. (Params live outside, as a pytree.)"""

    n_users: int
    n_items: int
    feat_dim: int
    hidden_dim: int = 128
    n_layers: int = 2
    heads: int = 1
    attn_dropout: float = 0.1
    use_bias: bool = False  # CustomGAT: lin(bias=False); PyG GATConv: bias=True
    param_dtype: Any = jnp.float32
    attn_impl: str = "auto"  # {"auto", "xla", "pallas"} — auto = pallas on TPU

    @property
    def n_nodes(self) -> int:
        return self.n_users + self.n_items

    # -- params --------------------------------------------------------------

    def init(self, key: jax.Array) -> Dict[str, Any]:
        k_user, k_proj, *k_layers = jax.random.split(key, 2 + self.n_layers)
        H, D, heads = self.hidden_dim, self.hidden_dim, self.heads
        params: Dict[str, Any] = {
            # reference: torch.nn.init.normal_(user_emb.weight, std=0.1)
            "user_emb": 0.1 * jax.random.normal(k_user, (self.n_users, H), self.param_dtype),
            "item_proj": {
                # torch Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
                "w": jax.random.uniform(
                    k_proj,
                    (self.feat_dim, H),
                    self.param_dtype,
                    minval=-1.0 / math.sqrt(self.feat_dim),
                    maxval=1.0 / math.sqrt(self.feat_dim),
                ),
                "b": jnp.zeros((H,), self.param_dtype),
            },
            "layers": [],
        }
        for kl in k_layers:
            kw, ks, kd = jax.random.split(kl, 3)
            layer = {
                # reference: xavier_uniform on lin.weight and on a vectors
                "w": _xavier_uniform(kw, (H, heads, D), H, D, self.param_dtype),
                "a_src": _xavier_uniform(ks, (heads, D), 1, D, self.param_dtype),
                "a_dst": _xavier_uniform(kd, (heads, D), 1, D, self.param_dtype),
            }
            if self.use_bias:
                layer["b"] = jnp.zeros((D,), self.param_dtype)
            params["layers"].append(layer)
        return params

    # -- forward -------------------------------------------------------------

    def node_features(self, params: Dict[str, Any], item_feats: jax.Array) -> jax.Array:
        """concat([user_emb, item_proj(item_feats)]) -> [n_nodes, hidden]."""
        v = item_feats @ params["item_proj"]["w"] + params["item_proj"]["b"]
        return jnp.concatenate([params["user_emb"], v], axis=0)

    def apply(
        self,
        params: Dict[str, Any],
        item_feats: jax.Array,
        graph: Graph,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Full-graph forward -> node embeddings [n_nodes, hidden]."""
        from plotpointe_tpu.ops.segment import resolve_attn_impl

        impl = resolve_attn_impl(self.attn_impl)
        if impl == "pallas" and graph.layout is None and graph.chunk_base is None:
            impl = "xla"  # auto-resolved pallas needs kernel tiling; plain graphs use the golden path
        x = self.node_features(params, item_feats)
        drop = self.attn_dropout if train else 0.0
        for li, layer in enumerate(params["layers"]):
            h = jnp.einsum("nf,fhd->nhd", x, layer["w"])  # [N, H, D]
            layer_rng = jax.random.fold_in(rng, li) if (rng is not None and drop > 0) else None
            out = segment_softmax_attention(
                h,
                layer["a_src"],
                layer["a_dst"],
                graph,
                dropout_rate=drop,
                rng=layer_rng,
                impl=impl,
            )  # [N, heads, D]
            x = out.mean(axis=1)  # head-mean (PyG concat=False); identity for heads=1
            if self.use_bias:
                x = x + layer["b"]
        return x

    def user_item_embeddings(self, params, item_feats, graph, **kw):
        z = self.apply(params, item_feats, graph, **kw)
        return z[: self.n_users], z[self.n_users :]

    # -- config embedding for self-describing checkpoints --------------------

    def config_dict(self) -> Dict[str, Any]:
        return {
            "model_family": "gat",
            "n_users": self.n_users,
            "n_items": self.n_items,
            "feat_dim": self.feat_dim,
            "hidden_dim": self.hidden_dim,
            "n_layers": self.n_layers,
            "heads": self.heads,
            "attn_dropout": self.attn_dropout,
            "use_bias": self.use_bias,
        }

    @staticmethod
    def from_config(d: Dict[str, Any], attn_impl: str = "xla") -> "GATModel":
        return GATModel(
            n_users=int(d["n_users"]),
            n_items=int(d["n_items"]),
            feat_dim=int(d["feat_dim"]),
            hidden_dim=int(d.get("hidden_dim", 128)),
            n_layers=int(d.get("n_layers", 2)),
            heads=int(d.get("heads", 1)),
            attn_dropout=float(d.get("attn_dropout", 0.1)),
            use_bias=bool(d.get("use_bias", False)),
            attn_impl=attn_impl,
        )
