"""Segment ops over dst-sorted edge layouts — XLA reference implementations.

These are the golden-reference implementations of the framework's irregular
compute primitives; the Pallas kernels in `plotpointe_tpu.ops.gat_kernel` /
`spmm_kernel` implement the same signatures and are verified against these.

TPU-native replacement for the reference's CUDA scatter primitives:
  - `segment_softmax_attention` replaces the scatter_add_/index_add_ GAT layer
    body (`scripts/train_gat_custom.py:75-93`),
  - `spmm` replaces `torch.sparse.mm` LightGCN propagation
    (`scripts/train_lightgcn.py:64-76`).

All ops assume the `Graph` layout from plotpointe_tpu.graphs.csr: edges sorted
by destination, padded with sentinel src=dst=n_nodes, so `indices_are_sorted`
holds and padding contributions land in a throwaway segment.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from plotpointe_tpu.graphs.csr import Graph

LEAKY_SLOPE = 0.2  # reference: torch.nn.LeakyReLU(0.2), train_gat_custom.py:70
LOGIT_CLAMP = 10.0  # reference: torch.clamp(e, -10, 10), train_gat_custom.py:80
EPS = 1e-9  # reference softmax denominator epsilon, train_gat_custom.py:88


def segment_sum(data: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Sorted-segment sum (thin wrapper so kernel variants share a call site)."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments, indices_are_sorted=True)


def resolve_attn_impl(impl: str) -> str:
    """"auto" -> the fused Pallas path on TPU, the XLA golden elsewhere.

    A TPU-first framework defaults to its TPU kernels on TPU; the XLA
    implementation stays as the golden cross-check and the CPU/GPU fallback.
    """
    if impl == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


def _pad_sentinel(x: jax.Array) -> jax.Array:
    """Append one zero row so sentinel node id == n_nodes is addressable."""
    pad_shape = (1,) + x.shape[1:]
    return jnp.concatenate([x, jnp.zeros(pad_shape, x.dtype)], axis=0)


def segment_softmax_attention(
    h: jax.Array,  # [N, H, D] per-head projected node features
    a_src: jax.Array,  # [H, D]
    a_dst: jax.Array,  # [H, D]
    graph: Graph,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
    impl: str = "xla",
) -> jax.Array:
    """Additive single-layer GAT attention with per-destination segment softmax.

    Per edge (s -> d), per head: e = leaky_relu(h[s].a_src + h[d].a_dst),
    clamp to +-LOGIT_CLAMP, alpha = exp(e) / sum_{s' -> d} exp(e'),
    out[d] = sum alpha * h[s]. Exact math parity (including the clamp instead
    of a segment max-subtraction) with train_gat_custom.py:75-93; heads
    generalize it to the PyG GATConv usage (train_gat_pyg.py:68-88).

    Returns [N, H, D].
    """
    if resolve_attn_impl(impl) == "pallas":
        from plotpointe_tpu.ops.gat_kernel import segment_softmax_attention_pallas

        return segment_softmax_attention_pallas(h, a_src, a_dst, graph, dropout_rate=dropout_rate, rng=rng)

    n = graph.n_nodes
    hp = _pad_sentinel(h)  # [N+1, H, D]

    # Per-node scalar attention terms first, then gather scalars per edge —
    # avoids two [E, H, D] gathers for the logits.
    gs = jnp.einsum("nhd,hd->nh", hp, a_src)  # [N+1, H]
    gd = jnp.einsum("nhd,hd->nh", hp, a_dst)

    e = gs[graph.src] + gd[graph.dst]  # [E, H]
    e = jnp.where(e > 0, e, LEAKY_SLOPE * e)
    e = jnp.clip(e, -LOGIT_CLAMP, LOGIT_CLAMP)
    num = jnp.exp(e)

    denom = segment_sum(num, graph.dst, n + 1)  # [N+1, H]
    alpha = num / (denom[graph.dst] + EPS)

    if dropout_rate > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, alpha.shape)
        alpha = jnp.where(keep, alpha / (1.0 - dropout_rate), 0.0)

    msg = alpha[..., None] * hp[graph.src]  # [E, H, D]
    out = segment_sum(msg, graph.dst, n + 1)
    return out[:n]


def spmm(graph: Graph, values: jax.Array, x: jax.Array) -> jax.Array:
    """y[d] = sum_{(s->d) in E} values_e * x[s] — CSR SpMM over the dst-sorted
    layout (LightGCN normalized-adjacency propagation). x: [N, F] -> [N, F]."""
    xp = _pad_sentinel(x)
    msg = values[:, None] * xp[graph.src]
    out = segment_sum(msg, graph.dst, graph.n_nodes + 1)
    return out[: graph.n_nodes]


def weighted_degree(graph: Graph, values: jax.Array) -> jax.Array:
    """Sum of incoming edge values per node."""
    return segment_sum(values, graph.dst, graph.n_nodes + 1)[: graph.n_nodes]
