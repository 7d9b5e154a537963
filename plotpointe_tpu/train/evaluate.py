"""Sampled-negative Recall@K / NDCG@K evaluation — the comparability gate.

Protocol parity with `train_gat_custom.py:184-210` (and the identical PyG /
LightGCN evaluators): per eval user, 1 positive + `neg_k` sampled negatives
drawn uniformly over items excluding the user's train positives and the
positive itself; rank = (#negatives with score strictly greater) + 1;
recall@K = 1[rank <= K]; ndcg@K = 1/log2(rank+1) if hit else 0; macro-mean.

TPU-first formulation: instead of a per-user Python loop with 1001 dot
products (the reference's hot loop), users are processed in static-size chunks
where scores for ALL items come from one [chunk, hidden] x [hidden, n_items]
MXU matmul; candidate scores are then gathered per user. Negative sampling is
the exact order-statistic scheme from plotpointe_tpu.train.sampling.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from plotpointe_tpu.train.sampling import sample_eval_negatives


@functools.partial(jax.jit, static_argnames=("neg_k", "ks"))
def _eval_chunk(
    U: jax.Array,  # [n_users, H]
    I: jax.Array,  # [n_items, H]
    users: jax.Array,  # [C] int32 (may contain repeats of user 0 as padding)
    pos: jax.Array,  # [C] int32
    valid: jax.Array,  # [C] float {0,1}
    user_pos_padded: jax.Array,
    user_deg: jax.Array,
    key: jax.Array,
    neg_k: int,
    ks: Tuple[int, ...],
):
    n_items = I.shape[0]
    negs = sample_eval_negatives(key, users, pos, user_pos_padded, user_deg, n_items, neg_k)  # [C, neg_k]

    # HIGH (bf16x3) matmul precision: rank-of-positive comparisons are
    # value-sensitive; plain-bf16 MXU rounding could flip near-ties vs the
    # reference's f32 scoring
    scores_all = jnp.dot(
        U[users], I.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGH
    )  # [C, n_items]
    pos_score = jnp.take_along_axis(scores_all, pos[:, None], axis=1)  # [C, 1]
    neg_scores = jnp.take_along_axis(scores_all, negs, axis=1)  # [C, neg_k]

    rank = 1 + jnp.sum(neg_scores > pos_score, axis=1)  # strict >, ties favor positive
    # NaN guard: NaN scores make every comparison False -> rank 1 -> fake
    # perfect metrics (a diverged model would otherwise score 1.0); count a
    # non-finite positive score as unranked instead
    rank = jnp.where(jnp.isfinite(pos_score[:, 0]), rank, neg_k + 2)
    # degenerate-collapse diagnostic: fraction of negatives EXACTLY tying the
    # positive (a collapsed model ties everything and the reference's strict->
    # rule then scores it perfect; surfacing tie_fraction makes that visible)
    ties = jnp.sum(neg_scores == pos_score, axis=1).astype(jnp.float32) / neg_k
    out = {"tie_frac_sum": (ties * valid).sum()}
    for k in ks:
        hit = (rank <= k).astype(jnp.float32) * valid
        ndcg = jnp.where(rank <= k, 1.0 / jnp.log2(rank.astype(jnp.float32) + 1.0), 0.0) * valid
        out[f"recall@{k}_sum"] = hit.sum()
        out[f"ndcg@{k}_sum"] = ndcg.sum()
    out["count"] = valid.sum()
    return out


@functools.partial(jax.jit, static_argnames=("neg_k", "ks", "chunk"))
def _eval_all_chunks(
    U, I, users, pos, valid, user_pos_padded, user_deg, key, neg_k, ks, chunk
):
    """lax.scan over user chunks inside ONE jit — the whole eval is a single
    device program with a single host sync at the end (the Python-loop
    per-chunk `float()` version cost ~n_chunks round-trips per eval)."""
    n_chunks = users.shape[0] // chunk

    def body(carry, c):
        out = _eval_chunk(
            U, I,
            jax.lax.dynamic_slice_in_dim(users, c * chunk, chunk),
            jax.lax.dynamic_slice_in_dim(pos, c * chunk, chunk),
            jax.lax.dynamic_slice_in_dim(valid, c * chunk, chunk),
            user_pos_padded, user_deg,
            jax.random.fold_in(key, c), neg_k, ks,
        )
        return jax.tree.map(lambda a, b: a + b, carry, out), None

    init = {"tie_frac_sum": jnp.float32(0.0), "count": jnp.float32(0.0)}
    for k in ks:
        init[f"recall@{k}_sum"] = jnp.float32(0.0)
        init[f"ndcg@{k}_sum"] = jnp.float32(0.0)
    sums, _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return sums


def sampled_eval(
    U: jax.Array,
    I: jax.Array,
    eval_users: np.ndarray,
    eval_pos: np.ndarray,
    user_pos_padded: jax.Array,
    user_deg: jax.Array,
    key: jax.Array,
    neg_k: int = 1000,
    ks: Tuple[int, ...] = (10, 20),
    chunk: int = 512,
) -> Dict[str, float]:
    """Macro-averaged sampled metrics over (eval_users, eval_pos)."""
    n = len(eval_users)
    if n == 0:
        return {f"{m}@{k}": 0.0 for k in ks for m in ("recall", "ndcg")}
    chunk = min(chunk, ((n + 127) // 128) * 128)  # don't pad tiny evals to 512
    n_pad = ((n + chunk - 1) // chunk) * chunk
    users = np.zeros(n_pad, dtype=np.int32)
    pos = np.zeros(n_pad, dtype=np.int32)
    valid = np.zeros(n_pad, dtype=np.float32)
    users[:n] = eval_users
    pos[:n] = eval_pos
    valid[:n] = 1.0

    sums = jax.tree.map(
        float,
        _eval_all_chunks(
            U, I, jnp.asarray(users), jnp.asarray(pos), jnp.asarray(valid),
            user_pos_padded, user_deg, key, neg_k, ks, chunk,
        ),
    )
    count = sums["count"]

    metrics = {}
    for k in ks:
        metrics[f"recall@{k}"] = sums[f"recall@{k}_sum"] / max(count, 1.0)
        metrics[f"ndcg@{k}"] = sums[f"ndcg@{k}_sum"] / max(count, 1.0)
    metrics["tie_fraction"] = sums["tie_frac_sum"] / max(count, 1.0)
    return metrics
