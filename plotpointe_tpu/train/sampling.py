"""Vectorized on-device negative sampling — EXACT, no rejection loops.

Distribution parity with `train_gat_custom.py:213-224` (`sample_bpr_epoch`):
  u ~ Uniform(train users)            (NOT degree-proportional)
  i ~ Uniform(positives of u)
  j ~ Uniform(items \\ positives(u))
and with the eval protocol (`train_gat_custom.py:184-199`):
  negatives ~ Uniform(items \\ (positives(u) + {eval positive})), i.i.d.

The reference realizes "Uniform over non-positives" with a Python rejection
while-loop per sample. On TPU we compute the same distribution in closed form
via order statistics: draw a rank r ~ Uniform[0, n_items - |avoid|), then map
r to the r-th smallest item NOT in the avoid set by scanning the SORTED avoid
row (padded_positives gives sorted rows):

    j = r;  for p in sorted_avoid:  j += (p <= j)

Each avoid value <= the running j shifts the rank past one excluded item.
Static cost O(P) per sample (P = padded positive width), exact for every user
whose positive set fits the padding width — no residual collision probability
at all, unlike resampling schemes.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _rank_to_item(r: jax.Array, sorted_avoid: jax.Array) -> jax.Array:
    """Map uniform ranks over the complement to item ids.

    r: [...] int32 ranks; sorted_avoid: [..., A] ascending, padded with a value
    larger than any reachable id (n_items). Broadcasting: sorted_avoid's batch
    dims must broadcast against r's leading dims.
    """
    A = sorted_avoid.shape[-1]

    def body(k, j):
        p = sorted_avoid[..., k]
        if p.ndim < j.ndim:  # broadcast [C] avoid rows against [C, K] ranks
            p = p[..., None]
        return j + (p <= j).astype(j.dtype)

    return jax.lax.fori_loop(0, A, body, r)


def _uniform_ranks(key: jax.Array, shape, bound: jax.Array) -> jax.Array:
    """r ~ Uniform[0, bound) with per-element bounds (degenerate bound <= 0,
    i.e. a user whose positives cover every item, clamps to rank 0)."""
    bound = jnp.maximum(bound, 1)
    u = jax.random.uniform(key, shape, dtype=jnp.float32)
    r = jnp.floor(u * bound.astype(jnp.float32)).astype(jnp.int32)
    return jnp.minimum(r, bound - 1)


@functools.partial(jax.jit, static_argnames=("n_samples", "n_items"))
def sample_bpr_triples(
    key: jax.Array,
    train_users: jax.Array,  # int32 [U_t] users with >=1 train positive
    user_pos_padded: jax.Array,  # int32 [n_users, P] sorted ascending, pad = n_items
    user_deg: jax.Array,  # int32 [n_users] unique-positive counts
    n_items: int,
    n_samples: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (u, i, j) int32 arrays of length n_samples."""
    k_u, k_i, k_j = jax.random.split(key, 3)

    sel = jax.random.randint(k_u, (n_samples,), 0, train_users.shape[0])
    u = train_users[sel]
    deg_u = user_deg[u]
    pos_table = user_pos_padded[u]  # [S, P] sorted

    pos_slot = _uniform_ranks(k_i, (n_samples,), deg_u)
    i = jnp.take_along_axis(pos_table, pos_slot[:, None], axis=1)[:, 0]

    r = _uniform_ranks(k_j, (n_samples,), n_items - deg_u)
    j = _rank_to_item(r, pos_table)

    return u.astype(jnp.int32), i.astype(jnp.int32), j.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_items", "neg_k"))
def sample_eval_negatives(
    key: jax.Array,
    eval_users: jax.Array,  # int32 [C]
    eval_pos: jax.Array,  # int32 [C]
    user_pos_padded: jax.Array,  # int32 [n_users, P] sorted ascending
    user_deg: jax.Array,  # int32 [n_users]
    n_items: int,
    neg_k: int,
) -> jax.Array:
    """[C, neg_k] i.i.d. negatives avoiding train positives and the eval
    positive (protocol of train_gat_custom.py:184-199)."""
    c = eval_users.shape[0]
    pos_table = user_pos_padded[eval_users]  # [C, P]
    deg = user_deg[eval_users]

    # merge the eval positive into the sorted avoid row (as pad if already there)
    in_table = jnp.any(pos_table == eval_pos[:, None], axis=1)
    extra = jnp.where(in_table, n_items, eval_pos).astype(pos_table.dtype)
    avoid = jnp.sort(jnp.concatenate([pos_table, extra[:, None]], axis=1), axis=1)  # [C, P+1]
    avoid_count = deg + (~in_table).astype(deg.dtype)

    r = _uniform_ranks(key, (c, neg_k), (n_items - avoid_count)[:, None] * jnp.ones((1, neg_k), jnp.int32))
    return _rank_to_item(r, avoid).astype(jnp.int32)
