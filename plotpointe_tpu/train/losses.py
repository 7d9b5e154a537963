"""Ranking losses — math parity with the reference trainers.

BPR: -log(sigmoid(pos - neg) + 1e-8), mean  (train_gat_custom.py:354-355)
BCE: binary cross-entropy with logits over [pos; neg] with labels [1; 0]
     (train_gat_custom.py:356-359)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bpr_loss(pos_scores: jax.Array, neg_scores: jax.Array) -> jax.Array:
    return -jnp.log(jax.nn.sigmoid(pos_scores - neg_scores) + 1e-8).mean()


def bce_loss(pos_scores: jax.Array, neg_scores: jax.Array) -> jax.Array:
    logits = jnp.concatenate([pos_scores, neg_scores], axis=0)
    labels = jnp.concatenate([jnp.ones_like(pos_scores), jnp.zeros_like(neg_scores)], axis=0)
    # stable BCE-with-logits: max(x,0) - x*y + log(1 + exp(-|x|))
    return jnp.mean(jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits))))


LOSSES = {"bpr": bpr_loss, "bce": bce_loss}
