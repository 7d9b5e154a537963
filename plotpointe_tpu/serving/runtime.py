"""Serving runtime: mean-history user vector -> top-K dot-product retrieval.

Behavior parity with `serving/runtime.py:19-76` of the reference (user vector
= mean of history item vectors, history masked to -1e9, top-K by score), but
the scoring path runs on-device: one [n_items, d] @ [d] GEMV + `lax.top_k`
under jit (or the Pallas MIPS kernel for the fused scan), instead of numpy
argpartition on CPU. Artifact loading goes through the ArtifactStore, so
`item_embeddings.npy` can live on local disk or GCS.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from plotpointe_tpu.utils.artifacts import ArtifactStore


@dataclass
class ServingConfig:
    item_embeddings_uri: str
    item_index_map_uri: Optional[str] = None
    topk: int = 20
    project_id: Optional[str] = None
    use_device: bool = True  # False -> pure numpy (tiny deployments, no JAX device)
    use_pallas_topk: Optional[bool] = None  # None = auto: the fused streaming
    # kernel on TPU (the TPU-first default; 0.42 ms / 152k QPS at the 498k
    # bf16 catalog vs 1.6 ms XLA), the XLA scorer elsewhere
    topk_mode: str = "exact"  # "fast" = phase-2 chunk margin 2 instead of 8
    # (smaller candidate rescore; a true top-k item is lost only when >margin
    # chunk-maxima tie within the packed-key truncation bucket above its
    # chunk — see ops/topk_kernel.py; exact f32 re-score either way)
    table_dtype: str = "float32"  # "bfloat16" halves catalog HBM + stream traffic
    # (scores stay f32 via preferred_element_type; ranks can differ by bf16
    # rounding ~4e-3 relative on near-ties)


@functools.partial(jax.jit, static_argnames=("kk",))
def _topk_scores_batch(item_vecs: jax.Array, q: jax.Array, kk: int):
    """Batched retrieval: q [B, d] -> ([B, kk] indices, [B, kk] scores).
    One [B, d] x [d, N] MXU matmul streams the catalog ONCE for the whole
    batch — the serving stream floor is per-batch, not per-query."""
    scores = jnp.dot(q, item_vecs.T, preferred_element_type=jnp.float32)
    top_scores, top_idx = jax.lax.top_k(scores, kk)
    return top_idx, top_scores


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_scores(item_vecs: jax.Array, history: jax.Array, hist_mask: jax.Array, k: int):
    """history: [Hmax] int32 padded with 0, hist_mask: [Hmax] float {0,1}."""
    hvecs = item_vecs[history].astype(jnp.float32) * hist_mask[:, None]
    user_vec = hvecs.sum(axis=0) / jnp.maximum(hist_mask.sum(), 1.0)
    scores = jnp.dot(item_vecs, user_vec.astype(item_vecs.dtype),
                     preferred_element_type=jnp.float32)
    # mask history items to -1e9 (parity with serving/runtime.py:69)
    scores = scores.at[history].set(jnp.where(hist_mask > 0, -1e9, scores[history]))
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return top_idx, top_scores


class RecommenderRuntime:
    HIST_PAD = 64  # static history length buckets: 64, 128, ... (power-of-2 growth)

    def __init__(self, cfg: ServingConfig, store: Optional[ArtifactStore] = None):
        self.cfg = cfg
        self.store = store or ArtifactStore(project_id=cfg.project_id)
        self.item_vecs: Optional[np.ndarray] = None
        self._item_vecs_dev = None
        self.item_to_idx: Optional[dict] = None

    def _pallas_topk(self) -> bool:
        if self.cfg.use_pallas_topk is not None:
            return self.cfg.use_pallas_topk
        import jax

        return jax.default_backend() == "tpu"

    def startup(self) -> None:
        self.item_vecs = np.asarray(self.store.load_npy(self.cfg.item_embeddings_uri), dtype=np.float32)
        if self.cfg.use_device:
            self._item_vecs_dev = jnp.asarray(self.item_vecs,
                                              dtype=jnp.dtype(self.cfg.table_dtype))
        if self.cfg.item_index_map_uri:
            self.item_to_idx = self.store.load_json(self.cfg.item_index_map_uri)

    def _ensure_started(self):
        if self.item_vecs is None:
            raise RuntimeError("Runtime not started. Call startup().")

    def top_k_for_user_items(self, item_ids: List[int], k: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        self._ensure_started()
        assert len(item_ids) > 0, "Need at least one item id from user history"
        K = int(k or self.cfg.topk)
        ids = np.asarray(item_ids, dtype=np.int32)

        if not self.cfg.use_device:
            return self._topk_numpy(ids, K)

        # pad history to the next static bucket so jit caches a few shapes only
        hmax = self.HIST_PAD
        while hmax < len(ids):
            hmax *= 2
        hist = np.zeros(hmax, dtype=np.int32)
        mask = np.zeros(hmax, dtype=np.float32)
        hist[: len(ids)] = ids
        mask[: len(ids)] = 1.0

        if self._pallas_topk():
            from plotpointe_tpu.ops.topk_kernel import topk_mips_pallas

            hvecs = self.item_vecs[ids]
            q = jnp.asarray((hvecs.mean(axis=0))[None, :])
            # retrieve K + |history| then drop history (kernel is history-agnostic)
            kk = min(K + len(ids), self.item_vecs.shape[0])
            idx, scores = topk_mips_pallas(self._item_vecs_dev, q, kk,
                                           mode=self.cfg.topk_mode)
            idx, scores = np.asarray(idx[0]), np.asarray(scores[0])
            keep = ~np.isin(idx, ids)
            return idx[keep][:K], scores[keep][:K]

        idx, scores = _topk_scores(self._item_vecs_dev, jnp.asarray(hist), jnp.asarray(mask), K)
        return np.asarray(idx), np.asarray(scores)

    def validate_history(self, ids: np.ndarray) -> None:
        """Raise IndexError for ids the numpy gather would reject (same
        semantics as the single-request path, incl. negative wrapping), so
        the micro-batcher can reject bad requests per-request instead of
        poisoning a whole coalesced batch."""
        self._ensure_started()
        n = self.item_vecs.shape[0]
        a = np.asarray(ids)
        if a.size and (int(a.max()) >= n or int(a.min()) < -n):
            bad = a[(a >= n) | (a < -n)][0]
            raise IndexError(f"index {int(bad)} is out of bounds for axis 0 with size {n}")

    def top_k_for_batch(
        self, histories: List[np.ndarray], ks: List[int],
        max_batch: int = 64,
    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Score many users' histories in ONE batched device call (the
        micro-batching path — serving/batching.py). Per-query semantics match
        top_k_for_user_items' Pallas branch: user vector = f32 mean of history
        rows, retrieve k+|history| then drop history items.

        max_batch: the batcher's configured coalescing cap — threaded in so
        batch-size buckets top out at the real cap (a hardcoded 64 would jit
        a fresh program per ragged size above it)."""
        from plotpointe_tpu.serving.batching import bucket_size

        self._ensure_started()
        if not self.cfg.use_device:
            return [self._topk_numpy(np.asarray(h, np.int32), int(k))
                    for h, k in zip(histories, ks)]
        n = self.item_vecs.shape[0]
        # bucket kk to a multiple of 32 (like the batch dim) — kk is a static
        # jit arg, so every distinct max-history-length in a coalesced batch
        # would otherwise recompile the hot path
        kk_raw = int(max(ks)) + max(len(h) for h in histories)
        kk = min(-(-kk_raw // 32) * 32, n)
        q = np.stack([self.item_vecs[np.asarray(h, np.int32)].mean(axis=0) for h in histories])
        b = len(histories)
        bp = bucket_size(b, max_batch)
        if bp > b:  # pad to a power-of-two bucket so jit caches few shapes
            q = np.concatenate([q, np.repeat(q[-1:], bp - b, axis=0)], axis=0)
        qd = jnp.asarray(q, dtype=self._item_vecs_dev.dtype)
        if self._pallas_topk():
            from plotpointe_tpu.ops.topk_kernel import topk_mips_pallas

            idx, scores = topk_mips_pallas(self._item_vecs_dev, qd, kk,
                                           mode=self.cfg.topk_mode)
        else:
            idx, scores = _topk_scores_batch(self._item_vecs_dev, qd, kk)
        idx_np, sc_np = np.asarray(idx[:b]), np.asarray(scores[:b])
        out = []
        for r, (h, k) in enumerate(zip(histories, ks)):
            keep = ~np.isin(idx_np[r], np.asarray(h) % n)  # match numpy negative-id wrap
            out.append((idx_np[r][keep][: int(k)], sc_np[r][keep][: int(k)]))
        return out

    def _topk_numpy(self, ids: np.ndarray, K: int) -> Tuple[np.ndarray, np.ndarray]:
        item_vecs = self.item_vecs[ids]
        user_vec = item_vecs.mean(axis=0)
        scores = self.item_vecs @ user_vec
        scores[ids] = -1e9
        top_idx = np.argpartition(scores, -K)[-K:]
        order = np.argsort(scores[top_idx])[::-1]
        top_idx = top_idx[order]
        return top_idx, scores[top_idx]
