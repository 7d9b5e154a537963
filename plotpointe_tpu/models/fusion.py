"""Multimodal fusion MLP trained with InfoNCE contrastive loss.

Parity with `embeddings/fuse_modal.py:18-72`:
  FusionMLP: concat(txt 384 + img 512) -> Linear 256 -> ReLU -> Dropout 0.1
             -> Linear 128; plus per-modality projection heads txt_proj /
             img_proj into the fused space.
  Loss: symmetric InfoNCE between the fused vector and the PROJECTED
  modalities (`fuse_modal.py:192-197`: txt_proj(batch_txt), img_proj(batch_img)
  both in output_dim space): sim(fused_n, proj_n)/T with in-batch negatives,
  cross-entropy on the diagonal, averaged over the two modalities.
  Inference over all items uses the mean image embedding as the fallback for
  items without images (`fuse_modal.py:216-242`), vectorized here with a
  scatter instead of the reference's per-element Python loop.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from plotpointe_tpu.config import FusionConfig


def _linear_init(key, fan_in, fan_out, dtype=jnp.float32):
    a = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), dtype, minval=-a, maxval=a),
        "b": jax.random.uniform(kb, (fan_out,), dtype, minval=-a, maxval=a),
    }


@dataclass(frozen=True)
class FusionModel:
    cfg: FusionConfig

    def init(self, key: jax.Array) -> Dict[str, Any]:
        c = self.cfg
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "mlp1": _linear_init(k1, c.text_dim + c.img_dim, c.hidden_dim),
            "mlp2": _linear_init(k2, c.hidden_dim, c.output_dim),
            "txt_proj": _linear_init(k3, c.text_dim, c.output_dim),
            "img_proj": _linear_init(k4, c.img_dim, c.output_dim),
        }

    def apply(
        self,
        params: Dict[str, Any],
        txt: jax.Array,
        img: jax.Array,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        x = jnp.concatenate([txt, img], axis=-1)
        h = x @ params["mlp1"]["w"] + params["mlp1"]["b"]
        h = jnp.maximum(h, 0.0)
        if train and rng is not None and self.cfg.dropout > 0:
            keep = jax.random.bernoulli(rng, 1.0 - self.cfg.dropout, h.shape)
            h = jnp.where(keep, h / (1.0 - self.cfg.dropout), 0.0)
        return h @ params["mlp2"]["w"] + params["mlp2"]["b"]


def infonce_fusion_loss(
    fused: jax.Array, txt: jax.Array, img: jax.Array, temperature: float = 0.07
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Symmetric InfoNCE (fuse_modal.py:39-72). Returns (loss, loss_txt, loss_img)."""

    def _norm(x):
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    fz, tz, iz = _norm(fused), _norm(txt), _norm(img)
    n = fused.shape[0]
    labels = jnp.arange(n)

    def _xent(sim):
        logz = jax.nn.logsumexp(sim, axis=-1)
        return jnp.mean(logz - sim[jnp.arange(n), labels])

    sim_t = jnp.dot(fz, tz.T, preferred_element_type=jnp.float32) / temperature
    sim_i = jnp.dot(fz, iz.T, preferred_element_type=jnp.float32) / temperature
    lt, li = _xent(sim_t), _xent(sim_i)
    return (lt + li) / 2.0, lt, li


def train_fusion(
    txt: np.ndarray,
    img_aligned: np.ndarray,
    img_row_for_item: np.ndarray,
    cfg: Optional[FusionConfig] = None,
    key: Optional[jax.Array] = None,
) -> Tuple[Dict[str, Any], Dict[str, float]]:
    """Train the fusion MLP on items that have both modalities.

    txt: [n_items, text_dim] catalog-ordered text embeddings.
    img_aligned: [n_img, img_dim] image embeddings.
    img_row_for_item: [n_items] int, row into img_aligned or -1 if no image
      (the reference's asin->idx alignment, fuse_modal.py:144-156).
    """
    import optax

    cfg = cfg or FusionConfig(text_dim=txt.shape[1], img_dim=img_aligned.shape[1])
    key = key if key is not None else jax.random.key(cfg.seed)
    model = FusionModel(cfg)
    k_init, k_train = jax.random.split(key)
    params = model.init(k_init)

    has_img = np.flatnonzero(img_row_for_item >= 0)
    txt_j = jnp.asarray(txt[has_img])
    img_j = jnp.asarray(img_aligned[img_row_for_item[has_img]])
    n = len(has_img)
    bs = min(cfg.batch_size, n)

    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, txt_all, img_all, perm, s, rng):
        # batch slicing happens INSIDE jit with a traced start index — a
        # python-int start would bake into the program and retrace per step
        # (catastrophic under remote compilation). The modality matrices are
        # explicit ARGUMENTS: closing over them bakes hundreds of MB of
        # constants into the program (rejected by remote compilation, and
        # wasteful everywhere).
        idx = jax.lax.dynamic_slice_in_dim(perm, s * bs, bs)
        tb, ib = txt_all[idx], img_all[idx]

        def loss_fn(p):
            fused = model.apply(p, tb, ib, train=True, rng=rng)
            tproj = tb @ p["txt_proj"]["w"] + p["txt_proj"]["b"]
            iproj = ib @ p["img_proj"]["w"] + p["img_proj"]["b"]
            loss, lt, li = infonce_fusion_loss(fused, tproj, iproj, cfg.temperature)
            return loss, (lt, li)

        (loss, (lt, li)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, lt, li

    history = {}
    steps_per_epoch = max(1, n // bs)
    for epoch in range(cfg.epochs):
        k_epoch = jax.random.fold_in(k_train, epoch)
        perm = jax.random.permutation(jax.random.fold_in(k_epoch, 0), n)
        tot = 0.0
        for s in range(steps_per_epoch):
            rng = jax.random.fold_in(k_epoch, s + 1)
            params, opt_state, loss, lt, li = step(params, opt_state, txt_j, img_j, perm, jnp.int32(s), rng)
            tot += float(loss)
        history[f"epoch_{epoch + 1}_loss"] = tot / steps_per_epoch
    return params, history


def fuse_all_items(
    params: Dict[str, Any],
    txt: np.ndarray,
    img_aligned: np.ndarray,
    img_row_for_item: np.ndarray,
    cfg: FusionConfig,
    batch_size: int = 8192,
) -> np.ndarray:
    """Inference over ALL items with mean-image fallback, L2-normalized output
    (fuse_modal.py:216-242, vectorized)."""
    model = FusionModel(cfg)
    mean_img = img_aligned.mean(axis=0) if len(img_aligned) else np.zeros(cfg.img_dim, np.float32)
    # vectorized fallback: gather real rows where present, mean vector otherwise
    img_full = np.where(
        (img_row_for_item >= 0)[:, None],
        img_aligned[np.clip(img_row_for_item, 0, max(len(img_aligned) - 1, 0))],
        mean_img[None, :],
    ).astype(np.float32)

    apply = jax.jit(lambda t, i: model.apply(params, t, i, train=False))
    outs = []
    for s in range(0, len(txt), batch_size):
        fused = apply(jnp.asarray(txt[s : s + batch_size]), jnp.asarray(img_full[s : s + batch_size]))
        fused = fused / (jnp.linalg.norm(fused, axis=-1, keepdims=True) + 1e-8)
        outs.append(np.asarray(fused))
    return np.concatenate(outs, axis=0) if outs else np.zeros((0, cfg.output_dim), np.float32)
