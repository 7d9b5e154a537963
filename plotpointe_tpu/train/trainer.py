"""Training harness: jit'd epoch step, sampled eval, best-by-val checkpointing.

Harness parity with the reference trainers (`train_gat_custom.py:341-377`):
one optimizer step per epoch over `samples_per_epoch` sampled BPR/BCE triples,
full-graph forward, per-epoch val eval, keep-best-by-val-NDCG@20, final test
eval from the best checkpoint, metrics JSON with embedded config. Optimizer
matches torch.optim.Adam(lr, weight_decay=l2): L2 added to the gradient
*before* the Adam moments (optax.add_decayed_weights before scale_by_adam —
NOT decoupled AdamW).

TPU-first: sampling, forward, loss, backward and the optimizer update are one
jitted function; evaluation is chunked MXU matmuls (train/evaluate.py); no
host<->device round-trip inside an epoch.
"""
from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from plotpointe_tpu.config import TrainConfig
from plotpointe_tpu.data.splits import Splits, padded_positives
from plotpointe_tpu.graphs.csr import Graph, symmetric_normalized_weights
from plotpointe_tpu.train.evaluate import sampled_eval
from plotpointe_tpu.train.losses import LOSSES
from plotpointe_tpu.train.sampling import sample_bpr_triples
from plotpointe_tpu.train.checkpoint import save_checkpoint
from plotpointe_tpu.utils.logging import log_event


def make_optimizer(
    lr: float, l2: float, optimizer: str = "adam", warmup_steps: int = 0
) -> optax.GradientTransformation:
    """Reference parity: torch.optim.Adam(lr, weight_decay=l2) — L2 added to
    the gradient BEFORE the Adam moments (`optimizer="adam"`, the default).

    Beyond-parity options for long schedules (the reference only ever takes 20
    optimizer steps, so it never hits this): with coupled L2, once real
    gradients plateau the decay term l2*w dominates and Adam's normalization
    turns it into a ~lr-per-step shrink regardless of |w| — weights collapse
    to zero and all scores tie (docs/RESULTS.md ablations). `optimizer="adamw"`
    decouples the decay (shrink rate lr*l2, proportional to |w|), and
    `warmup_steps > 0` linearly ramps the learning rate from 0.
    """
    if optimizer == "adamw":
        tx = optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(l2),
            optax.scale(-lr),
        )
    elif optimizer == "adam":
        tx = optax.chain(
            optax.add_decayed_weights(l2),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-lr),
        )
    else:
        raise ValueError(f"unknown optimizer {optimizer!r} (expected adam|adamw)")
    if warmup_steps > 0:
        ramp = optax.scale_by_schedule(
            lambda step: jnp.minimum(1.0, (step + 1) / warmup_steps)
        )
        tx = optax.chain(tx, ramp)
    return tx


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    epoch: int = 0
    best_val_ndcg20: float = -1.0
    best_params: Any = None


class Trainer:
    """Drives one model (GAT or LightGCN) through the reference protocol."""

    def __init__(
        self,
        model,
        cfg: TrainConfig,
        graph: Graph,
        splits: Splits,
        item_feats: Optional[np.ndarray] = None,
        max_pos_degree: int = 512,
    ):
        from plotpointe_tpu.ops.segment import resolve_attn_impl

        self.model = model
        self.cfg = cfg
        if resolve_attn_impl(getattr(model, "attn_impl", "xla")) == "pallas" and graph.layout is None:
            graph = graph.with_layout()
        self.graph = graph.to_device()
        self.splits = splits
        self.n_users, self.n_items = splits.n_users, splits.n_items

        feats = item_feats if item_feats is not None else np.zeros((self.n_items, 1), np.float32)
        self.item_feats = jnp.asarray(feats, dtype=jnp.float32)

        pos_table, deg = padded_positives(splits, max_degree=max_pos_degree)
        self.user_pos_padded = jnp.asarray(pos_table)
        self.user_deg = jnp.asarray(deg)
        self.train_users = jnp.asarray(np.flatnonzero(deg > 0).astype(np.int32))

        self.norm_values = None
        self._spmm_op = None
        if getattr(model, "config_dict", lambda: {})().get("model_family") == "lightgcn":
            vals = symmetric_normalized_weights(graph)
            self.norm_values = jnp.asarray(vals)
            spmm_impl = getattr(model, "spmm_impl", "xla")
            # "auto" takes the Pallas operator only at scale: below ~100k
            # edges XLA's segment_sum is already fast and the fused kernels'
            # (remote-)compile latency dominates small runs
            want_pallas = resolve_attn_impl(spmm_impl) == "pallas" and (
                spmm_impl == "pallas" or graph.n_edges >= 100_000
            )
            if want_pallas:
                # static (graph, values) pair: host-align edge weights once,
                # fused streaming kernel fwd + transpose-layout bwd
                from plotpointe_tpu.ops.spmm_kernel import make_spmm

                if self.graph.layout is None:
                    self.graph = graph.with_layout().to_device()
                self._spmm_op = make_spmm(self.graph, np.asarray(vals))

        self.tx = make_optimizer(cfg.lr, cfg.l2, cfg.optimizer, cfg.warmup_steps)
        self._loss_name = cfg.loss

    # -- core jitted step ----------------------------------------------------
    # Big device buffers (graph, features, positives tables) are passed as jit
    # ARGUMENTS, not reached through the static `self`: closure constants are
    # shipped inside the (remote-)compile payload, which blows up at full
    # Amazon scale (the [192k, 512] positives table alone is 400 MB).

    def _train_step(self, params, opt_state, key):
        return self._train_step_jit(
            params, opt_state, key, self.graph, self.item_feats,
            self.train_users, self.user_pos_padded, self.user_deg, self.norm_values,
        )

    @functools.partial(jax.jit, static_argnames=("self",))
    def _train_step_jit(self, params, opt_state, key, graph, item_feats,
                        train_users, user_pos, user_deg, norm_values):
        k_sample, k_drop = jax.random.split(key)
        u, i, j = sample_bpr_triples(
            k_sample,
            train_users,
            user_pos,
            user_deg,
            self.n_items,
            self.cfg.samples_per_epoch,
        )

        def loss_fn(p):
            z = self.model.apply(
                p,
                item_feats,
                graph,
                **({"norm_values": norm_values, "spmm_op": self._spmm_op} if norm_values is not None else {}),
                **({"train": True, "rng": k_drop} if norm_values is None else {}),
            )
            U, I = z[: self.n_users], z[self.n_users :]
            pos = jnp.sum(U[u] * I[i], axis=-1)
            neg = jnp.sum(U[u] * I[j], axis=-1)
            return LOSSES[self._loss_name](pos, neg)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _lightgcn_batch_step(self, params, opt_state, perm, s, key):
        if not hasattr(self, "_train_u_dev"):
            self._train_u_dev = jnp.asarray(self.splits.train_u)
            self._train_i_dev = jnp.asarray(self.splits.train_i)
        return self._lightgcn_batch_step_jit(
            params, opt_state, perm, s, key, self.graph, self.item_feats,
            self._train_u_dev, self._train_i_dev, self.user_pos_padded,
            self.user_deg, self.norm_values,
        )

    @functools.partial(jax.jit, static_argnames=("self",))
    def _lightgcn_batch_step_jit(self, params, opt_state, perm, s, key, graph,
                                 item_feats, train_u, train_i, user_pos, user_deg,
                                 norm_values):
        """One BPR mini-batch step, LightGCN protocol parity
        (train_lightgcn.py:160-179,313-336): batch of `batch_size` positives
        drawn from the shuffled train interactions, `neg_per_pos` exact
        negatives each, propagation recomputed inside the step."""
        bs = self.cfg.batch_size
        npp = self.cfg.neg_per_pos
        idx = jax.lax.dynamic_slice_in_dim(perm, s * bs, bs)
        u = train_u[idx]
        i = train_i[idx]

        # exact negatives: uniform over the complement of each user's positives
        from plotpointe_tpu.train.sampling import _rank_to_item, _uniform_ranks

        pos_rows = user_pos[u]  # [bs, P] sorted
        deg = user_deg[u]
        r = _uniform_ranks(key, (bs, npp), (self.n_items - deg)[:, None] * jnp.ones((1, npp), jnp.int32))
        j = _rank_to_item(r, pos_rows)  # [bs, npp]

        def loss_fn(p):
            z = self.model.apply(p, item_feats, graph, norm_values=norm_values,
                                 spmm_op=self._spmm_op)
            U, I = z[: self.n_users], z[self.n_users :]
            pos = jnp.sum(U[u] * I[i], axis=-1)  # [bs]
            neg = jnp.sum(U[u][:, None, :] * I[j], axis=-1)  # [bs, npp]
            return LOSSES[self._loss_name](
                jnp.repeat(pos[:, None], npp, axis=1).reshape(-1), neg.reshape(-1)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _run_lightgcn_epoch(self, state: "TrainState", key) -> float:
        if not hasattr(self, "_train_u_dev"):
            self._train_u_dev = jnp.asarray(self.splits.train_u)
            self._train_i_dev = jnp.asarray(self.splits.train_i)
        t = len(self.splits.train_u)
        bs = self.cfg.batch_size
        n_steps = max(1, t // bs)
        perm = jax.random.permutation(key, t)
        if t < bs:  # tiny datasets: wrap around so the slice is full
            perm = jnp.concatenate([perm] * ((bs + t - 1) // t))[: bs]
            n_steps = 1
        tot = jnp.float32(0.0)  # device-side accumulation: batches pipeline, one sync/epoch
        for s in range(n_steps):
            state.params, state.opt_state, loss = self._lightgcn_batch_step(
                state.params, state.opt_state, perm, jnp.int32(s), jax.random.fold_in(key, s)
            )
            tot = tot + loss
        return float(tot) / n_steps

    def _forward_eval(self, params):
        return self._forward_eval_jit(params, self.graph, self.item_feats, self.norm_values)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _forward_eval_jit(self, params, graph, item_feats, norm_values):
        z = self.model.apply(
            params,
            item_feats,
            graph,
            **({"norm_values": norm_values, "spmm_op": self._spmm_op} if norm_values is not None else {}),
        )
        return z[: self.n_users], z[self.n_users :]

    def evaluate(self, params, eval_u: np.ndarray, eval_i: np.ndarray, key) -> Dict[str, float]:
        U, I = self._forward_eval(params)
        return sampled_eval(
            U,
            I,
            eval_u,
            eval_i,
            self.user_pos_padded,
            self.user_deg,
            key,
            neg_k=self.cfg.eval_neg_k,
            chunk=self.cfg.eval_chunk,
        )

    # -- fit hooks (overridden by train.sharded.ShardedTrainer) --------------

    def _init_state(self, k_init) -> "TrainState":
        params = self.model.init(k_init)
        opt_state = self.tx.init(params)
        return TrainState(params=params, opt_state=opt_state, best_params=params)

    def _epoch(self, state: "TrainState", k_epoch) -> float:
        if self.norm_values is not None:
            # LightGCN: mini-batch BPR over all positives (reference protocol)
            return self._run_lightgcn_epoch(state, k_epoch)
        # reference protocol is steps_per_epoch=1 (one backward per epoch,
        # train_gat_custom.py:341-363); >1 is a beyond-parity option that
        # resamples fresh triples per step
        tot = 0.0
        for sstep in range(max(1, self.cfg.steps_per_epoch)):
            state.params, state.opt_state, loss = self._train_step(
                state.params, state.opt_state, jax.random.fold_in(k_epoch, sstep)
            )
            tot += float(loss)
        return tot / max(1, self.cfg.steps_per_epoch)

    def _host_params(self, params):
        """Params as saved in checkpoints (sharded trainers gather + unpad)."""
        return params

    # -- fit -----------------------------------------------------------------

    def fit(
        self,
        key: Optional[jax.Array] = None,
        checkpoint_path: Optional[str] = None,
        resume_path: Optional[str] = None,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        key = key if key is not None else jax.random.key(cfg.seed)
        k_init, k_train, k_eval = jax.random.split(key, 3)

        state = self._init_state(k_init)
        start_epoch = 1

        if resume_path is not None and Path(resume_path).exists():
            from plotpointe_tpu.train.checkpoint import load_resume_state

            params_t, opt_t = state.params, state.opt_state
            state.params, state.opt_state, state.best_params, meta = load_resume_state(
                resume_path, params_t, opt_t
            )
            start_epoch = int(meta["epoch"]) + 1
            state.best_val_ndcg20 = float(meta["best_val_ndcg20"])
            state.epoch = int(meta["epoch"])

        run_id = cfg.run_id or f"{cfg.model_family}_d{cfg.hidden_dim}_{int(time.time())}"
        if cfg.structured_logs:
            log_event("run_start", run_id=run_id, model_family=cfg.model_family, config=cfg.to_dict(),
                      resumed_from_epoch=start_epoch - 1 if start_epoch > 1 else None)

        history = []
        val_metrics: Dict[str, float] = {}
        t_start = time.perf_counter()
        for epoch in range(start_epoch, cfg.epochs + 1):
            t0 = time.perf_counter()
            k_epoch = jax.random.fold_in(k_train, epoch)
            loss = self._epoch(state, k_epoch)
            step_time = time.perf_counter() - t0

            t1 = time.perf_counter()
            val_metrics = (
                self.evaluate(state.params, self.splits.val_u, self.splits.val_i, jax.random.fold_in(k_eval, epoch))
                if len(self.splits.val_u)
                else {}
            )
            eval_time = time.perf_counter() - t1
            history.append({"epoch": epoch, "loss": loss, "step_time_s": step_time, "eval_time_s": eval_time,
                            **{f"val_{k}": v for k, v in val_metrics.items()}})
            if cfg.structured_logs:
                log_event("epoch_end", run_id=run_id, epoch=epoch, loss=loss, val=val_metrics)

            ndcg20 = val_metrics.get("ndcg@20", 0.0)
            if ndcg20 > state.best_val_ndcg20:
                state.best_val_ndcg20 = ndcg20
                state.best_params = state.params
                if checkpoint_path:
                    save_checkpoint(checkpoint_path, self._host_params(state.best_params),
                                    self.model.config_dict() | {"train_config": cfg.to_dict()})
            state.epoch = epoch
            if resume_path is not None:
                from plotpointe_tpu.train.checkpoint import save_resume_state

                save_resume_state(
                    resume_path, state.params, state.opt_state, state.best_params,
                    {"epoch": epoch, "best_val_ndcg20": float(state.best_val_ndcg20)},
                )

        # no-val datasets (all users have exactly 2 interactions): best = last
        if state.best_val_ndcg20 < 0:
            state.best_params = state.params

        test_metrics = self.evaluate(
            state.best_params, self.splits.test_u, self.splits.test_i, jax.random.fold_in(k_eval, 10_000)
        )
        wall = time.perf_counter() - t_start

        results = {
            "best_val_ndcg@20": float(state.best_val_ndcg20),
            "val": val_metrics,
            "test": test_metrics,
            "config": cfg.to_dict() | self.model.config_dict(),
            "history": history,
            "wall_time_s": wall,
            "run_id": run_id,
            "notes": f"one-backward-per-epoch, {cfg.samples_per_epoch} sampled triples, loss={cfg.loss}",
        }
        if cfg.structured_logs:
            log_event("run_complete", run_id=run_id, best_val_ndcg20=results["best_val_ndcg@20"], test=test_metrics)
        self.state = state
        return results

    def export_item_embeddings(self, params) -> np.ndarray:
        """Item-side embeddings from a full forward (tools/export_item_embeddings.py:139-150)."""
        _, I = self._forward_eval(params)
        return np.asarray(I, dtype=np.float32)
