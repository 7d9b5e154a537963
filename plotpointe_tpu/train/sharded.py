"""Multi-chip training harness: the Trainer protocol over a device mesh.

Integrates the SPMD primitives (parallel/spmd.py: row-sharded user/item
tables, edge-sharded attention/propagation, batch-sharded triples) into the
full reference training protocol (epochs, per-epoch sampled eval,
best-by-val-NDCG@20 checkpointing, mid-training resume) that
`train/trainer.py::Trainer` drives on one chip. The reference has no analog —
every reference trainer is one process on one GPU
(`scripts/train_gat_pyg.py:242`, SURVEY.md section 2.3); this class is the
framework's "distributed training the reference lacks".

Design:
  - params: big embedding tables row-sharded over the mesh's data axis
    (GAT: the [n_users, H] table; LightGCN: both tables); small params
    replicated. The optimizer state inherits the param shardings through jit,
    so Adam moments for the tables are also 1/n per chip and the update runs
    shard-local with zero collectives.
  - one train step = sample triples (replicated, same order-statistic
    sampler and PRNG stream as the single-device path) -> sharded
    grad step (collectives ride ICI inside shard_map) -> sharded Adam.
    When the kernel impl resolves to pallas, the step is the FUSED
    composition: tile-sharded attention_v3 fwd+bwd (GAT) or the
    tile-sharded static SpMM operator (LightGCN), psum overlay outputs.
  - eval: on device under GSPMD jit over the same mesh — tables stay
    row-sharded (XLA inserts the gathers), metric sums reduce on device,
    ONE host sync per eval; epoch losses accumulate on device too.
  - checkpointing: tables host-gather only when a new best is saved.

With attention dropout disabled, fit() is numerically equivalent to the
single-device Trainer (same sampling keys, same loss/grad math up to float
reassociation) — asserted by tests/test_sharded_trainer.py on the 8-device
CPU mesh. With dropout on, the sharded path draws its own replicated-per-edge
mask stream (shapes differ from the single-device stream once edges are
re-padded to divide the mesh).
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plotpointe_tpu.config import TrainConfig
from plotpointe_tpu.data.splits import Splits
from plotpointe_tpu.graphs.csr import Graph
from plotpointe_tpu.parallel.mesh import make_mesh
from plotpointe_tpu.parallel.multihost import host_gather, is_multiprocess, put_replicated, put_sharded
from plotpointe_tpu.parallel.sharded_table import device_put_row_sharded
from plotpointe_tpu.parallel.spmd import (
    make_sharded_gat_step,
    make_sharded_gat_step_fused,
    make_sharded_lightgcn_step,
    make_sharded_spmm,
    shard_graph_by_edges,
    shard_layout_by_tiles,
)
from plotpointe_tpu.train.sampling import _rank_to_item, _uniform_ranks, sample_bpr_triples
from plotpointe_tpu.train.trainer import Trainer, TrainState


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _auto_tile_sizes(n_nodes: int, n_edges: int, n_shards: int) -> tuple:
    """Pick (nb, eb) for the tile-sharded fused layout: flagship (256, 1024)
    at Amazon scale; shrink for tiny graphs so every shard owns >= 2 tiles
    (otherwise most devices sit idle and padding dominates)."""
    nb = 256
    while nb > 8 and (n_nodes + 1 + nb - 1) // nb < 2 * n_shards:
        nb //= 2
    nb = max(nb, 8)
    eb = 1024 if n_edges >= 100_000 else 128
    return nb, eb


class ShardedTrainer(Trainer):
    """Trainer over an n-device mesh. Same fit()/evaluate()/results contract."""

    def __init__(
        self,
        model,
        cfg: TrainConfig,
        graph: Graph,
        splits: Splits,
        item_feats: Optional[np.ndarray] = None,
        mesh: Optional[Mesh] = None,
        max_pos_degree: int = 512,
        axis: str = "data",
        fused_hs_dtype=None,  # None -> kernel default (bf16 row gather); tests pass f32 for exact parity
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis = axis
        self.n_shards = int(self.mesh.shape[axis])
        graph = shard_graph_by_edges(graph, self.n_shards)
        super().__init__(model, cfg, graph, splits, item_feats=item_feats, max_pos_degree=max_pos_degree)

        espec = NamedSharding(self.mesh, P(axis))
        self._mp = is_multiprocess()  # mesh spans hosts (DCN) -> per-process placement
        if self._mp:
            self._src = put_sharded(np.asarray(self.graph.src), self.mesh, P(axis))
            self._dst = put_sharded(np.asarray(self.graph.dst), self.mesh, P(axis))
        else:
            self._src = jax.device_put(self.graph.src, espec)
            self._dst = jax.device_put(self.graph.dst, espec)
        self._family = model.config_dict().get("model_family", "gat")

        # on-device eval (SURVEY section 2.3 "all-gather for eval scoring"):
        # eval runs under GSPMD jit over the SAME mesh — row-sharded tables
        # stay on device (XLA inserts the gathers), metric sums psum across
        # chips inside the jit, ONE host sync per eval. The forward uses the
        # XLA golden impl (Pallas kernels need shard_map, not GSPMD).
        rep = NamedSharding(self.mesh, P())
        import dataclasses as _dc

        if self._mp:
            _rep_put = lambda t: jax.tree.map(  # noqa: E731
                lambda a: put_replicated(np.asarray(a), self.mesh), t)
        else:
            _rep_put = lambda t: jax.device_put(t, rep)  # noqa: E731
        self._eval_graph = _rep_put(self.graph)
        self._eval_feats = _rep_put(self.item_feats)
        self._eval_pos_tab = _rep_put(self.user_pos_padded)
        self._eval_deg = _rep_put(self.user_deg)
        if self._mp:  # triples/feats enter the global step from every host
            self.item_feats = self._eval_feats
            self.user_pos_padded = self._eval_pos_tab
            self.user_deg = self._eval_deg
            self.train_users = _rep_put(self.train_users)
        impl_field = "spmm_impl" if self._family == "lightgcn" else "attn_impl"
        self._eval_model = _dc.replace(model, **{impl_field: "xla"})
        self._eval_norm = None

        if self._family == "lightgcn":
            self._eval_norm = _rep_put(self.norm_values)
            vals_np = np.asarray(self.norm_values)
            if self._mp:
                self.norm_values = put_sharded(vals_np, self.mesh, P(axis))
            else:
                self.norm_values = jax.device_put(self.norm_values, espec)
            from plotpointe_tpu.ops.segment import resolve_attn_impl

            spmm_impl = getattr(model, "spmm_impl", "xla")
            # same scale-aware auto rule as Trainer: fused kernels only pay
            # off (vs their compile latency) at >=100k edges
            self._lg_fused = resolve_attn_impl(spmm_impl) == "pallas" and (
                spmm_impl == "pallas" or self.graph.n_edges >= 100_000
            )
            if self._lg_fused:
                # flagship composition for LightGCN: tile-sharded static
                # Pallas SpMM (+ psum overlay) inside a GSPMD step
                nb, eb = _auto_tile_sizes(self.graph.n_nodes, self.graph.n_edges, self.n_shards)
                self._spmm_sh = make_sharded_spmm(
                    self.mesh, graph, vals_np, axis=axis, nb=nb, eb=eb
                )
                self._sh_step = self._make_lg_fused_step()
            else:
                self._sh_step = make_sharded_lightgcn_step(
                    model, cfg.loss, self.mesh, self.n_users, self.n_items, axis=axis
                )
            if self._mp:
                self._train_u_dev = put_replicated(np.asarray(self.splits.train_u), self.mesh)
                self._train_i_dev = put_replicated(np.asarray(self.splits.train_i), self.mesh)
            else:
                self._train_u_dev = jnp.asarray(self.splits.train_u)
                self._train_i_dev = jnp.asarray(self.splits.train_i)
            pairs = cfg.batch_size * cfg.neg_per_pos
            if pairs % self.n_shards:
                raise ValueError(
                    f"batch_size*neg_per_pos ({pairs}) must divide the mesh ({self.n_shards} shards)"
                )
        else:
            from plotpointe_tpu.ops.segment import resolve_attn_impl

            impl = resolve_attn_impl(getattr(model, "attn_impl", "xla"))
            self._fused = impl == "pallas" and getattr(model, "heads", 1) == 1
            if self._fused:
                # flagship composition: fused Pallas attention (fwd+bwd) per
                # device over its destination-tile shard + psum overlay
                nb, eb = _auto_tile_sizes(self.graph.n_nodes, self.graph.n_edges, self.n_shards)
                stacked = shard_layout_by_tiles(graph, self.n_shards, nb=nb, eb=eb)
                kw = {} if fused_hs_dtype is None else {"hs_dtype": fused_hs_dtype}
                self._sh_step = make_sharded_gat_step_fused(
                    model, cfg.loss, self.mesh, self.n_users, self.n_items, stacked,
                    axis=axis, dropout_rate=getattr(model, "attn_dropout", 0.0), **kw,
                )
            else:
                self._sh_step = make_sharded_gat_step(
                    model, cfg.loss, self.mesh, self.n_users, self.n_items, axis=axis
                )
                if self._mp:
                    self._ones_masks = put_sharded(
                        np.ones((model.n_layers, self.graph.n_padded, model.heads), np.float32),
                        self.mesh, P(None, axis),
                    )
                else:
                    self._ones_masks = jnp.ones(
                        (model.n_layers, self.graph.n_padded, model.heads), jnp.float32
                    )
            self._samples = _round_up(cfg.samples_per_epoch, self.n_shards)

    # -- param placement ------------------------------------------------------

    def _shard_params(self, params):
        out = dict(params)
        out["user_emb"] = device_put_row_sharded(params["user_emb"], self.mesh, self.axis)
        if self._family == "lightgcn":
            out["item_emb"] = device_put_row_sharded(params["item_emb"], self.mesh, self.axis)
        else:
            rep = NamedSharding(self.mesh, P())
            out["item_proj"] = jax.device_put(params["item_proj"], rep)
            out["layers"] = jax.device_put(params["layers"], rep)
        return out

    def _init_state(self, k_init) -> TrainState:
        params = self._shard_params(self.model.init(k_init))
        opt_state = jax.jit(self.tx.init)(params)  # jit propagates param shardings
        return TrainState(params=params, opt_state=opt_state, best_params=params)

    def _host_params(self, params):
        """Gather + strip table pad rows -> checkpoint-portable pytree.
        Multi-process: row-sharded tables span hosts, so gather via
        process_allgather instead of np.asarray."""
        p = {k: jax.tree.map(host_gather, v) for k, v in params.items()}
        p["user_emb"] = p["user_emb"][: self.n_users]
        if "item_emb" in p:
            p["item_emb"] = p["item_emb"][: self.n_items]
        return p

    # -- sharded step plumbing -------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self",))
    def _apply_updates(self, params, opt_state, grads):
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def _dropout_masks(self, k_drop):
        rate = getattr(self.model, "attn_dropout", 0.0)
        if rate <= 0.0:
            return self._ones_masks
        shape = self._ones_masks.shape[1:]
        masks = [
            jnp.where(
                jax.random.bernoulli(jax.random.fold_in(k_drop, li), 1.0 - rate, shape),
                1.0 / (1.0 - rate),
                0.0,
            )
            for li in range(self.model.n_layers)
        ]
        return jnp.stack(masks)

    def _epoch(self, state: TrainState, k_epoch) -> float:
        if self._family == "lightgcn":
            return self._lightgcn_sharded_epoch(state, k_epoch)
        tot = jnp.float32(0.0)  # device-side accumulation: steps pipeline, one sync/epoch
        for sstep in range(max(1, self.cfg.steps_per_epoch)):
            # identical key derivation to Trainer._train_step for parity
            k_sample, k_drop = jax.random.split(jax.random.fold_in(k_epoch, sstep))
            u, i, j = sample_bpr_triples(
                k_sample, self.train_users, self.user_pos_padded, self.user_deg,
                self.n_items, self._samples,
            )
            if self._fused:
                # dropout masks are drawn in-kernel per device from k_drop
                grads, loss = self._sh_step(state.params, self.item_feats, k_drop, u, i, j)
            else:
                masks = self._dropout_masks(k_drop)
                grads, loss = self._sh_step(
                    state.params, self.item_feats, self._src, self._dst, masks, u, i, j
                )
            state.params, state.opt_state = self._apply_updates(state.params, state.opt_state, grads)
            tot = tot + loss
        return float(tot) / max(1, self.cfg.steps_per_epoch)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _lightgcn_batch_triples(self, perm, s, key):
        """Same batch/negative draw as Trainer._lightgcn_batch_step, flattened
        to (u, i, j) pairs (identical loss: mean over bs*npp elements)."""
        bs, npp = self.cfg.batch_size, self.cfg.neg_per_pos
        idx = jax.lax.dynamic_slice_in_dim(perm, s * bs, bs)
        u = self._train_u_dev[idx]
        i = self._train_i_dev[idx]
        pos_rows = self.user_pos_padded[u]
        deg = self.user_deg[u]
        r = _uniform_ranks(key, (bs, npp), (self.n_items - deg)[:, None] * jnp.ones((1, npp), jnp.int32))
        j = _rank_to_item(r, pos_rows)
        return jnp.repeat(u, npp), jnp.repeat(i, npp), j.reshape(-1)

    def _make_lg_fused_step(self):
        """GSPMD LightGCN step over the sharded static-SpMM operator: tables
        stay row-sharded (XLA inserts the gathers / grad scatters), each
        propagation round runs the tile-sharded Pallas kernel + psum overlay."""
        from plotpointe_tpu.train.losses import LOSSES

        k_layers = int(self.model.n_prop_layers)
        loss_fn_elem = LOSSES[self.cfg.loss]
        n_u, n_i = self.n_users, self.n_items
        spmm_sh = self._spmm_sh

        @jax.jit
        def step(params, u, i, j):
            def loss_fn(p):
                x = jnp.concatenate(
                    [p["user_emb"][:n_u], p["item_emb"][:n_i]], axis=0
                )
                acc = x
                out = x
                for _ in range(k_layers):
                    out = spmm_sh(out)
                    acc = acc + out
                acc = acc / (k_layers + 1)
                U, I = acc[:n_u], acc[n_u:]
                pos = jnp.sum(U[u] * I[i], axis=-1)
                neg = jnp.sum(U[u] * I[j], axis=-1)
                return loss_fn_elem(pos, neg)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            return grads, loss

        return step

    def _lightgcn_sharded_epoch(self, state: TrainState, k_epoch) -> float:
        t = len(self.splits.train_u)
        bs = self.cfg.batch_size
        n_steps = max(1, t // bs)
        perm = jax.random.permutation(k_epoch, t)
        if t < bs:  # tiny datasets: wrap around so the slice is full
            perm = jnp.concatenate([perm] * ((bs + t - 1) // t))[:bs]
            n_steps = 1
        tot = jnp.float32(0.0)  # device-side accumulation, one sync/epoch
        for s in range(n_steps):
            u, i, j = self._lightgcn_batch_triples(perm, jnp.int32(s), jax.random.fold_in(k_epoch, s))
            if self._lg_fused:
                grads, loss = self._sh_step(state.params, u, i, j)
            else:
                grads, loss = self._sh_step(
                    state.params, self.norm_values, self._src, self._dst, u, i, j
                )
            state.params, state.opt_state = self._apply_updates(state.params, state.opt_state, grads)
            tot = tot + loss
        return float(tot) / n_steps

    # -- eval: on-device over the mesh; export: gather once at the end ---------

    @functools.partial(jax.jit, static_argnames=("self",))
    def _forward_eval_dev(self, params):
        """GSPMD forward with the row-sharded tables left in place. Tables are
        zero-padded to divide the mesh; slice back to logical rows so graph
        node ids (items offset by n_users) stay aligned."""
        p = dict(params)
        p["user_emb"] = p["user_emb"][: self.n_users]
        if "item_emb" in p:
            p["item_emb"] = p["item_emb"][: self.n_items]
        kw = {"norm_values": self._eval_norm} if self._family == "lightgcn" else {}
        z = self._eval_model.apply(p, self._eval_feats, self._eval_graph, **kw)
        return z[: self.n_users], z[self.n_users :]

    def evaluate(self, params, eval_u, eval_i, key):
        from plotpointe_tpu.train.evaluate import sampled_eval

        U, I = self._forward_eval_dev(params)
        return sampled_eval(
            U, I, eval_u, eval_i, self._eval_pos_tab, self._eval_deg, key,
            neg_k=self.cfg.eval_neg_k, chunk=self.cfg.eval_chunk,
        )

    def export_item_embeddings(self, params) -> np.ndarray:
        return super().export_item_embeddings(self._host_params(params))
