"""ShardedTrainer.fit() parity with the single-device Trainer.

VERDICT round-1 item 3: the multi-chip harness (train/sharded.py) must run
real epochs — sharded params + Adam + per-epoch sampled eval + best-ckpt
tracking — and reproduce the single-device metrics on the 8-device virtual
CPU mesh. With attention dropout off, the two paths share sampling keys and
loss math, so losses match to float-reassociation tolerance and eval metrics
(computed from gathered tables through the same evaluator) match tightly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from plotpointe_tpu.config import TrainConfig
from plotpointe_tpu.data.splits import build_node_maps, build_splits
from plotpointe_tpu.data.synthetic import synthetic_features, synthetic_interactions
from plotpointe_tpu.graphs.csr import build_bipartite_graph
from plotpointe_tpu.models.gat import GATModel
from plotpointe_tpu.models.lightgcn import LightGCNModel
from plotpointe_tpu.train.sharded import ShardedTrainer
from plotpointe_tpu.train.trainer import Trainer


def _problem(seed=3, n_users=80, n_items=60, n_inter=900, feat_dim=24):
    df = synthetic_interactions(n_users=n_users, n_items=n_items, n_interactions=n_inter, seed=seed)
    u2i, i2i = build_node_maps(df)
    s = build_splits(df, u2i, i2i)
    feats = synthetic_features(s.n_items, feat_dim, seed=seed)
    g = build_bipartite_graph(s.train_u, s.train_i, s.n_users, s.n_items, weight=s.train_w, pad_multiple=64)
    return s, g, feats


@pytest.mark.multidevice
def test_sharded_gat_fit_matches_single_device(mesh8):
    s, g, feats = _problem()
    cfg = TrainConfig(
        hidden_dim=16, layers=2, epochs=3, samples_per_epoch=64,
        eval_neg_k=32, attn_dropout=0.0, seed=11,
    )

    def make():
        return GATModel(
            n_users=s.n_users, n_items=s.n_items, feat_dim=feats.shape[1],
            hidden_dim=16, n_layers=2, attn_dropout=0.0,
        )

    single = Trainer(make(), cfg, g, s, item_feats=feats)
    res_single = single.fit(jax.random.key(cfg.seed))

    sharded = ShardedTrainer(make(), cfg, g, s, item_feats=feats, mesh=mesh8)
    res_sharded = sharded.fit(jax.random.key(cfg.seed))

    for h1, h8 in zip(res_single["history"], res_sharded["history"]):
        np.testing.assert_allclose(h8["loss"], h1["loss"], rtol=2e-4)
    np.testing.assert_allclose(
        res_sharded["best_val_ndcg@20"], res_single["best_val_ndcg@20"], atol=2e-3
    )
    for k, v in res_single["test"].items():
        np.testing.assert_allclose(res_sharded["test"][k], v, atol=2e-3, err_msg=k)

    # exported item embeddings come from the gathered tables
    I1 = single.export_item_embeddings(single.state.best_params)
    I8 = sharded.export_item_embeddings(sharded.state.best_params)
    np.testing.assert_allclose(I8, I1, rtol=5e-3, atol=5e-5)


@pytest.mark.multidevice
def test_sharded_gat_fused_fit_matches_single_device(mesh8):
    """Flagship composition: the fused-Pallas multi-chip step (attn_impl=
    pallas -> make_sharded_gat_step_fused) must reproduce the single-device
    XLA trainer. f32 row gathers for exact comparison (bf16 is the perf
    default on real TPU)."""
    s, g, feats = _problem(seed=7)
    cfg = TrainConfig(
        hidden_dim=16, layers=2, epochs=2, samples_per_epoch=64,
        eval_neg_k=32, attn_dropout=0.0, seed=17,
    )

    single = Trainer(
        GATModel(n_users=s.n_users, n_items=s.n_items, feat_dim=feats.shape[1],
                 hidden_dim=16, n_layers=2, attn_dropout=0.0, attn_impl="xla"),
        cfg, g, s, item_feats=feats,
    )
    res_single = single.fit(jax.random.key(cfg.seed))

    sharded = ShardedTrainer(
        GATModel(n_users=s.n_users, n_items=s.n_items, feat_dim=feats.shape[1],
                 hidden_dim=16, n_layers=2, attn_dropout=0.0, attn_impl="pallas"),
        cfg, g, s, item_feats=feats, mesh=mesh8, fused_hs_dtype=jnp.float32,
    )
    assert sharded._fused, "pallas attn_impl must route to the fused sharded step"
    res_sharded = sharded.fit(jax.random.key(cfg.seed))

    for h1, h8 in zip(res_single["history"], res_sharded["history"]):
        np.testing.assert_allclose(h8["loss"], h1["loss"], rtol=5e-4)
    for k, v in res_single["test"].items():
        np.testing.assert_allclose(res_sharded["test"][k], v, atol=2e-3, err_msg=k)


@pytest.mark.multidevice
def test_sharded_lightgcn_fit_matches_single_device(mesh8):
    s, g, feats = _problem(seed=5)
    cfg = TrainConfig(
        model_family="lightgcn", embed_dim=16, n_prop_layers=2, epochs=3,
        batch_size=8, neg_per_pos=5, eval_neg_k=32, seed=13,
    )

    def make():
        return LightGCNModel(n_users=s.n_users, n_items=s.n_items, embed_dim=16, n_prop_layers=2)

    single = Trainer(make(), cfg, g, s)
    res_single = single.fit(jax.random.key(cfg.seed))

    sharded = ShardedTrainer(make(), cfg, g, s, mesh=mesh8)
    res_sharded = sharded.fit(jax.random.key(cfg.seed))

    for h1, h8 in zip(res_single["history"], res_sharded["history"]):
        np.testing.assert_allclose(h8["loss"], h1["loss"], rtol=2e-4)
    for k, v in res_single["test"].items():
        np.testing.assert_allclose(res_sharded["test"][k], v, atol=2e-3, err_msg=k)


def test_sharded_lightgcn_fused_fit_matches_single_device(mesh8):
    """ShardedTrainer routes to the tile-sharded static-Pallas SpMM step when
    spmm_impl='pallas' — fit() must match the single-device XLA trainer."""
    s, g, feats = _problem(seed=5)
    cfg = TrainConfig(
        model_family="lightgcn", embed_dim=16, n_prop_layers=2, epochs=3,
        batch_size=8, neg_per_pos=5, eval_neg_k=32, seed=13,
    )

    def make(impl):
        return LightGCNModel(n_users=s.n_users, n_items=s.n_items, embed_dim=16,
                             n_prop_layers=2, spmm_impl=impl)

    single = Trainer(make("xla"), cfg, g, s)
    res_single = single.fit(jax.random.key(cfg.seed))

    sharded = ShardedTrainer(make("pallas"), cfg, g, s, mesh=mesh8)
    assert sharded._lg_fused
    res_sharded = sharded.fit(jax.random.key(cfg.seed))

    for h1, h8 in zip(res_single["history"], res_sharded["history"]):
        np.testing.assert_allclose(h8["loss"], h1["loss"], rtol=5e-3)
    for k, v in res_single["test"].items():
        np.testing.assert_allclose(res_sharded["test"][k], v, atol=5e-3, err_msg=k)
