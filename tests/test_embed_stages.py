"""Embedding pipeline stages: text/image/fusion artifact contracts, chunk
sharding + merge, interacted-subset alignment, encoder towers."""
import numpy as np
import pytest

import jax

from plotpointe_tpu.data.splits import build_node_maps
from plotpointe_tpu.data.subset import build_interacted_subset
from plotpointe_tpu.data.synthetic import synthetic_catalog, synthetic_interactions
from plotpointe_tpu.models.embed_stages import (
    compose_item_text,
    embed_image_stage,
    embed_text_stage,
    fuse_stage,
    merge_image_chunks,
)
from plotpointe_tpu.utils.artifacts import ArtifactStore


@pytest.fixture(scope="module")
def staged(tmp_path_factory):
    d = tmp_path_factory.mktemp("staged")
    store = ArtifactStore()
    inter = synthetic_interactions(n_users=80, n_items=60, n_interactions=1200, seed=5)
    items = synthetic_catalog(inter, n_extra_items=20, seed=5)
    store.save_parquet(inter, f"{d}/interactions.parquet")
    store.save_parquet(items, f"{d}/items.parquet")
    return str(d), inter, items


def test_compose_item_text(staged):
    _, _, items = staged
    texts = compose_item_text(items)
    assert len(texts) == len(items)
    assert "Brand:" in texts[0]


def test_text_stage_contract(staged):
    d, _, items = staged
    emb, meta = embed_text_stage(items, d)
    assert emb.shape == (len(items), 384)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    store = ArtifactStore()
    assert store.exists(f"{d}/txt.npy") and store.exists(f"{d}/txt_meta.json")
    # deterministic: same inputs -> same embeddings
    emb2, _ = embed_text_stage(items, d)
    np.testing.assert_array_equal(emb, emb2)


def test_image_chunks_and_merge(staged):
    d, _, items = staged
    n_img = items["image_url"].notna().sum()
    half = n_img // 2
    e0, m0 = embed_image_stage(items, d, chunk_start=0, chunk_end=half, chunk_id=0)
    e1, m1 = embed_image_stage(items, d, chunk_start=half, chunk_end=None, chunk_id=1)
    assert m0["n_images"] + m1["n_images"] == n_img
    emb, img_items = merge_image_chunks(d, 2)
    assert emb.shape[0] == n_img
    assert len(img_items) == n_img


def test_fuse_stage_end_to_end(staged):
    d, _, items = staged
    # needs txt.npy + img.npy + img_items.parquet in the prefix
    embed_text_stage(items, d)
    embed_image_stage(items, d)
    from plotpointe_tpu.config import FusionConfig

    fused, cfg_out = fuse_stage(
        d, cfg=FusionConfig(text_dim=384, img_dim=512, output_dim=16, hidden_dim=32, epochs=2, batch_size=32)
    )
    assert fused.shape == (len(items), 16)
    np.testing.assert_allclose(np.linalg.norm(fused, axis=1), 1.0, atol=1e-4)
    assert cfg_out["n_with_images"] == items["image_url"].notna().sum()


def test_interacted_subset_alignment(staged):
    d, inter, items = staged
    full = np.arange(len(items), dtype=np.float32)[:, None] * np.ones((1, 4), np.float32)
    subset, asins = build_interacted_subset(full, items, inter, out_prefix=d, feature_name="txt")
    _, item_to_idx = build_node_maps(inter)
    assert subset.shape == (len(item_to_idx), 4)
    catalog_row = {a: r for r, a in enumerate(items["asin"])}
    for asin, idx in list(item_to_idx.items())[:20]:
        assert subset[idx, 0] == catalog_row[asin]
    assert asins[0] == inter["asin"].iloc[0] or asins[0] in set(inter["asin"])


def test_transformer_text_encoder_shapes():
    from plotpointe_tpu.models.encoders import TransformerTextEncoder

    enc = TransformerTextEncoder(vocab_size=1000, hidden=32, n_layers=2, heads=4, ffn=64, max_len=16)
    params = enc.init(jax.random.key(0))
    ids, mask = enc.tokenize(["hello world", "a much longer piece of text here"])
    out = jax.jit(enc.apply)(params, ids, mask)
    assert out.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-5)


def test_vit_image_encoder_shapes():
    from plotpointe_tpu.models.encoders import ViTImageEncoder

    enc = ViTImageEncoder(image_size=64, patch=32, hidden=32, n_layers=2, heads=4, ffn=64, out_dim=16)
    params = enc.init(jax.random.key(0))
    imgs = np.random.default_rng(0).random((3, 64, 64, 3)).astype(np.float32)
    out = jax.jit(enc.apply)(params, imgs)
    assert out.shape == (3, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-5)
