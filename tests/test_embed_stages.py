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


def test_remote_image_fetch_with_local_http_server(tmp_path):
    """Flag-gated remote fetch (reference parity: embed_image.py:23-31
    download with timeout + failure counting): serve real/corrupt images
    from a local HTTP server, assert fetch+decode+CLIP pipeline and failure
    accounting; default (allow_remote=False) must not fetch at all."""
    import http.server
    import threading

    import numpy as np
    from PIL import Image

    from plotpointe_tpu.models.image_io import fetch_image, load_image_batch

    rng = np.random.default_rng(0)
    (tmp_path / "good.png").write_bytes(b"")
    Image.fromarray(rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)).save(tmp_path / "good.png")
    (tmp_path / "bad.png").write_bytes(b"not a png")

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(tmp_path), **kw)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        img = fetch_image(f"{base}/good.png", timeout=5, retries=1)
        assert img is not None and img.size == (50, 40)
        assert fetch_image(f"{base}/bad.png", timeout=5, retries=0) is None
        assert fetch_image(f"{base}/missing.png", timeout=5, retries=1) is None

        urls = [f"{base}/good.png", f"{base}/bad.png", f"{base}/missing.png"]
        pixels, ok = load_image_batch(urls, allow_remote=True, retries=0)
        assert list(ok) == [True, False, False]
        assert pixels.shape == (1, 224, 224, 3)

        # default stays zero-egress: remote refs are failures, nothing fetched
        pixels0, ok0 = load_image_batch(urls)
        assert not ok0.any() and pixels0.shape[0] == 0
    finally:
        srv.shutdown()
