"""Embedding pipeline stages: text, image, fusion — artifact in/out.

Stage/contract parity with the reference's L2 feature factory
(`embeddings/embed_text.py`, `embed_image.py`, `fuse_modal.py`): same artifact
names (txt.npy + txt_meta.json, img{_chunk}.npy + img_items{_chunk}.parquet +
img_meta{_chunk}.json, fused.npy + fusion_config.json), same text-composition
and alignment semantics, same chunk-sharding interface for images. Encoder
backends are pluggable (plotpointe_tpu.models.encoders): the deterministic
hash encoder requires no weights (zero-egress environments); transformer
towers accept locally provided weights.
"""
from __future__ import annotations

import time
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from plotpointe_tpu.config import FusionConfig
from plotpointe_tpu.utils.artifacts import ArtifactStore


def compose_item_text(items) -> list:
    """Text field composition parity with embed_text.py:69-95:
    title + 'Brand: {brand}' + joined categories (+ description if present)."""
    texts = []
    has_desc = "description" in items.columns
    for _, row in items.iterrows():
        parts = []
        if row.get("title"):
            parts.append(str(row["title"]))
        if row.get("brand"):
            parts.append(f"Brand: {row['brand']}")
        cats = row.get("categories")
        if cats is not None and len(cats):
            parts.append(" ".join(str(c) for c in cats))
        if has_desc and row.get("description"):
            parts.append(str(row["description"]))
        texts.append(". ".join(parts) if parts else "unknown item")
    return texts


def make_minilm_encoder(weights: str, vocab: str, batch_size: int = 128) -> Callable:
    """Converted-MiniLM text encoder: WordPiece tokenize -> jit'd transformer.

    Batches are padded to `batch_size` so every chunk reuses one compiled
    program (static shapes — XLA compiles once, MXU runs bf16-free f32)."""
    import jax
    import jax.numpy as jnp

    from plotpointe_tpu.models.encoders import TransformerTextEncoder, load_params_npz
    from plotpointe_tpu.models.tokenizer import WordPieceTokenizer

    enc = TransformerTextEncoder()
    params = load_params_npz(weights, enc.init(jax.random.key(0)))
    tok = WordPieceTokenizer(vocab)
    apply = jax.jit(enc.apply)

    def encode(texts: list) -> np.ndarray:
        ids, mask = tok.encode(texts, max_len=enc.max_len)
        pad = batch_size - len(texts) if len(texts) < batch_size else 0
        if pad:
            ids = np.concatenate([ids, np.zeros((pad, enc.max_len), np.int32)])
            mask = np.concatenate([mask, np.zeros((pad, enc.max_len), np.float32)])
            mask[len(texts):, 0] = 1.0  # avoid all-masked rows (softmax NaN)
        out = np.asarray(apply(params, jnp.asarray(ids), jnp.asarray(mask)), np.float32)
        return out[: len(texts)]

    return encode


def embed_text_stage(
    items,
    out_prefix: str,
    encoder: Optional[Callable[[list], np.ndarray]] = None,
    store: Optional[ArtifactStore] = None,
    batch_size: int = 128,
    weights: Optional[str] = None,
    vocab: Optional[str] = None,
) -> Tuple[np.ndarray, Dict]:
    """items.parquet -> txt.npy (rows in items order, L2-normalized) + txt_meta.json.

    With `weights` (converted MiniLM npz) + `vocab` (WordPiece vocab.txt) the
    stage reproduces the reference's real sentence-transformer embeddings
    (embed_text.py:109-115); otherwise the deterministic hash encoder runs."""
    store = store or ArtifactStore()
    t0 = time.time()
    texts = compose_item_text(items)
    if encoder is None and weights and vocab:
        encoder = make_minilm_encoder(weights, vocab)
    if encoder is None:
        from plotpointe_tpu.models.encoders import hash_text_encoder

        encoder = hash_text_encoder(dim=384)
    outs = [encoder(texts[s : s + batch_size]) for s in range(0, len(texts), batch_size)]
    emb = np.concatenate(outs, axis=0).astype(np.float32) if outs else np.zeros((0, 384), np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True) + 1e-12
    dt = time.time() - t0
    meta = {
        "n_items": int(emb.shape[0]),
        "dims": int(emb.shape[1]) if emb.size else 0,
        "throughput_items_per_sec": float(emb.shape[0] / dt) if dt > 0 else 0.0,
        "build_time_sec": dt,
    }
    store.save_npy(emb, f"{out_prefix}/txt.npy")
    store.save_json(meta, f"{out_prefix}/txt_meta.json")
    return emb, meta


def embed_image_stage(
    items,
    out_prefix: str,
    encoder: Optional[Callable[[list], np.ndarray]] = None,
    store: Optional[ArtifactStore] = None,
    chunk_start: Optional[int] = None,
    chunk_end: Optional[int] = None,
    chunk_id: Optional[int] = None,
    max_items: Optional[int] = None,
    seed: int = 42,
    pixels: Optional[bool] = None,
    weights: Optional[str] = None,
    allow_remote: bool = False,
) -> Tuple[np.ndarray, Dict]:
    """items with image_url -> img{_chunk}.npy + img_items{_chunk}.parquet.

    Chunk-sharding semantics of embed_image.py:45-47,93-101 (index-range
    slicing for multi-worker sharding; seeded sample cap). Two encode paths:

      - pixel path (pixels=True, or auto when image_url points at local
        files): decode + CLIP-preprocess + batched ViT encode on device,
        counting decode failures exactly like the reference counts download
        failures (embed_image.py:122-136); failed rows are dropped from both
        the embedding matrix and img_items, as the reference does. Pass
        `weights` (tools/convert_weights.py output) for real CLIP features.
      - url-hash path (zero-egress fallback for remote URLs without staged
        files): deterministic hash encoder over the URL string.

    allow_remote=True (cli: --allow-remote) additionally downloads http(s)
    image_urls with timeout+retry, reproducing the reference's per-item
    download loop (`embed_image.py:23-31`) — flag-gated so nothing in the
    default pipeline performs network IO.
    """
    store = store or ArtifactStore()
    t0 = time.time()
    with_img = items[items["image_url"].notna()].reset_index(drop=True)
    if chunk_start is not None or chunk_end is not None:
        with_img = with_img.iloc[chunk_start or 0 : chunk_end].reset_index(drop=True)
    elif max_items is not None and len(with_img) > max_items:
        with_img = with_img.sample(n=max_items, random_state=seed).reset_index(drop=True)

    urls = [str(u) for u in with_img["image_url"]]
    n_failures = 0
    if pixels is None and encoder is None and urls:
        from plotpointe_tpu.models.image_io import local_path

        lp = local_path(urls[0])
        pixels = (lp is not None and lp.exists()) or (allow_remote and lp is None)

    if pixels:
        from plotpointe_tpu.models.image_io import encode_image_files

        emb, ok, n_failures = encode_image_files(urls, weights=weights,
                                                 allow_remote=allow_remote)
        with_img = with_img[ok].reset_index(drop=True)
    else:
        if encoder is None:
            from plotpointe_tpu.models.encoders import hash_text_encoder

            encoder = hash_text_encoder(dim=512)
        emb = encoder(urls).astype(np.float32) if urls else np.zeros((0, 512), np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True) + 1e-12

    sfx = f"_chunk{chunk_id}" if chunk_id is not None else ""
    dt = time.time() - t0
    meta = {
        "n_images": int(emb.shape[0]),
        "dims": int(emb.shape[1]) if emb.size else 0,
        "failures": int(n_failures),
        "chunk_id": chunk_id,
        "build_time_sec": dt,
    }
    store.save_npy(emb, f"{out_prefix}/img{sfx}.npy")
    store.save_parquet(with_img[["asin"]], f"{out_prefix}/img_items{sfx}.parquet")
    store.save_json(meta, f"{out_prefix}/img_meta{sfx}.json")
    return emb, meta


def merge_image_chunks(out_prefix: str, n_chunks: int, store: Optional[ArtifactStore] = None):
    """Merge img_chunk{i}.npy + img_items_chunk{i}.parquet -> img.npy + img_items.parquet
    (the merge step of scripts/parallel_image_embeddings.sh)."""
    import pandas as pd

    store = store or ArtifactStore()
    embs, frames = [], []
    for c in range(n_chunks):
        embs.append(np.asarray(store.load_npy(f"{out_prefix}/img_chunk{c}.npy")))
        frames.append(store.load_parquet(f"{out_prefix}/img_items_chunk{c}.parquet"))
    emb = np.concatenate(embs, axis=0)
    items = pd.concat(frames, ignore_index=True)
    store.save_npy(emb, f"{out_prefix}/img.npy")
    store.save_parquet(items, f"{out_prefix}/img_items.parquet")
    return emb, items


def fuse_stage(
    embeddings_prefix: str,
    out_prefix: Optional[str] = None,
    cfg: Optional[FusionConfig] = None,
    store: Optional[ArtifactStore] = None,
    items=None,
) -> Tuple[np.ndarray, Dict]:
    """txt.npy + img.npy + img_items.parquet (+ items.parquet) -> fused.npy.

    Alignment semantics of fuse_modal.py:144-156: image rows map to catalog
    rows via asin; items without images get the mean image embedding at
    inference (fuse_modal.py:216-242)."""
    from plotpointe_tpu.models.fusion import fuse_all_items, train_fusion

    store = store or ArtifactStore()
    out_prefix = out_prefix or embeddings_prefix
    txt = np.asarray(store.load_npy(f"{embeddings_prefix}/txt.npy"))
    img = np.asarray(store.load_npy(f"{embeddings_prefix}/img.npy"))
    img_items = store.load_parquet(f"{embeddings_prefix}/img_items.parquet")
    if items is None:
        items = store.load_parquet(f"{embeddings_prefix}/items.parquet")

    catalog_row = {a: r for r, a in enumerate(items["asin"])}
    img_row_for_item = np.full(len(items), -1, dtype=np.int64)
    for img_row, asin in enumerate(img_items["asin"]):
        r = catalog_row.get(asin)
        if r is not None:
            img_row_for_item[r] = img_row

    cfg = cfg or FusionConfig(text_dim=txt.shape[1], img_dim=img.shape[1])
    t0 = time.time()
    params, history = train_fusion(txt, img, img_row_for_item, cfg)
    fused = fuse_all_items(params, txt, img, img_row_for_item, cfg)
    dt = time.time() - t0

    config_out = cfg.to_dict() | {
        "n_items": int(len(items)),
        "n_with_images": int((img_row_for_item >= 0).sum()),
        "train_history": history,
        "build_time_sec": dt,
    }
    store.save_npy(fused, f"{out_prefix}/fused.npy")
    store.save_json(config_out, f"{out_prefix}/fusion_config.json")
    return fused, config_out
