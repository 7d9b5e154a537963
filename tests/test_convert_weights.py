"""Converted-weight output parity: HF torch towers vs our JAX encoders.

Uses tiny RANDOM-INIT HF models built locally from configs (no network), so
these tests prove the weight mapping + math (fused qkv, folded token-type row,
patch-conv flattening, erf-GELU vs QuickGELU, LN eps) — the same mapping then
applies unchanged to the real all-MiniLM-L6-v2 / clip-vit-base-patch32
checkpoints the reference uses (embed_text.py:109-115, embed_image.py:23-31).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from plotpointe_tpu.models.encoders import TransformerTextEncoder, ViTImageEncoder
from plotpointe_tpu.tools.convert_weights import (
    convert_clip_vision_state_dict,
    convert_minilm_state_dict,
)


def _np_tree(params):
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)


def test_minilm_conversion_output_parity():
    cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=40, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    max_len = 16
    params = _np_tree(convert_minilm_state_dict(sd, max_len=max_len))
    enc = TransformerTextEncoder(
        vocab_size=120, hidden=32, n_layers=2, heads=4, ffn=64, max_len=max_len
    )

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 120, (3, max_len)).astype(np.int64)
    mask = np.ones((3, max_len), np.float32)
    mask[1, 10:] = 0.0
    mask[2, 5:] = 0.0

    with torch.no_grad():
        hidden = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    m = mask[..., None]
    want = (hidden * m).sum(1) / np.maximum(m.sum(1), 1.0)  # sentence-transformers mean pool
    want /= np.linalg.norm(want, axis=1, keepdims=True) + 1e-12

    got = np.asarray(enc.apply(params, jnp.asarray(ids.astype(np.int32)), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_clip_vision_conversion_output_parity():
    cfg = transformers.CLIPVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=16, projection_dim=24,
        hidden_act="quick_gelu", attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModelWithProjection(cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    params = _np_tree(convert_clip_vision_state_dict(sd))
    enc = ViTImageEncoder(
        image_size=32, patch=16, hidden=32, n_layers=2, heads=4, ffn=64, out_dim=24
    )

    rng = np.random.default_rng(2)
    imgs = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        want = hf(pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2))).image_embeds.numpy()
    want = want / (np.linalg.norm(want, axis=1, keepdims=True) + 1e-12)

    got = np.asarray(enc.apply(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_wordpiece_tokenizer():
    from plotpointe_tpu.models.tokenizer import WordPieceTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "un", "##want", "##ed", "runn",
             "##ing", "the", ",", "!", "a"]
    tok = WordPieceTokenizer(vocab)
    ids = tok.tokenize_ids("unwanted running")
    assert ids == [4, 5, 6, 7, 8]
    # punctuation splits off; unknown words -> [UNK]; accents/case fold
    assert tok.tokenize_ids("The, zebra!") == [9, 10, 1, 11]
    assert tok.tokenize_ids("UnWANTed") == [4, 5, 6]

    enc_ids, mask = tok.encode(["unwanted", ""], max_len=6)
    assert enc_ids.shape == (2, 6) and mask.shape == (2, 6)
    assert list(enc_ids[0, :5]) == [2, 4, 5, 6, 3]  # [CLS] un ##want ##ed [SEP]
    assert mask[0].sum() == 5 and mask[1].sum() == 2  # empty text -> [CLS] [SEP]
    assert enc_ids[0, 5] == 0  # [PAD]


def test_image_pixel_stage(tmp_path):
    """embed_image_stage pixel path: decodes real local files, counts real
    failures, drops failed rows from both matrix and img_items."""
    import pandas as pd
    from PIL import Image

    from plotpointe_tpu.models.embed_stages import embed_image_stage
    from plotpointe_tpu.utils.artifacts import ArtifactStore

    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    corrupt = tmp_path / "bad.png"
    corrupt.write_bytes(b"not a png")
    items = pd.DataFrame({
        "asin": ["a0", "a1", "a2", "a3", "a4"],
        "image_url": paths + [str(corrupt), str(tmp_path / "missing.png")],
    })

    store = ArtifactStore()
    emb, meta = embed_image_stage(items, str(tmp_path / "out"), store=store)
    assert meta["failures"] == 2
    assert meta["n_images"] == 3
    assert emb.shape == (3, 512)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-4)
    kept = store.load_parquet(str(tmp_path / "out" / "img_items.parquet"))
    assert list(kept["asin"]) == ["a0", "a1", "a2"]


@pytest.mark.parametrize("_", [0])
def test_minilm_conversion_full_size_parity(_):
    """Same converter parity at the REAL all-MiniLM-L6-v2 architecture dims
    (6 layers, 384 hidden, 12 heads, 1536 ffn, 30522 vocab) — random-init HF
    oracle built in-process, so this runs in zero-egress environments where
    the real-checkpoint fixtures (below) cannot be generated. Covers every
    shape-dependent mapping step (fused qkv at head_dim 32, folded
    token-type row, position slice) at production scale."""
    cfg = transformers.BertConfig(
        vocab_size=30522, hidden_size=384, num_hidden_layers=6,
        num_attention_heads=12, intermediate_size=1536,
        max_position_embeddings=512, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.BertModel(cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    max_len = 64
    params = _np_tree(convert_minilm_state_dict(sd, max_len=max_len))
    enc = TransformerTextEncoder(
        vocab_size=30522, hidden=384, n_layers=6, heads=12, ffn=1536, max_len=max_len
    )
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 30522, (2, max_len)).astype(np.int64)
    mask = np.ones((2, max_len), np.float32)
    mask[1, 40:] = 0.0
    with torch.no_grad():
        hidden = hf(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    m = mask[..., None]
    want = (hidden * m).sum(1) / np.maximum(m.sum(1), 1.0)
    want /= np.linalg.norm(want, axis=1, keepdims=True) + 1e-12
    got = np.asarray(enc.apply(params, jnp.asarray(ids.astype(np.int32)), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_clip_vision_full_size_parity():
    """Converter parity at the REAL clip-vit-base-patch32 dims (12 layers,
    768 hidden, 12 heads, 224px/32 patches, 512 projection) with an
    in-process random-init HF oracle — the zero-egress counterpart of the
    real-checkpoint fixture test below."""
    cfg = transformers.CLIPVisionConfig(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, image_size=224, patch_size=32,
        projection_dim=512, hidden_act="quick_gelu", attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModelWithProjection(cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = _np_tree(convert_clip_vision_state_dict(sd))
    enc = ViTImageEncoder(
        image_size=224, patch=32, hidden=768, n_layers=12, heads=12, ffn=3072, out_dim=512
    )
    rng = np.random.default_rng(2)
    imgs = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf(pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2))).image_embeds.numpy()
    want = want / (np.linalg.norm(want, axis=1, keepdims=True) + 1e-12)
    got = np.asarray(enc.apply(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# -- real-checkpoint fixtures (tools/fetch_fixtures.py) -----------------------
# Generated on a network-enabled machine; skipped when absent. These close the
# loop numerically: converted-JAX towers reproduce the REAL
# all-MiniLM-L6-v2 / clip-vit-base-patch32 outputs the reference embeds with
# (embed_text.py:109-115, embed_image.py:23-31), not just random-init parity.
import os
from pathlib import Path

FIXTURES = Path(__file__).parent / "fixtures"


def _unflatten_params(blob):
    tree = {}
    for k in blob.files:
        if not k.startswith("param:"):
            continue
        parts = k[len("param:"):].split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(blob[k], jnp.float32)

    def fix(n):
        if isinstance(n, dict):
            if n and all(s.isdigit() for s in n):
                return [fix(n[str(i)]) for i in range(len(n))]
            return {k: fix(v) for k, v in n.items()}
        return n

    return fix(tree)


def _cos_rows(a, b):
    a = a / np.linalg.norm(a, axis=1, keepdims=True)
    b = b / np.linalg.norm(b, axis=1, keepdims=True)
    return (a * b).sum(1)


@pytest.mark.skipif(not (FIXTURES / "minilm_real.npz").exists(),
                    reason="real-weight fixture absent (run tools/fetch_fixtures.py with network)")
def test_real_minilm_checkpoint_parity():
    blob = np.load(FIXTURES / "minilm_real.npz")
    params = _unflatten_params(blob)
    ids = blob["probe_ids"]
    mask = blob["probe_mask"]
    enc = TransformerTextEncoder(
        vocab_size=30522, hidden=384, n_layers=6, heads=12, ffn=1536, max_len=ids.shape[1]
    )
    got = np.asarray(enc.apply(params, jnp.asarray(ids), jnp.asarray(mask)))
    cos = _cos_rows(got, blob["ref_pooled"])
    assert (cos >= 0.999).all(), cos


@pytest.mark.skipif(not (FIXTURES / "clip_real.npz").exists(),
                    reason="real-weight fixture absent (run tools/fetch_fixtures.py with network)")
def test_real_clip_checkpoint_parity():
    blob = np.load(FIXTURES / "clip_real.npz")
    params = _unflatten_params(blob)
    enc = ViTImageEncoder(
        image_size=224, patch=32, hidden=768, n_layers=12, heads=12, ffn=3072, out_dim=512
    )
    got = np.asarray(enc.apply(params, jnp.asarray(blob["probe_pixels"])))
    cos = _cos_rows(got, blob["ref_embeds"])
    assert (cos >= 0.999).all(), cos
