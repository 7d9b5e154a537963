"""Fetch + cache the real encoder checkpoints as test fixtures.

The reference embeds with sentence-transformers/all-MiniLM-L6-v2 and
openai/clip-vit-base-patch32 (`embeddings/embed_text.py:109-115`,
`embed_image.py:23-31`). This tool downloads those checkpoints once (a
network-enabled machine is required — CI environments without egress skip
the fixture-gated tests), converts them with tools/convert_weights.py, runs
the HF torch model and the converted JAX tower on fixed probe inputs, and
writes everything tests need into `tests/fixtures/`:

  minilm_real.npz   converted JAX params + probe ids/mask + HF reference
                    embeddings (cosine-parity target)
  clip_real.npz     converted JAX params + probe pixels + HF reference

Usage (needs network + torch + transformers):
    python -m plotpointe_tpu.tools.fetch_fixtures [--out tests/fixtures]

tests/test_convert_weights.py::test_real_* skip when the fixtures are
absent and assert cosine >= 0.999 parity when present.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

PROBE_SEED = 1234
TXT_BATCH, TXT_LEN = 4, 32
IMG_BATCH = 2


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def fetch_minilm(out_dir: Path) -> None:
    import torch
    import transformers

    from plotpointe_tpu.tools.convert_weights import convert_minilm_state_dict

    name = "sentence-transformers/all-MiniLM-L6-v2"
    tok = transformers.AutoTokenizer.from_pretrained(name)
    hf = transformers.AutoModel.from_pretrained(name).eval()

    rng = np.random.default_rng(PROBE_SEED)
    texts = [
        "a wireless bluetooth speaker with deep bass",
        "usb-c fast charging cable for phones",
        "noise cancelling over-ear headphones",
        "4k streaming media player remote included",
    ]
    enc = tok(texts, padding="max_length", truncation=True, max_length=TXT_LEN, return_tensors="pt")
    with torch.no_grad():
        ref = hf(**enc).last_hidden_state  # [B, L, H]
        mask = enc["attention_mask"].unsqueeze(-1).float()
        pooled = (ref * mask).sum(1) / mask.sum(1)  # mean pooling, embed_text.py semantics

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_minilm_state_dict(sd, max_len=TXT_LEN)
    blob = {f"param:{k}": v for k, v in _flatten(params).items()}
    blob["probe_ids"] = enc["input_ids"].numpy().astype(np.int32)
    blob["probe_mask"] = enc["attention_mask"].numpy().astype(np.float32)
    blob["ref_pooled"] = pooled.numpy().astype(np.float32)
    np.savez_compressed(out_dir / "minilm_real.npz", **blob)
    print(f"wrote {out_dir / 'minilm_real.npz'} ({len(blob)} arrays)")


def fetch_clip(out_dir: Path) -> None:
    import torch
    import transformers

    from plotpointe_tpu.tools.convert_weights import convert_clip_vision_state_dict

    name = "openai/clip-vit-base-patch32"
    hf = transformers.CLIPVisionModelWithProjection.from_pretrained(name).eval()

    rng = np.random.default_rng(PROBE_SEED)
    pixels = rng.normal(size=(IMG_BATCH, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(pixels)).image_embeds  # [B, 512]

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_vision_state_dict(sd)
    blob = {f"param:{k}": v for k, v in _flatten(params).items()}
    blob["probe_pixels"] = np.transpose(pixels, (0, 2, 3, 1))  # NHWC for the JAX tower
    blob["ref_embeds"] = ref.numpy().astype(np.float32)
    np.savez_compressed(out_dir / "clip_real.npz", **blob)
    print(f"wrote {out_dir / 'clip_real.npz'} ({len(blob)} arrays)")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/fixtures")
    ap.add_argument("--family", choices=["minilm", "clip", "all"], default="all")
    args = ap.parse_args(argv)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    if args.family in ("minilm", "all"):
        fetch_minilm(out)
    if args.family in ("clip", "all"):
        fetch_clip(out)


if __name__ == "__main__":
    main()
