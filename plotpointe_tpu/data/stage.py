"""Data staging: SNAP "loose JSON" gz dumps -> interactions/items parquet.

Capability parity with `data/pipelines/stage_amazon_electronics.py` (schema,
contract filters, rejects file) but vectorized with pandas masks instead of
per-row checks, and emitting through the ArtifactStore rather than gsutil.

Contract filters (reference :136-154):
  - non-null user_id/asin/ts
  - rating in [1, 5]
  - ts within [lo, hi] sanity bounds
  - items: FK — every interaction asin must exist in items
Rejected rows are written to a rejects parquet with a `reject_reason` column.
"""
from __future__ import annotations

import gzip
import json
from pathlib import Path
from typing import Iterator, Optional, Tuple

TS_LO = 800_000_000  # ~1995, reference uses similar sanity bounds
TS_HI = 2_000_000_000  # ~2033


def parse_loose_json_gz(path: str | Path) -> Iterator[dict]:
    """Stream records from SNAP-style 'loose JSON' (python-literal-ish dicts,
    one per line). Reference: stage_amazon_electronics.py:21-35."""
    import ast

    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "rt", errors="replace") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                try:
                    yield ast.literal_eval(line)
                except (ValueError, SyntaxError):
                    continue


def to_interactions_df(records) -> "object":
    import pandas as pd

    rows = []
    for r in records:
        helpful = r.get("helpful", [0, 0])
        rows.append(
            {
                "user_id": r.get("reviewerID"),
                "asin": r.get("asin"),
                "rating": r.get("overall"),
                "ts": r.get("unixReviewTime"),
                "verified": bool(r.get("verified", False)),
                "helpful": int(helpful[0]) if isinstance(helpful, (list, tuple)) else int(helpful or 0),
            }
        )
    return pd.DataFrame(rows)


def to_items_df(records) -> "object":
    import pandas as pd

    rows = []
    for r in records:
        imurl = r.get("imUrl") or r.get("image_url")
        cats = r.get("categories") or []
        if cats and isinstance(cats[0], list):
            cats = cats[0]
        rows.append(
            {
                "asin": r.get("asin"),
                "title": r.get("title"),
                "brand": r.get("brand"),
                "price": r.get("price"),
                "categories": cats,
                "image_url": imurl,
            }
        )
    return pd.DataFrame(rows)


def apply_contract(interactions, items) -> Tuple[object, object, object]:
    """Vectorized contract filtering. Returns (interactions, items, rejects)."""
    import pandas as pd

    df = interactions.copy()
    reason = pd.Series("", index=df.index)

    null_mask = df[["user_id", "asin", "ts"]].isna().any(axis=1)
    reason[null_mask] = "null_key"
    rating_mask = ~null_mask & (~df["rating"].between(1, 5) | df["rating"].isna())
    reason[rating_mask] = "rating_bounds"
    ts_mask = ~null_mask & ~rating_mask & ~df["ts"].between(TS_LO, TS_HI)
    reason[ts_mask] = "ts_bounds"
    fk_mask = (
        ~null_mask & ~rating_mask & ~ts_mask & ~df["asin"].isin(set(items["asin"].dropna()))
    )
    reason[fk_mask] = "fk_asin"

    bad = reason != ""
    rejects = df[bad].assign(reject_reason=reason[bad])
    clean = df[~bad].reset_index(drop=True)

    items_clean = items[items["asin"].notna()].drop_duplicates("asin").reset_index(drop=True)
    return clean, items_clean, rejects


def stage(
    reviews_path: str | Path,
    meta_path: str | Path,
    out_prefix: str,
    store=None,
    max_records: Optional[int] = None,
):
    """Full staging pipeline: parse -> frames -> contract -> parquet artifacts."""
    import itertools

    from plotpointe_tpu.utils.artifacts import ArtifactStore

    store = store or ArtifactStore()
    rev = parse_loose_json_gz(reviews_path)
    met = parse_loose_json_gz(meta_path)
    if max_records:
        rev = itertools.islice(rev, max_records)
        met = itertools.islice(met, max_records)
    interactions = to_interactions_df(rev)
    items = to_items_df(met)
    interactions, items, rejects = apply_contract(interactions, items)

    uris = {
        "interactions": f"{out_prefix}/interactions.parquet",
        "items": f"{out_prefix}/items.parquet",
        "rejects": f"{out_prefix}/rejects.parquet",
    }
    store.save_parquet(interactions, uris["interactions"])
    store.save_parquet(items, uris["items"])
    store.save_parquet(rejects, uris["rejects"])
    return uris, {"n_interactions": len(interactions), "n_items": len(items), "n_rejects": len(rejects)}
