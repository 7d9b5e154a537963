"""Data staging: loose-JSON parsing, frame building, contract filtering."""
import gzip
import json

import numpy as np

from plotpointe_tpu.data.stage import (
    apply_contract,
    parse_loose_json_gz,
    stage,
    to_interactions_df,
    to_items_df,
)


def _write_loose(path, records, as_python_literal=False):
    with gzip.open(path, "wt") as f:
        for r in records:
            f.write((repr(r) if as_python_literal else json.dumps(r)) + "\n")


def test_parse_both_formats(tmp_path):
    recs = [{"asin": "A1", "overall": 5.0}, {"asin": "A2", "overall": 3.0}]
    p1 = tmp_path / "json.gz"
    p2 = tmp_path / "pyliteral.gz"
    _write_loose(p1, recs)
    _write_loose(p2, recs, as_python_literal=True)  # SNAP "loose JSON" = python dicts
    assert list(parse_loose_json_gz(p1)) == recs
    assert list(parse_loose_json_gz(p2)) == recs


def test_contract_filters():
    inter = to_interactions_df(
        [
            {"reviewerID": "u1", "asin": "A1", "overall": 5.0, "unixReviewTime": 1_300_000_000},
            {"reviewerID": None, "asin": "A1", "overall": 4.0, "unixReviewTime": 1_300_000_000},  # null key
            {"reviewerID": "u2", "asin": "A1", "overall": 9.0, "unixReviewTime": 1_300_000_000},  # rating
            {"reviewerID": "u3", "asin": "A1", "overall": 4.0, "unixReviewTime": 1},  # ts bounds
            {"reviewerID": "u4", "asin": "ZZZ", "overall": 4.0, "unixReviewTime": 1_300_000_000},  # fk
        ]
    )
    items = to_items_df([{"asin": "A1", "title": "t", "categories": [["Electronics", "TV"]]}])
    clean, items_clean, rejects = apply_contract(inter, items)
    assert len(clean) == 1 and clean.iloc[0]["user_id"] == "u1"
    assert sorted(rejects["reject_reason"]) == ["fk_asin", "null_key", "rating_bounds", "ts_bounds"]
    assert items_clean.iloc[0]["categories"] == ["Electronics", "TV"]


def test_stage_end_to_end(tmp_path):
    reviews = [
        {"reviewerID": f"u{i}", "asin": f"A{i % 3}", "overall": 4.0, "unixReviewTime": 1_300_000_000 + i}
        for i in range(10)
    ]
    meta = [{"asin": f"A{j}", "title": f"item {j}", "price": 9.99} for j in range(3)]
    rp = tmp_path / "reviews.json.gz"
    mp = tmp_path / "meta.json.gz"
    _write_loose(rp, reviews)
    _write_loose(mp, meta, as_python_literal=True)

    uris, stats = stage(rp, mp, str(tmp_path / "staged"))
    assert stats["n_interactions"] == 10
    assert stats["n_items"] == 3
    assert stats["n_rejects"] == 0
    import pandas as pd

    df = pd.read_parquet(uris["interactions"])
    assert set(df.columns) == {"user_id", "asin", "rating", "ts", "verified", "helpful"}
