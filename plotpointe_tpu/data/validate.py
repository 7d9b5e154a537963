"""Great-Expectations-style dataset validation.

Check-for-check parity with `data/validation/validate_amazon_electronics.py:11-47`:
interactions — non-null keys, rating in [1,5], ts bounds, (user, asin, ts)
uniqueness, FK asin subset of items; items — non-null asin, unique asin,
price >= 0 where present. Returns a machine-readable report instead of only
printing PASS/FAIL.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

from plotpointe_tpu.data.stage import TS_HI, TS_LO


@dataclass
class CheckResult:
    name: str
    passed: bool
    detail: str = ""


@dataclass
class ValidationReport:
    checks: List[CheckResult] = field(default_factory=list)

    @property
    def passed(self) -> bool:
        return all(c.passed for c in self.checks)

    def add(self, name: str, passed: bool, detail: str = "") -> None:
        self.checks.append(CheckResult(name, bool(passed), detail))

    def to_dict(self) -> Dict:
        return {
            "passed": self.passed,
            "checks": [{"name": c.name, "passed": c.passed, "detail": c.detail} for c in self.checks],
        }


def validate_interactions(df, items=None) -> ValidationReport:
    rep = ValidationReport()
    nn = df[["user_id", "asin", "ts"]].notna().all(axis=1)
    rep.add("non_null_keys", nn.all(), f"{(~nn).sum()} rows with null keys")
    rb = df["rating"].between(1, 5)
    rep.add("rating_bounds", rb.all(), f"{(~rb).sum()} ratings outside [1,5]")
    tb = df["ts"].between(TS_LO, TS_HI)
    rep.add("ts_bounds", tb.all(), f"{(~tb).sum()} timestamps out of bounds")
    dup = df.duplicated(subset=["user_id", "asin", "ts"]).sum()
    rep.add("uniqueness_user_asin_ts", dup == 0, f"{dup} duplicate (user, asin, ts) rows")
    if items is not None:
        fk = df["asin"].isin(set(items["asin"].dropna()))
        rep.add("fk_asin_in_items", fk.all(), f"{(~fk).sum()} interactions with unknown asin")
    return rep


def validate_items(df) -> ValidationReport:
    rep = ValidationReport()
    nn = df["asin"].notna()
    rep.add("non_null_asin", nn.all(), f"{(~nn).sum()} null asins")
    dup = df["asin"].duplicated().sum()
    rep.add("unique_asin", dup == 0, f"{dup} duplicate asins")
    if "price" in df.columns:
        pr = df["price"].dropna()
        ok = (pr >= 0).all() if len(pr) else True
        rep.add("price_non_negative", ok, f"{(pr < 0).sum() if len(pr) else 0} negative prices")
    return rep


def validate(interactions, items) -> ValidationReport:
    rep = ValidationReport()
    rep.checks.extend(validate_interactions(interactions, items).checks)
    rep.checks.extend(validate_items(items).checks)
    return rep
