"""Synthetic Amazon-Electronics-shaped dataset generator.

The reference's real data blobs are absent (`.MISSING_LARGE_BLOBS`), so tests,
CPU-runnable configs and benches generate interaction data with the same
schema and the same statistical shape: power-law user/item degrees (reference:
user mean 7.07 sigma 6.97, item mean 21.6 sigma 65.3 - `PHASE0_REPORT.md:172`),
ratings in [1,5], unix timestamps, and a latent-factor structure so that
recommenders actually have signal to learn (random data would give NDCG ~= K/N
and make quality tests meaningless).
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def synthetic_interactions(
    n_users: int = 2000,
    n_items: int = 1200,
    n_interactions: int = 50_000,
    n_factors: int = 8,
    seed: int = 0,
    concentration: float = 1.2,
    return_factors: bool = False,
    affinity_strength: float = 3.0,
    user_sigma: Optional[float] = None,
    item_sigma: Optional[float] = None,
    rating_marginal: str = "affinity",  # {affinity, amazon}
    ts_mode: str = "uniform",  # {uniform, recency}
    n_clusters: int = 0,
    item_cluster_sigma: float = 0.35,
    user_cluster_sigma: float = 0.6,
    candidate_pool: int = 16,
    cluster_pool_bias: float = 0.0,
):
    """Build an interactions table (user_id, asin, rating, ts, verified, helpful).

    Users and items get latent factors; each user interacts mostly with items
    aligned to their factor vector, sampled via per-user softmax over a random
    candidate pool. Degrees follow a Zipf-ish law via user activity weights.

    Calibration knobs (see amazon_calibrated_interactions for the full-shape
    preset): `user_sigma`/`item_sigma` set the lognormal degree-weight spreads
    directly; `affinity_strength` trades popularity-driven choice (0 = pure
    popularity) against latent-factor affinity; `rating_marginal="amazon"`
    draws ratings from the Amazon-Electronics-typical 5-star-skewed marginal
    (affinity-shifted); `ts_mode="recency"` draws timestamps exponentially
    biased toward the end of a 14-year span (review volume grows over time).
    """
    rng = np.random.default_rng(seed)

    if n_clusters > 0:
        # Category-structured latents (the real-data property the marginal-only
        # generator lacked, VERDICT r3 missing #2): items live near one of K
        # heavy-tailed cluster centroids (Amazon categories), users near one
        # too — so co-occurrence is block-structured and item features (drawn
        # from the SAME latents, synthetic_features) genuinely predict it.
        # This is what makes a 20-step learner separate from init: gradients
        # from different users agree on the category axes.
        centroids = rng.normal(size=(n_clusters, n_factors)).astype(np.float32)
        centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
        cluster_p = rng.lognormal(mean=0.0, sigma=1.0, size=n_clusters)
        cluster_p /= cluster_p.sum()
        item_cluster = rng.choice(n_clusters, size=n_items, p=cluster_p)
        user_cluster = rng.choice(n_clusters, size=n_users, p=cluster_p)
        i_fac = centroids[item_cluster] + item_cluster_sigma * rng.normal(
            size=(n_items, n_factors)).astype(np.float32)
        u_fac = centroids[user_cluster] + user_cluster_sigma * rng.normal(
            size=(n_users, n_factors)).astype(np.float32)
    else:
        u_fac = rng.normal(size=(n_users, n_factors)).astype(np.float32)
        i_fac = rng.normal(size=(n_items, n_factors)).astype(np.float32)
    u_fac /= np.linalg.norm(u_fac, axis=1, keepdims=True)
    i_fac /= np.linalg.norm(i_fac, axis=1, keepdims=True)

    # Heavy-tailed but Amazon-calibrated activity/popularity: lognormal weights
    # with CV ~= 1 for users (reference: mean 7.07, sigma 6.97) and CV ~= 3 for
    # items (mean 21.6, sigma 65.3, PHASE0_REPORT.md:172). Raw zipf draws as
    # weights produce single items owning >5% of all interactions, which no
    # real catalog has and which destroys popularity-signal calibration.
    activity = rng.lognormal(mean=0.0, sigma=user_sigma or 0.9 * concentration / 1.2, size=n_users)
    activity = activity / activity.sum()
    users = rng.choice(n_users, size=n_interactions, p=activity)

    popularity = rng.lognormal(mean=0.0, sigma=item_sigma or 1.35 * concentration / 1.2, size=n_items)
    popularity = popularity / popularity.sum()

    # Vectorized affinity-biased item choice: sample C candidates by popularity,
    # then pick argmax over (affinity + gumbel noise) per interaction.
    C = candidate_pool
    cand = rng.choice(n_items, size=(n_interactions, C), p=popularity)
    if n_clusters > 0 and cluster_pool_bias > 0.0:
        # category browsing: a `cluster_pool_bias` fraction of each
        # interaction's candidate pool is drawn from the USER's own cluster
        # (by within-cluster popularity) — real shoppers browse category
        # pages, which is what makes real co-purchase graphs category-pure
        # even in huge catalogs. Without this, large K dilutes co-occurrence
        # (a popularity-drawn pool rarely contains same-cluster items).
        uc = user_cluster[users]  # [n_interactions]
        in_cluster = rng.random((n_interactions, C)) < cluster_pool_bias
        for k in range(n_clusters):
            items_k = np.flatnonzero(item_cluster == k)
            if items_k.size == 0:
                continue
            rows = np.flatnonzero(uc == k)
            if rows.size == 0:
                continue
            p_k = popularity[items_k] / popularity[items_k].sum()
            mask_k = in_cluster[rows]
            draws = rng.choice(items_k, size=int(mask_k.sum()), p=p_k)
            block = cand[rows]
            block[mask_k] = draws
            cand[rows] = block
    aff = np.einsum("nf,ncf->nc", u_fac[users], i_fac[cand]).astype(np.float32)
    gumbel = rng.gumbel(size=(n_interactions, C)).astype(np.float32)
    pick = np.argmax(aff * affinity_strength + gumbel, axis=1)
    items = cand[np.arange(n_interactions), pick]

    a = np.einsum("nf,nf->n", u_fac[users], i_fac[items])
    if rating_marginal == "amazon":
        # Amazon-Electronics-typical star skew (~59/18/9/5/9% for 5..1),
        # affinity-shifted so ratings still carry signal
        base = rng.choice([5.0, 4.0, 3.0, 2.0, 1.0], size=n_interactions,
                          p=[0.59, 0.18, 0.09, 0.05, 0.09])
        rating = np.clip(np.round(base + 1.2 * a + rng.normal(scale=0.4, size=n_interactions)), 1, 5)
    else:
        # Ratings correlate with affinity; clip to [1, 5]
        rating = np.clip(np.round(3.0 + 2.0 * a + rng.normal(scale=0.7, size=n_interactions)), 1, 5)

    if ts_mode == "recency":
        span = 1_500_000_000 - 1_060_000_000  # ~2003-2017
        back = rng.exponential(scale=span / 4.0, size=n_interactions)
        ts = (1_500_000_000 - np.minimum(back, span)).astype(np.int64)
    else:
        ts = rng.integers(1_100_000_000, 1_500_000_000, size=n_interactions)

    import pandas as pd

    df = pd.DataFrame(
        {
            "user_id": np.array([f"U{u:07d}" for u in users]),
            "asin": np.array([f"B{i:09d}" for i in items]),
            "rating": rating.astype(np.float64),
            "ts": ts.astype(np.int64),
            "verified": rng.random(n_interactions) < 0.8,
            "helpful": rng.integers(0, 10, size=n_interactions).astype(np.int64),
        }
    )
    # The reference treats (user, asin, ts) as unique (validate_amazon_electronics.py)
    df = df.drop_duplicates(subset=["user_id", "asin", "ts"]).reset_index(drop=True)
    if return_factors:
        return df, (u_fac, i_fac)
    return df


def amazon_calibrated_interactions(
    n_users: int = 192_403,
    n_items: int = 63_001,
    n_interactions: int = 1_689_116,
    n_factors: int = 16,
    seed: int = 0,
    affinity_strength: float = 3.0,
    return_factors: bool = False,
    n_clusters: int = 0,
    candidate_pool: int = 16,
    item_cluster_sigma: float = 0.35,
    user_cluster_sigma: float = 0.6,
    cluster_pool_bias: float = 0.0,
):
    """Full-Amazon-Electronics-shape dataset (DATA_BASELINE.md:13-17 exact
    cardinalities) with degree marginals tuned to the reference's published
    U-I graph stats (PHASE0_REPORT.md:172: user deg 7.07 +- 6.97, item deg
    21.60 +- 65.34 over DEDUPED pairs), Amazon-typical rating skew, and
    recency-biased timestamps.

    Lognormal sigmas derive from the degree CVs: CV_user ~= 0.99 ->
    sigma^2 = ln(1+CV^2) ~= 0.68; CV_item ~= 3.02 -> sigma^2 ~= 2.32. The
    multinomial thinning of finite sampling adds variance at the low-degree
    end, so the realized sigmas land close to (slightly above) target —
    anchor runs report the realized stats next to the reference's.

    `affinity_strength` is the controlled variable for the quality anchor:
    0.0 gives a pure-popularity dataset (rank-by-degree is near-optimal),
    3.0 the default latent-factor blend."""
    return synthetic_interactions(
        n_users=n_users,
        n_items=n_items,
        n_interactions=n_interactions,
        n_factors=n_factors,
        seed=seed,
        return_factors=return_factors,
        affinity_strength=affinity_strength,
        user_sigma=0.83,
        item_sigma=1.52,
        rating_marginal="amazon",
        ts_mode="recency",
        n_clusters=n_clusters,
        candidate_pool=candidate_pool,
        item_cluster_sigma=item_cluster_sigma,
        user_cluster_sigma=user_cluster_sigma,
        cluster_pool_bias=cluster_pool_bias,
    )


def synthetic_catalog(interactions, n_extra_items: int = 0, seed: int = 0, item_factors: Optional[np.ndarray] = None):
    """Items table (asin, title, brand, price, categories, image_url) covering all
    interacted asins plus `n_extra_items` cold items (the reference catalog has
    498k items of which only 63k are interacted).

    If `item_factors` (from synthetic_interactions(return_factors=True)) is
    given, titles/brands/categories encode each item's dominant latent factors
    — so text-derived features genuinely correlate with user affinity, the
    way real titles do, and quality-anchor runs measure learning rather than
    noise. Asins encode the factor row as B{idx:09d}.
    """
    import pandas as pd

    rng = np.random.default_rng(seed + 1)
    asins = list(pd.unique(interactions["asin"]))
    asins += [f"B9{i:08d}" for i in range(n_extra_items)]
    n = len(asins)
    has_img = rng.random(n) < 0.3  # reference: ~30% of items have usable images

    titles, brands, cats = [], [], []
    for a in asins:
        fac_row = None
        if item_factors is not None and a.startswith("B") and not a.startswith("B9"):
            idx = int(a[1:])
            if idx < len(item_factors):
                fac_row = item_factors[idx]
        if fac_row is not None:
            order = np.argsort(-np.abs(fac_row))
            c1, c2 = int(order[0]), int(order[1])
            s1 = "pos" if fac_row[c1] > 0 else "neg"
            s2 = "pos" if fac_row[c2] > 0 else "neg"
            titles.append(f"{s1}axis{c1} {s2}axis{c2} device model {a[-4:]}")
            brands.append(f"Brand{c1}{s1}")
            cats.append(["Electronics", f"Cat{c1}{s1}", f"Sub{c2}{s2}"])
        else:
            titles.append(f"Synthetic item {a}")
            brands.append(f"Brand{rng.integers(0, 50)}")
            cats.append(["Electronics", f"Sub{rng.integers(0, 20)}"])

    return pd.DataFrame(
        {
            "asin": asins,
            "title": titles,
            "brand": brands,
            "price": np.round(rng.gamma(2.0, 30.0, size=n), 2),
            "categories": cats,
            "image_url": [f"http://img.example/{a}.jpg" if h else None for a, h in zip(asins, has_img)],
        }
    )


def synthetic_features(n_items: int, dim: int, seed: int = 0, factors: Optional[np.ndarray] = None,
                       noise: float = 0.3) -> np.ndarray:
    """L2-normalized synthetic item feature matrix (stand-in for txt/fused npy).

    If `factors` given (from synthetic_interactions), features embed the latent
    structure so feature-driven models have signal; `noise` sets the
    uninformative-component scale (real MiniLM/fused embeddings of
    co-purchased electronics are strongly category-correlated — lower noise
    models that)."""
    rng = np.random.default_rng(seed + 2)
    feats = rng.normal(size=(n_items, dim)).astype(np.float32)
    if factors is not None:
        k = factors.shape[1]
        proj = rng.normal(size=(k, dim)).astype(np.float32)
        feats = feats * noise + factors[:n_items] @ proj
    feats /= np.linalg.norm(feats, axis=1, keepdims=True) + 1e-8
    return feats.astype(np.float32)
