"""Join-strategy advisor: sketch-driven physical-join recommendations.

Catalyst picks join strategies from size ESTIMATES that go stale the
moment a filter or UDF intervenes, and AQE can only react to skew after
the shuffle has already materialized. This operator profiles an intended
join OFFLINE — the way a 100 TB pipeline tunes its recurring joins — and
recommends the physical strategy plus runtime-filter opportunity, using
the engine's own bounded-state primitives:

* cardinalities + key overlap from KMV bottom-k sketches (llm_ops/kmv):
  distinct keys per side, semi-join selectivity (what fraction of probe
  keys can match at all) — the number that justifies a Bloom prune;
* key skew from the space-saving sketch (llm_ops/sketch.frequent_items):
  the top key's frequency share — the number that justifies salting
  (operators/skew) before AQE has to split straggler partitions.

Every profiling structure is bounded (k sketch rows, capacity counters),
so the profile costs three bounded-output passes per side
(count, KMV sketch, skew sketch) and collects kilobytes — it
never materializes the join it is advising about.

Heuristics are deliberately simple and tunable; the value is that every
input is measured, not guessed. Advisory output (no oracle form): the
recommendations are pytest-verified against constructed workloads with
known right answers (small dim → broadcast; heavy key → salt; selective
build → bloom prune).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.kmv import (
    estimate_from_sketch,
    kmv_bottom_k,
    kmv_hash,
)
from procurement_data_pipeline_spark.llm_ops.sketch import frequent_items

BROADCAST_ROW_LIMIT = 5_000_000  # ~what fits a 10MB-ish broadcast of keys+payload
SKEW_SHARE_THRESHOLD = 0.2  # top key owning >20% of rows starves a shuffle
BLOOM_SELECTIVITY_THRESHOLD = 0.5  # <50% of probe keys can match → prune pays


@dataclass(frozen=True)
class JoinProfile:
    left_rows: int
    right_rows: int
    left_distinct_est: float
    right_distinct_est: float
    overlap_est: float  # estimated |keys(L) ∩ keys(R)|
    left_match_selectivity: float  # fraction of left keys that can match
    right_match_selectivity: float
    left_top_key_share: float  # top key's share of left ROWS
    right_top_key_share: float
    strategy: str  # broadcast_left | broadcast_right | shuffle | salted_shuffle
    bloom_prune: str  # none | prune_left | prune_right


def _kmv_one(df: DataFrame, key: str, k: int) -> DataFrame:
    return kmv_bottom_k(
        df.select(F.lit(1).alias("g"), kmv_hash(key).alias("h")), ["g"], "h", k
    ).select("h")


def _top_share(df: DataFrame, key: str, rows: int) -> float:
    if rows == 0:
        return 0.0
    top = frequent_items(df, key, k=1, capacity=256).collect()
    return (top[0]["count_hi"] / rows) if top else 0.0


def profile_join(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    k: int = 1024,
    broadcast_row_limit: int = BROADCAST_ROW_LIMIT,
    skew_share_threshold: float = SKEW_SHARE_THRESHOLD,
    bloom_selectivity_threshold: float = BLOOM_SELECTIVITY_THRESHOLD,
) -> JoinProfile:
    """Measure both sides and recommend a physical strategy.

    Thresholds are cluster-tuning knobs (defaults suit a large executor
    fleet); tests pin them to exercise each recommendation branch."""
    left_rows, right_rows = left.count(), right.count()
    lh = [r["h"] for r in _kmv_one(left, left_key, k).collect()]
    rh = [r["h"] for r in _kmv_one(right, right_key, k).collect()]
    l_est = estimate_from_sketch(len(lh), max(lh), k) if lh else 0.0
    r_est = estimate_from_sketch(len(rh), max(rh), k) if rh else 0.0
    # theta-style overlap: bottom-k of the union, membership from each side
    union_sorted = sorted(set(lh) | set(rh))[:k]
    n_u = len(union_sorted)
    u_est = estimate_from_sketch(n_u, union_sorted[-1], k) if n_u else 0.0
    ls, rs = set(lh), set(rh)
    both = sum(1 for h in union_sorted if h in ls and h in rs)
    jaccard = both / n_u if n_u else 0.0
    overlap = jaccard * u_est
    l_sel = min(overlap / l_est, 1.0) if l_est else 0.0
    r_sel = min(overlap / r_est, 1.0) if r_est else 0.0
    l_share = _top_share(left, left_key, left_rows)
    r_share = _top_share(right, right_key, right_rows)

    if right_rows <= broadcast_row_limit and right_rows <= left_rows:
        strategy = "broadcast_right"
    elif left_rows <= broadcast_row_limit:
        strategy = "broadcast_left"
    elif max(l_share, r_share) > skew_share_threshold:
        strategy = "salted_shuffle"
    else:
        strategy = "shuffle"

    # A Bloom prune pays when the BIGGER side would shuffle rows whose
    # keys the other side cannot match (and nothing is being broadcast —
    # a broadcast join already sees only matching rows at probe time).
    bloom = "none"
    if strategy in ("shuffle", "salted_shuffle"):
        if left_rows >= right_rows and l_sel < bloom_selectivity_threshold:
            bloom = "prune_left"
        elif right_rows > left_rows and r_sel < bloom_selectivity_threshold:
            bloom = "prune_right"

    return JoinProfile(
        left_rows=left_rows,
        right_rows=right_rows,
        left_distinct_est=l_est,
        right_distinct_est=r_est,
        overlap_est=overlap,
        left_match_selectivity=l_sel,
        right_match_selectivity=r_sel,
        left_top_key_share=l_share,
        right_top_key_share=r_share,
        strategy=strategy,
        bloom_prune=bloom,
    )
