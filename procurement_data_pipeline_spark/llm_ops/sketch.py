"""Frequency sketches — heavy hitters without shuffling the whole domain.

Exact top-k token counting shuffles one (item, partial_count) pair per
distinct item per partition. That is the right plan while the domain fits
the shuffle (vocabularies, event types); when the domain is effectively
unbounded at 100 TB (raw URLs, user agents, n-grams), the shuffle itself
becomes the bottleneck. :func:`frequent_items` bounds it with the
space-saving (Metwally et al.) sketch:

* each partition keeps at most ``capacity`` counters, evicting the minimum
  and inheriting its count as the new item's overcount bound — classic
  space-saving, applied to the Arrow batch stream of ONE partition inside
  ``mapInPandas`` (the driver never sees raw items);
* each partition emits ≤ ``capacity`` (item, cnt, err, pmin) rows — the
  shuffle is ``partitions × capacity`` rows, independent of domain size;
* the merge follows the mergeable-summaries bound (Agarwal et al.): for a
  partition where an item IS in the table, its true local count lies in
  ``[cnt − err, cnt]``; for a partition where it is ABSENT, it lies in
  ``[0, pmin]`` (pmin = that partition's minimum counter, 0 if the table
  never filled — an absent item in a non-full table truly never appeared).
  Hence per item:
      count_lo = Σ_present (cnt − err)
      count_hi = Σ_present cnt + (Σ_all pmin − Σ_present pmin)

Guarantee (verified in tests under forced evictions): every item with true
global frequency > Σ_all pmin + n/capacity-ish slack is present, and
``count_lo ≤ true ≤ count_hi`` for every reported item.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_items(
    df: DataFrame, col: str, k: int = 20, capacity: int = 256
) -> DataFrame:
    """Approximate top-``k`` most frequent values of ``col``.

    Output: (item, count_hi, count_lo) sorted by the merged raw count —
    count_hi/count_lo are rigorous upper/lower bounds on the true count
    (see module docstring).
    ``capacity`` controls both accuracy (per-partition error ≤ local_n /
    capacity) and the per-partition state/shuffle size. Ties break on the
    item value for determinism of the reported set.
    """
    if capacity < k:
        raise ValueError(f"capacity {capacity} must be ≥ k {k}")

    def space_saving(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        errs: dict = {}
        filled = False
        for pdf in batches:
            # Pre-aggregate the Arrow batch (C-speed hash count) and apply
            # WEIGHTED space-saving updates over distinct values only — the
            # Python loop runs O(distinct-per-batch) times, not O(rows).
            # Weighted updates preserve the classic bounds: an inserted
            # item's true-so-far count is ≥ its batch weight w
            # (= cnt − err) and ≤ inherited_min + w (= cnt).
            vc = pdf[col].value_counts()  # dropna=True skips NULLs
            # Heaviest first shrinks eviction churn; (−w, value) ordering
            # keeps the eviction sequence deterministic under ties.
            for v, w in sorted(vc.items(), key=lambda kv: (-kv[1], kv[0])):
                w = int(w)
                if v in counts:
                    counts[v] += w
                elif len(counts) < capacity:
                    counts[v] = w
                    errs[v] = 0
                else:
                    # evict the minimum counter; the newcomer inherits its
                    # count as the overcount bound
                    filled = True
                    evict = min(counts, key=lambda x: (counts[x], str(x)))
                    inherited = counts.pop(evict)
                    errs.pop(evict)
                    counts[v] = inherited + w
                    errs[v] = inherited
        if counts:
            # pmin: upper bound on any ABSENT item's local count — the
            # minimum retained counter once eviction has happened, else 0.
            pmin = min(counts.values()) if filled else 0
            # pid only distinguishes partitions in the merge; it does not
            # affect any count, so a random id keeps results deterministic.
            pid = uuid.uuid4().hex
            yield pd.DataFrame(
                {
                    "pid": pid,
                    "item": list(counts.keys()),
                    "cnt": list(counts.values()),
                    "err": [errs[x] for x in counts],
                    "pmin": pmin,
                }
            )

    from procurement_data_pipeline_spark.caching import scoped_persist

    # The partials feed TWO consumers (the Σpmin scalar and the per-item
    # merge); persist so the full-input space-saving pass runs ONCE — and so
    # both consumers see the SAME partition outputs, which the count_hi
    # bound's Σpmin bookkeeping relies on.
    partials = scoped_persist(
        df.select(F.col(col).cast("string").alias(col)).mapInPandas(
            space_saving, "pid string, item string, cnt long, err long, pmin long"
        )
    )
    # Σ pmin over ALL partitions — a 1-row scalar broadcast (the allowlisted
    # pattern), joined onto the per-item merge to price absent partitions.
    total_min = partials.select("pid", "pmin").distinct().agg(
        F.coalesce(F.sum("pmin"), F.lit(0)).alias("_total_min")
    )
    merged = (
        partials.groupBy("item")
        .agg(
            F.sum("cnt").alias("_cnt"),
            F.sum(F.col("cnt") - F.col("err")).alias("count_lo"),
            F.sum("pmin").alias("_pmin_present"),
        )
        .crossJoin(F.broadcast(total_min))
        .select(
            "item",
            "_cnt",
            (F.col("_cnt") + F.col("_total_min") - F.col("_pmin_present")).alias(
                "count_hi"
            ),
            "count_lo",
        )
    )
    # Rank by the merged raw count (the usual estimator) — ranking by
    # count_hi would favor items whose bound is loose because they were
    # absent from many partitions, not items that are actually frequent.
    return (
        merged.orderBy(F.col("_cnt").desc(), F.col("item").asc())
        .limit(k)
        .select("item", "count_hi", "count_lo")
    )


def _cm_bucket(col: str | F.Column, row: int, seed: int, width: int) -> F.Column:
    """Row ``row``'s bucket for an item: xxhash64(item, row, seed) mod width.
    xxhash64 is a JVM codegen expression — the whole sketch build stays
    inside whole-stage codegen, no Python anywhere."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c, F.lit(row), F.lit(seed)), F.lit(width))


def _cm_rb_pairs(col: str, width: int, depth: int, seed: int) -> F.Column:
    """Exploded (row, bucket) struct column for one item — THE shared
    addressing expression of build and query: a hashing-scheme change in
    one but not the other would silently desynchronize every estimate
    (code-review r8: this block used to exist as two verbatim copies)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    _cm_bucket(col, r, seed, width).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    )


def countmin_build(
    df: DataFrame, col: str, width: int = 1024, depth: int = 4, seed: int = 42
) -> DataFrame:
    """Build a count-min sketch (Cormode & Muthukrishnan) of ``col``.

    Returns the sketch as a DataFrame of (row, bucket, cnt) — at most
    ``depth × width`` rows regardless of input size or domain, the
    fixed-size frequency summary that complements space-saving: space-saving
    answers "what are the heavy items", count-min answers "how often did
    item X occur" for ANY x, with one-sided error.

    Scale shape: each input row expands to ``depth`` (row, bucket) pairs
    map-side and partial-aggregates before the single shuffle, so the
    exchange carries ≤ partitions × depth × width rows — domain-independent,
    same bound class as the space-saving shuffle. Merging sketches of two
    datasets is a union + re-sum (tested exact).
    """
    pairs = df.filter(F.col(col).isNotNull()).select(
        _cm_rb_pairs(col, width, depth, seed).alias("rb")
    )
    return (
        pairs.select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (width, depth, seed)."""
    return (
        a.unionByName(b).groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
    )


def countmin_query(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Point-frequency estimates for ``items[col]``: est = min over rows of
    the item's bucket counter. Returns (item, est) with the count-min
    guarantee est ≥ true count, and est ≤ true + ε·N with probability
    1−(1/2)^depth for width ≈ 2/ε (public CM bounds).

    The sketch side is ≤ depth×width rows — broadcast; the items side
    explodes to ``depth`` rows each, LEFT-joins (an empty bucket means the
    hash row never saw the item: counter 0), and takes the per-item min.
    """
    probes = items.filter(F.col(col).isNotNull()).select(
        F.col(col).alias("item"),
        _cm_rb_pairs(col, width, depth, seed).alias("rb"),
    ).select("item", "rb.row", "rb.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy("item")
        .agg(F.min("cnt").alias("est"))
    )


__all__ = ["frequent_items", "countmin_build", "countmin_merge", "countmin_query"]
