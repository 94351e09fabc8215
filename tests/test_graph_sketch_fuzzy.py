"""Tests for the batch-6 operators: count-min sketch guarantees, fuzzy-join
losslessness vs the naive quadratic form, and PageRank structural invariants
(mass behavior, monotone centrality, integer determinism)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.sketch import (
    countmin_build,
    countmin_merge,
    countmin_query,
)
from procurement_data_pipeline_spark.operators.fuzzyjoin import (
    fuzzy_join,
    fuzzy_self_pairs,
)
from procurement_data_pipeline_spark.operators.graph import pagerank

# ------------------------------------------------------------- count-min


def _items_df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "item string")


def test_countmin_overestimates_only_and_tight_when_wide(spark):
    values = ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + ["d"]
    df = _items_df(spark, values)
    true = Counter(values)
    sketch = countmin_build(df, "item", width=64, depth=4)
    est = {
        r["item"]: r["est"]
        for r in countmin_query(sketch, df.distinct(), "item", width=64, depth=4).collect()
    }
    for v, t in true.items():
        assert est[v] >= t, (v, est[v], t)
    # 4 distinct items in 64x4 buckets: no collisions, estimates exact.
    assert est == dict(true)


def test_countmin_collisions_still_upper_bound(spark):
    # width=2 forces collisions; the one-sided guarantee must survive.
    values = [f"v{i}" for i in range(20)] * 3
    df = _items_df(spark, values)
    sketch = countmin_build(df, "item", width=2, depth=2)
    est = {
        r["item"]: r["est"]
        for r in countmin_query(sketch, df.distinct(), "item", width=2, depth=2).collect()
    }
    for v in set(values):
        assert est[v] >= 3


def test_countmin_merge_equals_direct(spark):
    a = _items_df(spark, ["x"] * 5 + ["y"] * 2)
    b = _items_df(spark, ["y"] * 4 + ["z"])
    merged = countmin_merge(
        countmin_build(a, "item", width=16, depth=3),
        countmin_build(b, "item", width=16, depth=3),
    )
    direct = countmin_build(a.unionByName(b), "item", width=16, depth=3)
    m = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    d = {(r["row"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert m == d


def test_countmin_depth_monotone(spark):
    # More hash rows can only lower (never raise) an estimate: the row set
    # of depth 2 is a prefix of depth 4 under the same seed scheme.
    values = [f"k{i % 7}" for i in range(200)]
    df = _items_df(spark, values)
    shallow = countmin_query(
        countmin_build(df, "item", width=4, depth=2), df.distinct(), "item", width=4, depth=2
    )
    deep = countmin_query(
        countmin_build(df, "item", width=4, depth=4), df.distinct(), "item", width=4, depth=4
    )
    s = {r["item"]: r["est"] for r in shallow.collect()}
    d = {r["item"]: r["est"] for r in deep.collect()}
    assert all(d[k] <= s[k] for k in s)


# ------------------------------------------------------------- fuzzy join


def test_fuzzy_self_pairs_equals_naive(spark):
    names = ["kitten", "sitting", "kitchen", "mitten", "bolt", "boat", "bat"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        (r["name_a"], r["name_b"]): r["edit_dist"]
        for r in fuzzy_self_pairs(df, "name", max_dist=2).collect()
    }
    # Naive quadratic truth via Spark's own levenshtein on a cross join.
    a = df.select(F.col("name").alias("na"))
    b = df.select(F.col("name").alias("nb"))
    naive = {
        (r["na"], r["nb"]): r["d"]
        for r in a.crossJoin(b)
        .filter(F.col("na") < F.col("nb"))
        .withColumn("d", F.levenshtein("na", "nb"))
        .filter(F.col("d") <= 2)
        .collect()
    }
    assert got == naive
    assert ("kitten", "mitten") in got and got[("kitten", "mitten")] == 1


def test_fuzzy_self_pairs_dedups_and_skips_null(spark):
    df = spark.createDataFrame(
        [("abc",), ("abc",), ("abd",), (None,)], "name string"
    )
    rows = fuzzy_self_pairs(df, "name", max_dist=1).collect()
    assert len(rows) == 1 and rows[0]["edit_dist"] == 1


def test_fuzzy_join_two_tables(spark):
    dirty = spark.createDataFrame(
        [(1, "blue boltt"), (2, "hot gearz"), (3, "unrelated")],
        "id long, name string",
    )
    clean = spark.createDataFrame(
        [("blue bolt",), ("hot gear",)], "ref string"
    )
    out = {
        (r["id"], r["matched_value"]): r["edit_dist"]
        for r in fuzzy_join(dirty, clean, "name", "ref", max_dist=2).collect()
    }
    assert out == {(1, "blue bolt"): 1, (2, "hot gear"): 1}


# -------------------------------------------------------------- pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, weight long")


def test_pagerank_symmetric_graph_uniform(spark):
    # A symmetric 3-cycle (both directions, equal weights): every node must
    # keep exactly the initial mass — rank update is lossless here because
    # each node's outflow is matched by equal inflow, and the integer
    # divisions are exact (1e6 * 1 / 2 and the 15/85 recombination).
    nodes = ["a", "b", "c"]
    rows = []
    for i, u in enumerate(nodes):
        for v in (nodes[(i + 1) % 3], nodes[(i + 2) % 3]):
            rows.append((u, v, 1))
    out = {r["node"]: r["rank_micros"] for r in pagerank(_edges(spark, rows), 3).collect()}
    assert out == {"a": 1_000_000, "b": 1_000_000, "c": 1_000_000}


def test_pagerank_hub_outranks_leaves(spark):
    # Star graph (undirected): the hub must end with strictly higher rank.
    rows = []
    for leaf in ["l1", "l2", "l3", "l4"]:
        rows.append(("hub", leaf, 1))
        rows.append((leaf, "hub", 1))
    out = {r["node"]: r["rank_micros"] for r in pagerank(_edges(spark, rows), 3).collect()}
    assert out["hub"] > out["l1"]
    assert len({out[leaf] for leaf in ["l1", "l2", "l3", "l4"]}) == 1


def test_pagerank_deterministic(spark):
    rows = [("a", "b", 2), ("b", "a", 2), ("b", "c", 1), ("c", "b", 1)]
    r1 = sorted(map(tuple, pagerank(_edges(spark, rows), 3).collect()))
    r2 = sorted(map(tuple, pagerank(_edges(spark, rows), 3).collect()))
    assert r1 == r2


def test_hard_negative_triplets_are_valid(spark, sf_dir):
    """Positive is same-label, negative different-label, both are the
    MOST similar of their pool (margin can be negative — that's what
    'hard' means), and singleton-label anchors surface NULL positives."""
    from procurement_data_pipeline_spark.registry import load_all

    rows = load_all()["emb_hard_negatives"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["negative_id"] is not None  # >1 label exists in the data
        assert -1.0 <= r["negative_score"] <= 1.0 + 1e-9
        if r["positive_id"] is None:
            assert r["margin"] is None  # singleton label: no triplet
        else:
            assert r["positive_id"] != r["query_id"]
            assert abs(r["margin"] - (r["positive_score"] - r["negative_score"])) < 1e-12
