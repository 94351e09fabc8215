"""Bloom semi-join pruning and KMV bottom-k sketch contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.kmv import (
    hash_frac,
    kmv_bottom_k,
    kmv_estimate,
    kmv_hash,
)
from procurement_data_pipeline_spark.operators.bloomjoin import (
    bloom_build,
    bloom_fpp,
    bloom_might_contain,
    bloom_prune,
)


# ---------------------------------------------------------------- bloom


def test_bloom_no_false_negatives(spark):
    """Every build key must pass the probe test — the superset contract
    the graded query's exactness rests on."""
    build = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    bf = bloom_build(build, "k", num_bits=1 << 13)
    hits = build.filter(bloom_might_contain(F.col("k"), bf)).count()
    assert hits == 500


def test_bloom_fpp_near_theory(spark):
    """Non-member pass rate should sit near the theoretical FPP (within
    4x to absorb hash variance at these small sizes)."""
    n, m, k = 600, 1 << 13, 5
    build = spark.range(0, n).select(F.col("id").alias("k"))
    bf = bloom_build(build, "k", num_bits=m, num_hashes=k)
    probe = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    fp = probe.filter(bloom_might_contain(F.col("k"), bf)).count()
    rate = fp / 20_000
    theory = bloom_fpp(m, k, n)
    assert rate <= max(4 * theory, 0.005), (rate, theory)


def test_bloom_prune_superset_and_selective(spark, sf_dir):
    from procurement_data_pipeline_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, sf_dir, "lineitem")
    pruned = bloom_prune(li, "l_orderkey", orders, "o_orderkey")
    true_keys = {r[0] for r in orders.select("o_orderkey").distinct().collect()}
    li_total = li.count()
    pruned_rows = pruned.collect()
    # superset: every true-matching lineitem row survives
    true_match = li.join(
        orders.select("o_orderkey").distinct(),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_semi",
    ).count()
    assert len(pruned_rows) >= true_match
    # selective: prune must actually drop the non-matching bulk
    assert len(pruned_rows) < li_total
    # false-positive rows are rare at this sizing
    fp = sum(1 for r in pruned_rows if r["l_orderkey"] not in true_keys)
    assert fp / max(li_total, 1) < 0.01


def test_bloom_pruned_join_equals_plain_join(spark, sf_dir):
    """End-to-end exactness: bloom-pruned exact join == plain join."""
    from procurement_data_pipeline_spark.registry import load_all

    df = load_all()["lineitem_bloom_pruned_revenue"].builder(spark, sf_dir)
    from procurement_data_pipeline_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority", F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {(r["priority"], str(r["order_month"]), r["n_lines"]) for r in df.collect()}
    want = {
        (r["o_orderpriority"], str(r["m"])[:10], r["n"]) for r in plain.collect()
    }
    assert got == want


def test_bloom_probe_plan_is_scan_plus_filter(spark, sf_dir):
    """The probe side must stay a pure filter above the scan: no exchange,
    no join, no Python eval introduced by the membership test."""
    from procurement_data_pipeline_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").limit(200)
    li = load_table(spark, sf_dir, "lineitem")
    pruned = bloom_prune(li, "l_orderkey", orders, "o_orderkey", num_bits=1 << 12)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, f"probe plan contains {bad}:\n{plan}"


def test_bloom_build_validations(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bloom_build(df, "k", num_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        bloom_build(df, "k", num_hashes=0)


def test_bloom_null_keys_never_pass(spark):
    build = spark.range(5).select(F.col("id").alias("k"))
    bf = bloom_build(build, "k", num_bits=1 << 12)
    probe = spark.createDataFrame([(None,)], "k: bigint")
    assert probe.filter(bloom_might_contain(F.col("k"), bf)).count() == 0


# ---------------------------------------------------------------- kmv


def test_kmv_estimate_exact_below_k(spark):
    """Fewer than k distinct values → the sketch is the set, count exact."""
    df = spark.range(10).select(kmv_hash(F.col("id")).alias("h"), F.lit("g").alias("g"))
    sk = (
        kmv_bottom_k(df, ["g"], "h", 32)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("kth"))
        .select(kmv_estimate(F.col("n"), F.col("kth"), 32).alias("est"))
        .collect()
    )
    assert sk[0]["est"] == 10.0


def test_kmv_estimate_error_bound(spark):
    """Relative error of (k-1)/h_k concentrates around 1/sqrt(k-2); allow
    a generous 4-sigma band so the deterministic hash draw passes."""
    k = 64
    n = 5000
    df = spark.range(n).select(kmv_hash(F.col("id")).alias("h"), F.lit("g").alias("g"))
    row = (
        kmv_bottom_k(df, ["g"], "h", k)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("kth"))
        .select(kmv_estimate(F.col("n"), F.col("kth"), k).alias("est"))
        .collect()[0]
    )
    rel = abs(row["est"] - n) / n
    assert rel < 4 / (k - 2) ** 0.5, rel


def test_kmv_merge_equals_direct(spark):
    """Mergeability: bottom-k of (bottom-k(A) ∪ bottom-k(B)) == bottom-k
    of A∪B — the property that lets sketches build per-partition and
    per-day, then roll up."""
    a = spark.range(0, 800).select(kmv_hash(F.col("id")).alias("h"))
    b = spark.range(400, 1200).select(kmv_hash(F.col("id")).alias("h"))
    k = 48
    g = F.lit("g").alias("g")
    ska = kmv_bottom_k(a.select(g, "h"), ["g"], "h", k)
    skb = kmv_bottom_k(b.select(g, "h"), ["g"], "h", k)
    merged = kmv_bottom_k(ska.unionByName(skb), ["g"], "h", k)
    direct = kmv_bottom_k(
        a.unionByName(b).select(g, "h"), ["g"], "h", k
    )
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in direct.collect()
    )


def test_kmv_deterministic_rerun(spark, sf_dir):
    from procurement_data_pipeline_spark.registry import load_all

    b = load_all()["events_kmv_distinct_users"].builder
    r1 = sorted(map(tuple, b(spark, sf_dir).collect()))
    r2 = sorted(map(tuple, b(spark, sf_dir).collect()))
    assert r1 == r2


def test_kmv_overlap_estimates_calibrated(spark, sf_dir):
    """Jaccard/intersection estimates should land near truth on the
    events audiences (they overlap heavily, so the estimator is easy)."""
    from procurement_data_pipeline_spark.registry import load_all

    rows = load_all()["events_kmv_type_overlap"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["jaccard_est"] <= 1.0
        assert abs(r["jaccard_est"] - r["jaccard_true"]) < 0.35
        if r["union_true"] > 0:
            assert abs(r["inter_est"] - r["inter_true"]) / max(r["union_true"], 1) < 0.5


def test_hash_frac_in_unit_interval(spark):
    vals = (
        spark.range(50)
        .select(hash_frac(kmv_hash(F.col("id"))).alias("f"))
        .collect()
    )
    assert all(0.0 <= r["f"] < 1.0 for r in vals)
