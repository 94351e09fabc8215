"""Join-strategy advisor: each recommendation branch on a workload with a
known right answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.operators.joinplanner import profile_join


def test_small_dim_recommends_broadcast(spark):
    fact = spark.range(0, 20_000).select((F.col("id") % 100).alias("k"))
    dim = spark.range(0, 100).select(F.col("id").alias("k"))
    p = profile_join(fact, "k", dim, "k", broadcast_row_limit=1000)
    assert p.strategy == "broadcast_right"
    assert p.bloom_prune == "none"  # broadcast probe already skips non-matches


def test_skewed_key_recommends_salting(spark):
    # 80% of fact rows share one key; both sides too big to broadcast
    fact = spark.range(0, 10_000).select(
        F.when(F.col("id") % 5 < 4, 7).otherwise(F.col("id")).alias("k")
    )
    other = spark.range(0, 10_000).select(F.col("id").alias("k"))
    p = profile_join(
        fact, "k", other, "k", broadcast_row_limit=100, skew_share_threshold=0.2
    )
    assert p.strategy == "salted_shuffle"
    assert p.left_top_key_share > 0.5


def test_selective_build_recommends_bloom_prune(spark):
    # only 5% of probe keys exist on the build side
    probe = spark.range(0, 50_000).select(F.col("id").alias("k"))
    build = spark.range(0, 2_500).select(F.col("id").alias("k"))
    p = profile_join(
        probe, "k", build, "k", broadcast_row_limit=100, bloom_selectivity_threshold=0.5
    )
    assert p.strategy == "shuffle"
    assert p.bloom_prune == "prune_left"
    assert p.left_match_selectivity < 0.2


def test_balanced_join_recommends_plain_shuffle(spark):
    a = spark.range(0, 30_000).select(F.col("id").alias("k"))
    b = spark.range(0, 30_000).select(F.col("id").alias("k"))
    p = profile_join(a, "k", b, "k", broadcast_row_limit=100)
    assert p.strategy == "shuffle"
    assert p.bloom_prune == "none"  # full overlap: pruning drops nothing
    assert p.left_match_selectivity > 0.8


def test_cardinality_estimates_are_sane(spark):
    a = spark.range(0, 8_000).select(F.col("id").alias("k"))
    b = spark.range(4_000, 12_000).select(F.col("id").alias("k"))
    p = profile_join(a, "k", b, "k", broadcast_row_limit=100)
    assert abs(p.left_distinct_est - 8_000) / 8_000 < 0.3
    assert abs(p.right_distinct_est - 8_000) / 8_000 < 0.3
    # true overlap 4k of 12k union
    assert 0.15 < p.overlap_est / 12_000 < 0.55
