"""Streaming KMV maintenance: exact convergence to the batch sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.kmv import (
    kmv_bottom_k,
    kmv_estimate,
    kmv_hash,
)
from procurement_data_pipeline_spark.sources.tables import load_table
from procurement_data_pipeline_spark.streaming.cardinality import (
    kmv_state_estimates,
    merge_kmv_state,
    stream_kmv_distinct,
)

SF_DIR = "/root/testdata/sf0.001"
K = 64


def _batch_truth(spark, src):
    """The sketch a one-shot batch job would compute over all data."""
    dh = src.select(F.col("event_type").alias("g"), kmv_hash("user_id").alias("h"))
    return (
        kmv_bottom_k(dh, ["g"], "h", K)
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"), F.max("h").alias("kth"))
        .select(
            "g",
            "n_kept",
            kmv_estimate(F.col("n_kept"), F.col("kth"), K).alias("est_distinct"),
        )
    )


def test_streamed_sketch_equals_batch_sketch_exactly(spark, tmp_path):
    """After two triggers over split halves, the maintained state must be
    BIT-IDENTICAL to the batch sketch over all data — mergeability plus
    the deterministic hash make streaming convergence exact, not
    approximate."""
    ev = load_table(spark, SF_DIR, "events").orderBy("event_id")
    total = ev.count()
    first, second = ev.limit(total // 2), ev.subtract(ev.limit(total // 2))

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    first.write.mode("append").parquet(src)
    stream_kmv_distinct(spark, src, state, ckpt, k=K)
    second.write.mode("append").parquet(src)
    stream_kmv_distinct(spark, src, state, ckpt, k=K)

    got = sorted(map(tuple, kmv_state_estimates(spark, state, K).collect()))
    want = sorted(
        map(tuple, _batch_truth(spark, spark.read.parquet(src)).collect())
    )
    assert got == want


def test_merge_replay_is_idempotent(spark, tmp_path):
    """Re-merging the same batch sketch leaves the state unchanged — the
    property that makes foreachBatch's at-least-once replay safe."""
    ev = load_table(spark, SF_DIR, "events")
    sk = kmv_bottom_k(
        ev.select(F.col("event_type").alias("g"), kmv_hash("user_id").alias("h")),
        ["g"],
        "h",
        K,
    )
    state = str(tmp_path / "state")
    merge_kmv_state(spark, state, sk, ["g"], K)
    once = sorted(map(tuple, spark.read.parquet(state).collect()))
    merge_kmv_state(spark, state, sk, ["g"], K)
    twice = sorted(map(tuple, spark.read.parquet(state).collect()))
    assert once == twice


def test_state_is_sketch_sized(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    sk = kmv_bottom_k(
        ev.select(F.col("event_type").alias("g"), kmv_hash("user_id").alias("h")),
        ["g"],
        "h",
        K,
    )
    state = str(tmp_path / "state")
    merge_kmv_state(spark, state, sk, ["g"], K)
    st = spark.read.parquet(state)
    n_groups = st.select("g").distinct().count()
    assert st.count() <= n_groups * K


def test_swap_crash_recovery_restores_parked_state(spark, tmp_path):
    """Simulate a trigger dying between 'park the live dir' and 'promote
    the replacement': the live state sits at __old, the live name is
    vacant. Readers and the next merge must restore it instead of
    silently restarting the sketch from empty."""
    import os

    ev = load_table(spark, SF_DIR, "events")
    sk = kmv_bottom_k(
        ev.select(F.col("event_type").alias("g"), kmv_hash("user_id").alias("h")),
        ["g"],
        "h",
        K,
    )
    state = str(tmp_path / "state")
    merge_kmv_state(spark, state, sk, ["g"], K)
    before = sorted(map(tuple, kmv_state_estimates(spark, state, K).collect()))

    os.rename(state, state + "__old")  # the crash window

    recovered = sorted(map(tuple, kmv_state_estimates(spark, state, K).collect()))
    assert recovered == before
    # and a subsequent merge keeps accumulating from the recovered state
    merge_kmv_state(spark, state, sk, ["g"], K)
    after = sorted(map(tuple, kmv_state_estimates(spark, state, K).collect()))
    assert after == before  # same batch re-merged: idempotent


def test_streamed_bloom_equals_batch_bloom_exactly(spark, tmp_path):
    """bit_or associativity: the OR-merged streamed filter must be
    word-for-word identical to a batch build over all data — and
    re-merging a batch must change nothing (idempotent OR)."""
    from procurement_data_pipeline_spark.operators.bloomjoin import bloom_build
    from procurement_data_pipeline_spark.streaming.cardinality import (
        load_bloom_state,
        merge_bloom_state,
        stream_bloom_filter,
    )

    ev = load_table(spark, SF_DIR, "events").orderBy("event_id")
    total = ev.count()
    first, second = ev.limit(total // 2), ev.subtract(ev.limit(total // 2))

    src = str(tmp_path / "src")
    state = str(tmp_path / "bloom_state")
    ckpt = str(tmp_path / "ckpt")

    first.write.mode("append").parquet(src)
    stream_bloom_filter(spark, src, state, ckpt, "user_id", num_bits=1 << 12)
    second.write.mode("append").parquet(src)
    stream_bloom_filter(spark, src, state, ckpt, "user_id", num_bits=1 << 12)

    streamed = load_bloom_state(spark, state)
    batch = bloom_build(spark.read.parquet(src), "user_id", num_bits=1 << 12)
    assert streamed == batch

    # replay idempotence
    merge_bloom_state(spark, state, batch)
    assert load_bloom_state(spark, state) == streamed


def test_bloom_state_shape_mismatch_raises(spark, tmp_path):
    import pytest

    from procurement_data_pipeline_spark.operators.bloomjoin import bloom_build
    from procurement_data_pipeline_spark.streaming.cardinality import (
        merge_bloom_state,
    )

    ev = load_table(spark, SF_DIR, "events")
    state = str(tmp_path / "bloom_state")
    merge_bloom_state(spark, state, bloom_build(ev, "user_id", num_bits=1 << 12))
    with pytest.raises(ValueError, match="shape mismatch"):
        merge_bloom_state(spark, state, bloom_build(ev, "user_id", num_bits=1 << 13))
