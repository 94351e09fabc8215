"""Streaming-maintained incremental rollup: the file-source checkpoint
tracks WHAT is new; incremental_refresh folds it in at O(affected dates).
Asserts convergence to the batch recompute after multi-trigger ingest and
idempotence of a replayed trigger."""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.operators.incremental import verify_incremental
from procurement_data_pipeline_spark.sources.tables import load_table
from procurement_data_pipeline_spark.streaming.pipeline import (
    stream_incremental_rollup,
)

SF_DIR = "/root/testdata/sf0.001"


def _daily_rollup(facts):
    return facts.groupBy(
        F.col("ts").cast("date").cast("string").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias("value_micros"),
    )


def test_stream_incremental_rollup_converges_and_is_idempotent(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").orderBy("event_id")
    total = ev.count()
    first, second = ev.limit(total // 2), ev.subtract(ev.limit(total // 2))

    fact_dir = str(tmp_path / "facts")
    rollup_dir = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    # Trigger 1: first half of the stream lands, rollup reflects it.
    first.write.mode("append").parquet(fact_dir)
    stream_incremental_rollup(
        spark, fact_dir, _daily_rollup, rollup_dir, "day", ckpt
    )
    audit1 = verify_incremental(
        spark, spark.read.parquet(fact_dir), _daily_rollup, rollup_dir, "day"
    )
    assert audit1.count() == 0, audit1.collect()[:5]

    # Trigger 2: the rest arrives (overlapping dates!) — only affected
    # partitions are rewritten, and they must now include BOTH halves.
    second.write.mode("append").parquet(fact_dir)
    stream_incremental_rollup(
        spark, fact_dir, _daily_rollup, rollup_dir, "day", ckpt
    )
    stored = spark.read.parquet(rollup_dir)
    expected = _daily_rollup(spark.read.parquet(fact_dir))
    assert stored.count() == expected.count()
    audit2 = verify_incremental(
        spark, spark.read.parquet(fact_dir), _daily_rollup, rollup_dir, "day"
    )
    assert audit2.count() == 0, audit2.collect()[:5]

    # Trigger 3: nothing new — the checkpoint sees no files, the rollup
    # stays byte-identical (idempotent maintenance).
    before = sorted(map(tuple, stored.collect()))
    stream_incremental_rollup(
        spark, fact_dir, _daily_rollup, rollup_dir, "day", ckpt
    )
    after = sorted(map(tuple, spark.read.parquet(rollup_dir).collect()))
    assert after == before


def test_streaming_scd2_closed_intervals_match_batch(spark, tmp_path):
    """Two time-ordered microbatches through the stateful SCD2: every
    CLOSED interval must equal the batch builder's non-current rows —
    state carries open runs across the trigger boundary."""
    from procurement_data_pipeline_spark.registry import load_all
    from procurement_data_pipeline_spark.streaming.pipeline import (
        read_event_stream,
        run_to_completion,
    )
    from procurement_data_pipeline_spark.streaming.stateful import streaming_scd2

    ev = load_table(spark, SF_DIR, "events")
    mid = ev.agg(
        (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2
    ).collect()[0][0]
    src = str(tmp_path / "events_src")
    # Two files, split by event time: per-user order holds across triggers.
    ev.filter(F.unix_micros("ts") <= mid).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    ev.filter(F.unix_micros("ts") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    got = run_to_completion(
        streaming_scd2(stream),
        str(tmp_path / "ckpt_scd2"),
        query_name="scd2_stream",
        output_mode="append",
    )
    got_closed = {
        (r.user_id, r.version): (r.event_type, r.valid_from_us, r.valid_to_us, r.n_events)
        for r in got
    }
    batch = load_all()["events_user_state_scd2"].builder(spark, SF_DIR)
    want_closed = {
        (r["user_id"], r["version"]): (
            r["event_type"],
            r["valid_from_us"],
            r["valid_to_us"],
            r["n_events"],
        )
        for r in batch.collect()
        if r["is_current"] == 0
    }
    assert got_closed == want_closed
    assert len(got_closed) > 0
