"""Streaming rate-spike monitor must equal the batch query BIT-FOR-BIT."""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.registry import load_all
from procurement_data_pipeline_spark.sources.tables import load_table
from procurement_data_pipeline_spark.streaming.spikes import streaming_rate_spikes

SF_DIR = "/root/testdata/sf0.001"


def _hourly(spark):
    ev = load_table(spark, SF_DIR, "events")
    return ev.groupBy(
        "event_type",
        F.hour("ts").cast("long").alias("hr"),
        F.datediff(
            F.date_trunc("day", F.col("ts")).cast("date"),
            F.lit("1970-01-01").cast("date"),
        )
        .cast("long")
        .alias("epoch_day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))


def test_streaming_spikes_equal_batch(spark, tmp_path):
    """Two day-ordered microbatches through the stateful baseline: the
    emitted spike set must match events_rate_spikes row-for-row with
    identical integers and ratios — the 7-slot state must survive the
    trigger boundary invisibly."""
    hourly = _hourly(spark)
    mid = hourly.agg(
        ((F.min("epoch_day") + F.max("epoch_day")) / 2).cast("long")
    ).collect()[0][0]
    src = str(tmp_path / "hourly_src")
    hourly.filter(F.col("epoch_day") <= mid).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    hourly.filter(F.col("epoch_day") > mid).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(
            "event_type string, hr long, epoch_day long, n_events long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_rate_spikes(stream)
        .writeStream.format("memory")
        .queryName("spike_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["event_type"], r["epoch_day"], r["hr"]): r
        for r in spark.sql("SELECT * FROM spike_stream").collect()
    }
    epoch = F.lit("1970-01-01").cast("date")
    batch = {
        (r["event_type"], r["epoch_day"], r["hr"]): r
        for r in load_all()["events_rate_spikes"]
        .builder(spark, SF_DIR)
        .withColumn("epoch_day", F.datediff(F.col("day"), epoch).cast("long"))
        .collect()
    }
    assert set(streamed) == set(batch)
    for k, s in streamed.items():
        b = batch[k]
        assert s["n_events"] == b["n_events"]
        assert s["baseline_median"] == b["baseline_median"]
        assert s["spike_ratio"] == b["spike_ratio"]
