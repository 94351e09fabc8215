"""Streaming Croston state must equal the batch fold BIT-FOR-BIT."""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.registry import load_all
from procurement_data_pipeline_spark.sources.tables import load_table
from procurement_data_pipeline_spark.streaming.forecast_state import (
    streaming_croston,
)

SF_DIR = "/root/testdata/sf0.001"


def _daily(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("partkey"),
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("epoch_day"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))


def test_streaming_croston_equals_batch_fold(spark, tmp_path):
    """Two day-ordered microbatches through the stateful fold: the final
    emitted row per part carries EXACTLY the batch query's doubles —
    smoothing is a left fold, so state continuation across the trigger
    boundary must be invisible."""
    daily = _daily(spark)
    mid = daily.agg(
        ((F.min("epoch_day") + F.max("epoch_day")) / 2).cast("long")
    ).collect()[0][0]
    src = str(tmp_path / "daily_src")
    daily.filter(F.col("epoch_day") <= mid).coalesce(1).write.mode("append").parquet(src)
    daily.filter(F.col("epoch_day") > mid).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("partkey long, epoch_day long, qty long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_croston(stream)
        .writeStream.format("memory")
        .queryName("croston_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits one row per key per trigger; keep the last (highest
    # n_demand_days) per part
    emitted = spark.sql(
        """
        SELECT * FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY partkey
                                       ORDER BY n_demand_days DESC) AS rn
          FROM croston_stream
        ) WHERE rn = 1
        """
    ).collect()
    got = {
        r["partkey"]: (
            r["n_demand_days"],
            r["smoothed_qty"],
            r["smoothed_gap"],
            r["croston_rate"],
        )
        for r in emitted
    }
    batch = load_all()["part_croston_forecast"].builder(spark, SF_DIR).collect()
    want = {
        r["partkey"]: (
            r["n_demand_days"],
            r["smoothed_qty"],
            r["smoothed_gap"],
            r["croston_rate"],
        )
        for r in batch
    }
    assert got == want  # exact doubles — no tolerance
