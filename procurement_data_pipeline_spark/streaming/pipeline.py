"""Structured Streaming analogues of the batch event analytics.

The reference is batch-only (SURVEY.md §2.9); these operators extend the
engine to streams using the standard Spark constructs: file/parquet sources,
event-time watermarks, tumbling windows, streaming dedup, and session
windows. Each transformation is a pure DataFrame→DataFrame function, so the
SAME code serves ``readStream`` (incremental) and ``read`` (backfill) — the
classic Lambda-free pattern.

Tests run them with ``trigger(availableNow=True)`` against a parquet
directory and assert equality with the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.session import configure_runtime

EVENTS_STREAM_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over an events directory (exactly-once per file)."""
    configure_runtime(spark)
    reader = spark.readStream.format(fmt).schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time window counts per type.

    With a watermark the state store evicts windows older than the horizon —
    bounded state at any scale; late rows beyond it are dropped (the
    documented trade)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias(
                "value_micros"
            ),
        )
        .select(
            F.col("win.start").alias("hour_start"),
            "event_type",
            "n_events",
            (F.col("value_micros").cast("double") / F.lit(1000000.0)).alias(
                "total_value"
            ),
        )
    )


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exactly-once-per-event_id dedup with bounded state
    (dropDuplicatesWithinWatermark evicts ids older than the horizon)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time session windows per user (built-in session_window — the
    stateful operator the batch sessionization query mirrors)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


def click_attribution_join(
    purchases: DataFrame,
    clicks: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    join_type: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: each purchase pairs with the
    same user's clicks inside its lookback window — the streaming analogue
    of the batch ``events_click_attribution`` range join.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so the state store provably evicts rows older than
    watermark + lookback — bounded state forever, the requirement for any
    stream-stream join at scale. Default inner join: zero-click purchases
    surface when the aggregation layer counts. ``join_type='left_outer'``
    emits the NULL-click row for an unmatched purchase once the watermark
    proves no matching click can still arrive (NULL rows appear in a
    trigger AFTER the watermark passes the join window — the documented
    outer stream-stream latency; tests/test_streaming_semantics.py pins
    this behavior)."""
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    return p.join(
        c,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        join_type,
    ).select("purchase_id", "user_id", "purchase_ts", "click_ts")



def _await_drained(
    q, timeout_sec: int, what: str, stop_on_state_cleanup: bool = False
) -> None:
    """Wait until the query TERMINATES or is provably DRAINED; raise on a
    genuine timeout (code-review r8: the unchecked awaitTermination let a
    timed-out drain hand the caller PARTIAL output as success).

    Completion signals beyond termination, because termination alone is
    not reliable: status reporting no available data AND no active
    trigger is completion (the sink holds the full output).

    ``stop_on_state_cleanup`` additionally accepts "No new data but
    cleaning up state" — the post-drain trigger of a stateful query —
    as completion. That is ONLY safe when the caller KNOWS the cleanup
    trigger emits nothing (applyInPandasWithState with NoTimeout: no
    state can time out, so nothing new reaches the sink); for a
    watermarked APPEND-mode aggregation the cleanup trigger is exactly
    what emits the final closed windows, and stopping early would
    truncate the result. Under heavy ambient load that cleanup's
    state-store commit was measured grinding for minutes — the flag
    exists so NoTimeout callers don't race the machine's weather."""
    import time

    deadline = time.time() + timeout_sec
    idle_streak = 0
    while True:
        if q.awaitTermination(5):
            return
        st = q.status
        no_data = not st.get("isDataAvailable", True)
        idle = not st.get("isTriggerActive", True)
        cleanup = stop_on_state_cleanup and no_data and (
            "cleaning up state" in st.get("message", "")
        )
        # isDataAvailable=False + isTriggerActive=False is ALSO Spark's
        # initial status ("Initializing sources") and the between-trigger
        # gap — a query whose source init or batch planning outlasts the
        # first 5s poll would be stopped with zero/partial batches, the
        # exact partial-output-as-success failure this helper prevents
        # (advice r9). Only trust the idle signal after at least one
        # COMMITTED trigger, and require it to hold across two
        # consecutive polls so a between-trigger gap can't masquerade
        # as a drain.
        committed = q.lastProgress is not None
        if committed and no_data and (idle or cleanup):
            idle_streak += 1
            if cleanup or idle_streak >= 2:
                q.stop()
                return
        else:
            idle_streak = 0
        if time.time() >= deadline:
            q.stop()
            raise TimeoutError(
                f"{what} did not drain within {timeout_sec}s - partial "
                "output discarded; raise timeout_sec or shrink the backlog"
            )


def run_to_completion(
    stream_df: DataFrame,
    checkpoint_dir: str,
    query_name: str = "stream",
    output_mode: str = "append",
    timeout_sec: int = 600,
    stop_on_state_cleanup: bool = False,
) -> list:
    """Drain a stream with availableNow into an in-memory sink and return
    the rows (test/backfill helper; production would writeStream to parquet
    or a table with the same checkpointing). ``stop_on_state_cleanup``:
    see :func:`_await_drained` — pass True ONLY for stateful queries whose
    post-drain cleanup trigger provably emits nothing (NoTimeout)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(
        q,
        timeout_sec,
        f"memory-sink stream {query_name!r}",
        stop_on_state_cleanup=stop_on_state_cleanup,
    )
    spark = stream_df.sparkSession
    rows = spark.table(query_name).collect()
    q.stop()
    return rows


def stream_to_warehouse(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_col: str | None = None,
    timeout_sec: int = 600,
) -> None:
    """Drain a stream into partitioned warehouse parquet (availableNow).

    The file sink + checkpoint give exactly-once output across restarts:
    re-running with the same checkpoint processes only unseen source files,
    so a crashed/retried ingest never duplicates rows — the streaming
    analogue of the batch layer's dynamic-partition-overwrite idempotency.
    """
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    q = writer.start()
    _await_drained(q, timeout_sec, f"warehouse stream to {path}")
    q.stop()


def stream_incremental_rollup(
    spark: SparkSession,
    fact_path: str,
    rollup_fn,
    rollup_path: str,
    partition_col: str,
    checkpoint_dir: str,
    fact_date_col: str = "ts",
    timeout_sec: int = 600,
    schema: str = EVENTS_STREAM_SCHEMA,
) -> None:
    """Streaming-maintained rollup: watch the fact directory as a stream and
    refresh ONLY the rollup partitions each microbatch touches.

    Composition of the two incremental layers: the file-source stream +
    checkpoint decide WHAT is new (exactly-once file tracking), and
    ``operators/incremental.incremental_refresh`` decides HOW to fold it in
    (recompute the affected dates from the fact store, dynamic-partition-
    overwrite them). foreachBatch is at-least-once on retry — safe here by
    construction, because the refresh recomputes affected dates from the
    STORE, not from the batch: replaying a batch rewrites the same
    partitions byte-for-byte instead of double-counting. Cost per trigger
    is O(dates touched by the new files), never O(history).
    """
    from procurement_data_pipeline_spark.operators.incremental import (
        incremental_refresh,
    )

    # The file-source stream needs an explicit schema; pass the fact
    # table's schema for non-events directories — an explicit-schema file
    # source silently back-fills NULL for missing columns, so a schema
    # mismatch would otherwise disable the refresh without an error.
    configure_runtime(spark)
    stream = spark.readStream.format("parquet").schema(schema).load(fact_path)

    def _refresh(batch_df: DataFrame, _batch_id: int) -> None:
        # NULL fact timestamps would str() into the literal 'None' and
        # send incremental_refresh chasing a bogus partition directory
        # every trigger (code-review r8) — they belong to no partition
        dates = [
            str(r[0])
            for r in batch_df.filter(F.col(fact_date_col).isNotNull())
            .select(F.col(fact_date_col).cast("date").cast("string"))
            .distinct()
            .collect()
            if r[0] is not None
        ]
        if not dates:
            return
        incremental_refresh(
            spark,
            spark.read.parquet(fact_path),
            rollup_fn,
            rollup_path,
            partition_col,
            sorted(dates),
            fact_date_col=fact_date_col,
        )

    q = (
        stream.writeStream.foreachBatch(_refresh)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, timeout_sec, "foreachBatch stream")
    q.stop()


def stream_countmin(
    spark: SparkSession,
    source_path: str,
    col: str,
    store_path: str,
    checkpoint_dir: str,
    schema: str = EVENTS_STREAM_SCHEMA,
    width: int = 1024,
    depth: int = 4,
    seed: int = 42,
    timeout_sec: int = 600,
) -> None:
    """Streaming-maintained count-min sketch: each microbatch's partial
    sketch lands under ``store_path/batch_id=<id>`` (dynamic overwrite of
    exactly that partition), and :func:`read_countmin_store` merges the
    partials on read.

    Replay safety by LAYOUT, the same device as the streaming rollup: the
    file-source checkpoint decides WHAT is new; a replayed foreachBatch
    rewrites its own batch_id partition byte-for-byte instead of
    double-counting — at-least-once execution, exactly-once counts. Each
    partial is ≤ depth × width rows regardless of batch size, so the store
    grows by a bounded increment per trigger; a compaction pass (re-sum to
    one partition) is a metadata-cheap maintenance job when trigger counts
    grow large.
    """
    from procurement_data_pipeline_spark.llm_ops.sketch import countmin_build

    configure_runtime(spark)
    stream = spark.readStream.format("parquet").schema(schema).load(source_path)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        partial = countmin_build(batch_df, col, width=width, depth=depth, seed=seed)
        (
            partial.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(store_path)
        )

    q = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, timeout_sec, "foreachBatch stream")
    q.stop()


def read_countmin_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Merge the per-batch count-min partials into one sketch (row, bucket,
    cnt) — the read-side half of :func:`stream_countmin`. Exact: count-min
    merge is a plain re-sum, so the streamed store equals a direct batch
    build over everything ingested (pytest-pinned)."""
    return (
        spark.read.parquet(store_path)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
