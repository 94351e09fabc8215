"""Exactly-once streaming appends onto the versioned table format.

``foreachBatch`` gives AT-LEAST-ONCE batch delivery: after a crash between
a sink write and the checkpoint commit, Structured Streaming re-runs the
same (batch_id, data). Plain parquet appends would duplicate those rows.
Landing each microbatch as a VERSION of operators/versioning.py's table
closes the gap with the classic idempotent-sink recipe:

* every committed version carries the ``batch_id`` it came from;
* a replayed batch is detected by ``batch_id <= max committed batch_id``
  (Structured Streaming batch ids are monotonically increasing per query)
  and skipped BEFORE any write — the replay is a no-op, so the table holds
  each batch exactly once;
* the version publish is atomic (create-no-overwrite manifest rename), so
  the failure window "data written, manifest missing" leaves an invisible
  orphan the next replay supersedes — identical to the batch-writer story.

Bonus the plain-parquet sink can't offer: every microbatch is a time-
travel point. ``read_table(path, version=k)`` reproduces the table as of
any past trigger — reprocessing audits without any reprocessing.

100 TB shape: per trigger this is one manifest read (the latest), one
append of the batch's files, one manifest publish — O(batch), never
O(table). The monotone batch-id check reads ONE small JSON, not history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from procurement_data_pipeline_spark.operators.versioning import (
    _list_versions,
    _read_manifest,
    versioned_write,
)

_STREAM_OP_KEY = "stream_batch_id"


def last_committed_batch(spark: SparkSession, table_path: str) -> int | None:
    """The newest committed stream batch id, scanning manifests newest-
    first so interleaved NON-stream writes (compaction, rollback) don't
    hide it; returns None for a fresh table."""
    for v in reversed(_list_versions(spark, table_path)):
        man = _read_manifest(spark, table_path, v)
        if _STREAM_OP_KEY in man:
            return man[_STREAM_OP_KEY]
    return None


def stream_to_versioned_table(
    stream: DataFrame, table_path: str, checkpoint_dir: str
):
    """Return a started-ready writeStream that appends each microbatch as
    one table version, exactly once under replay. Caller starts it with
    ``.trigger(...)``/``.start()`` of their choice via the returned
    DataStreamWriter."""

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        last = last_committed_batch(spark, table_path)
        if last is not None and batch_id <= last:
            return  # replayed batch: already a committed version
        versioned_write(
            spark,
            batch_df,
            table_path,
            mode="append",
            extra={_STREAM_OP_KEY: batch_id},
        )

    return stream.writeStream.foreachBatch(_commit).option(
        "checkpointLocation", checkpoint_dir
    )


__all__ = ["stream_to_versioned_table", "last_committed_batch"]
