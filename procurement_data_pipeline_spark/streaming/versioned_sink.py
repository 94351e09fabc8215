"""Exactly-once streaming appends onto the versioned table format.

``foreachBatch`` gives AT-LEAST-ONCE batch delivery: after a crash between
a sink write and the checkpoint commit, Structured Streaming re-runs the
same (batch_id, data). Plain parquet appends would duplicate those rows.
Landing each microbatch as a VERSION of operators/versioning.py's table
closes the gap with the classic idempotent-sink recipe:

* every committed version carries the STREAM IDENTITY (the checkpoint
  location — stable across restarts of the same query) plus the
  ``batch_id`` it came from, the Delta ``txnAppId``/``txnVersion`` recipe;
* a replayed batch is detected by ``batch_id <= max committed batch_id``
  FOR THE SAME stream identity (Structured Streaming batch ids are
  monotonically increasing per checkpoint, but reset to 0 under a NEW
  checkpoint) and skipped BEFORE any write — the replay is a no-op, so
  the table holds each batch exactly once;
* a DIFFERENT stream identity writing to an already-streamed table raises
  loudly instead of silently skipping its batches as "replays" — a
  restarted-with-fresh-checkpoint query or a second concurrent query must
  be an explicit operator decision (new table, or reuse the checkpoint),
  never quiet data loss;
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
_STREAM_ID_KEY = "stream_id"


class StreamIdentityError(RuntimeError):
    """A different stream identity (checkpoint location) is writing to a
    table another stream already committed to. Skipping would silently
    drop every batch (fresh checkpoints restart batch ids at 0); appending
    would duplicate under replay. The operator must choose: reuse the
    original checkpoint, or target a fresh table."""


def last_committed_batch(
    spark: SparkSession, table_path: str
) -> tuple[str | None, int] | None:
    """The newest committed ``(stream_id, batch_id)``, scanning manifests
    newest-first so interleaved NON-stream writes (compaction, rollback)
    don't hide it; returns None for a table no stream has written.
    ``stream_id`` is None only for pre-identity legacy manifests."""
    for v in reversed(_list_versions(spark, table_path)):
        man = _read_manifest(spark, table_path, v)
        if _STREAM_OP_KEY in man:
            return man.get(_STREAM_ID_KEY), man[_STREAM_OP_KEY]
    return None


def stream_to_versioned_table(
    stream: DataFrame, table_path: str, checkpoint_dir: str
):
    """Return a started-ready writeStream that appends each microbatch as
    one table version, exactly once under replay. Caller starts it with
    ``.trigger(...)``/``.start()`` of their choice via the returned
    DataStreamWriter."""
    stream_id = checkpoint_dir.rstrip("/")

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        last = last_committed_batch(spark, table_path)
        if last is not None:
            last_id, last_batch = last
            if last_id is not None and last_id != stream_id:
                raise StreamIdentityError(
                    f"table {table_path} was last streamed to by "
                    f"checkpoint {last_id!r}; this query uses "
                    f"{stream_id!r} — its batch ids are not comparable, "
                    "so neither skip nor append is safe"
                )
            if batch_id <= last_batch:
                return  # replayed batch: already a committed version
        versioned_write(
            spark,
            batch_df,
            table_path,
            mode="append",
            extra={_STREAM_OP_KEY: batch_id, _STREAM_ID_KEY: stream_id},
        )

    return stream.writeStream.foreachBatch(_commit).option(
        "checkpointLocation", checkpoint_dir
    )


__all__ = [
    "stream_to_versioned_table",
    "last_committed_batch",
    "StreamIdentityError",
]
