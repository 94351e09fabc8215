"""Cursor-committed CDF consumption: incremental downstream refreshes.

``table_changes`` (operators/cdf.py) answers "what changed between two
versions"; a real consumer also has to REMEMBER where it left off, survive
crashes, and never skip or double-apply a range. This module is that
consumer harness:

* the cursor (last fully-processed version) lives in its own one-file
  atomic store, advanced only AFTER the handler returns — a crash
  anywhere re-presents the same range on the next call (at-least-once);
* handlers that are idempotent per range (overwrite-by-range, merge by
  key, versioned-table appends keyed by source version) therefore get
  exactly-once end-to-end — the same contract foreachBatch gives
  streaming sinks, here for table-to-table maintenance;
* each call processes the range (cursor, latest] in ONE handler
  invocation, so the downstream sees consistent version boundaries, never
  a torn prefix of somebody's commit.

This is the missing half of incremental view maintenance: ivm.py reacts
to raw parquet appends; this consumer reacts to VERSIONED tables,
including merges and deletes (the handler receives the full changelog
with change_type), at whatever cadence the caller polls.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from procurement_data_pipeline_spark.operators.cdf import table_changes
from procurement_data_pipeline_spark.operators.erasure import (
    _fs_path,
    _read_text,
    _write_text,
)
from procurement_data_pipeline_spark.operators.versioning import (
    latest_version,
)


def read_cursor(spark: SparkSession, cursor_path: str) -> int:
    """Last fully-processed version; 0 before the first successful run."""
    fs, p, _ = _fs_path(spark, cursor_path)
    if not fs.exists(p):
        return 0
    return int(json.loads(_read_text(spark, cursor_path))["version"])


def _advance_cursor(spark: SparkSession, cursor_path: str, version: int) -> None:
    # one small file, written via create-then-rename so a crash mid-write
    # never leaves a torn cursor under the live name
    tmp = cursor_path + ".tmp"
    _write_text(spark, tmp, json.dumps({"version": version}))
    fs, p, jvm = _fs_path(spark, cursor_path)
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp_p, p):
        raise IOError(f"could not advance cursor at {cursor_path}")


def consume_changes(
    spark: SparkSession,
    table_path: str,
    cursor_path: str,
    handler: Callable[[DataFrame, int, int], None],
    key_cols: list[str] | None = None,
) -> dict:
    """Present the changelog (cursor, latest] to ``handler`` once, then
    advance the cursor. Returns an audit dict; a no-op poll (nothing new)
    never invokes the handler. ``handler(feed, from_v, to_v)`` gets the
    snapshot_diff-shaped feed plus the version boundaries so idempotent
    sinks can key on them."""
    cursor = read_cursor(spark, cursor_path)
    latest = latest_version(spark, table_path)
    if latest is None or latest <= cursor:
        return {"from_version": cursor, "to_version": cursor, "invoked": False}
    feed = table_changes(
        spark, table_path, from_version=cursor, to_version=latest, key_cols=key_cols
    )
    handler(feed, cursor, latest)
    # the commit point: only a fully-handled range advances the cursor
    _advance_cursor(spark, cursor_path, latest)
    return {"from_version": cursor, "to_version": latest, "invoked": True}


__all__ = ["consume_changes", "read_cursor"]
