"""Cursor-committed CDF consumption: ranges, crash replay, no-op polls."""

from __future__ import annotations

import pytest

from procurement_data_pipeline_spark.operators.cdf_consumer import (
    consume_changes,
    read_cursor,
)
from procurement_data_pipeline_spark.operators.versioning import (
    merge_into,
    versioned_write,
)


def _df(spark, ids):
    return spark.createDataFrame([(i, f"r{i}") for i in ids], "id long, s string")


def test_consume_ranges_and_noop_polls(spark, tmp_path):
    t, cur = str(tmp_path / "tbl"), str(tmp_path / "cursor.json")
    versioned_write(spark, _df(spark, [1, 2]), t)
    versioned_write(spark, _df(spark, [3]), t)
    seen = []

    def handler(feed, from_v, to_v):
        seen.append((from_v, to_v, sorted(r["new_id"] for r in feed.collect())))

    a1 = consume_changes(spark, t, cur, handler)
    assert a1 == {"from_version": 0, "to_version": 2, "invoked": True}
    assert seen == [(0, 2, [1, 2, 3])]
    # nothing new → handler NOT invoked, cursor unchanged
    a2 = consume_changes(spark, t, cur, handler)
    assert a2["invoked"] is False and read_cursor(spark, cur) == 2
    assert len(seen) == 1
    # new appends present exactly the delta
    versioned_write(spark, _df(spark, [4, 5]), t)
    consume_changes(spark, t, cur, handler)
    assert seen[-1] == (2, 3, [4, 5])


def test_crash_before_cursor_advance_represents_range(spark, tmp_path):
    t, cur = str(tmp_path / "tbl"), str(tmp_path / "cursor.json")
    versioned_write(spark, _df(spark, [1]), t)

    def crashing(feed, from_v, to_v):
        feed.collect()
        raise RuntimeError("sink died mid-apply")

    with pytest.raises(RuntimeError):
        consume_changes(spark, t, cur, crashing)
    assert read_cursor(spark, cur) == 0  # unharmed — range will replay
    got = []
    consume_changes(spark, t, cur, lambda f, a, b: got.append((a, b, f.count())))
    assert got == [(0, 1, 1)]


def test_consume_rewrite_range_with_keys(spark, tmp_path):
    t, cur = str(tmp_path / "tbl"), str(tmp_path / "cursor.json")
    versioned_write(spark, _df(spark, [1, 2]), t)
    consume_changes(spark, t, cur, lambda f, a, b: None)
    merge_into(
        spark,
        t,
        spark.createDataFrame([(2,)], "id long"),
        key_col="id",
        when_matched="delete",
    )
    rows = []
    consume_changes(
        spark,
        t,
        cur,
        lambda f, a, b: rows.extend(f.collect()),
        key_cols=["id"],
    )
    assert [(r["id"], r["change_type"]) for r in rows] == [(2, "delete")]
