"""Structured Streaming SOURCE over the versioned table (VERDICT r10
item 3): spark.readStream.format("versioned_cdf") — offsets are table
versions, progress is the query's own checkpoint, changes are derived
from commit metadata (never a snapshot diff)."""

from __future__ import annotations

import os
import shutil

import pytest

from procurement_data_pipeline_spark.operators.cdf import table_changes
from procurement_data_pipeline_spark.operators.versioning import (
    merge_into,
    optimize_table,
    read_table,
    rollback,
    vacuum,
    versioned_write,
)
from procurement_data_pipeline_spark.streaming.versioned_source import (
    register_versioned_cdf_source,
)

_QN = 0


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, s string")


def _drain(spark, table, ckpt, name=None, **opts):
    """Run the stream availableNow into a memory sink; return its rows."""
    global _QN
    register_versioned_cdf_source(spark)
    if name is None:
        _QN += 1
        name = f"vsrc_{_QN}"
    reader = spark.readStream.format("versioned_cdf").option("tablePath", table)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        # drain every available micro-batch (rate limits => several)
        q.processAllAvailable()
    finally:
        exc = q.exception()
        q.stop()
        q.awaitTermination(60)
    if exc is not None:
        raise exc
    return name, spark.sql(f"SELECT * FROM {name}").collect()


def _drain_pq(spark, table, ckpt, outdir, **opts):
    """Like _drain but through a parquet sink — the memory sink cannot
    recover from a checkpoint, so resume tests need a real one."""
    register_versioned_cdf_source(spark)
    reader = spark.readStream.format("versioned_cdf").option("tablePath", table)
    for k, v in opts.items():
        reader = reader.option(k, v)
    feed = reader.load()
    q = (
        feed.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        exc = q.exception()
        q.stop()
        q.awaitTermination(60)
    if exc is not None:
        raise exc
    return spark.read.schema(feed.schema).parquet(outdir).collect()


def _events(rows):
    evs = [(r.id, r.s, r._change_type, r._commit_version) for r in rows]
    return sorted(
        evs, key=lambda e: (e[0] if e[0] is not None else -1,
                            e[1] or "", e[2], e[3])
    )


def test_stream_matches_batch_cdf_and_skips_optimize(spark, tmp_path):
    """Append + MOR-delete history: the stream's net content equals the
    batch table_changes feed and the table itself; an OPTIMIZE commit in
    the range emits nothing (content-identical rewrite)."""
    t = str(tmp_path / "t")
    versioned_write(spark, _df(spark, [(1, "a"), (2, "b")]), t)  # v1
    versioned_write(spark, _df(spark, [(3, "c")]), t)  # v2
    merge_into(  # v3: MOR delete id=2 — native delete row, no diff
        spark, t, spark.createDataFrame([(2,)], "id long"),
        key_col="id", when_matched="delete", strategy="merge-on-read",
    )
    optimize_table(spark, t)  # v4: dataChange=false — must emit nothing
    versioned_write(spark, _df(spark, [(4, "d")]), t)  # v5

    _, rows = _drain(spark, t, str(tmp_path / "ck"))
    assert _events(rows) == [
        (1, "a", "insert", 1),
        (2, None, "delete", 3),
        (2, "b", "insert", 1),
        (3, "c", "insert", 2),
        (4, "d", "insert", 5),
    ]
    # commit timestamps ride along and are non-decreasing by version
    by_v = sorted(
        {(r._commit_version, r._commit_timestamp) for r in rows}
    )
    assert all(ts is not None for _, ts in by_v)
    assert [ts for _, ts in by_v] == sorted(ts for _, ts in by_v)

    # net application (insert minus delete keys, per version order)
    live = {}
    for r in sorted(rows, key=lambda r: r._commit_version):
        if r._change_type == "insert":
            live[r.id] = r.s
        else:
            live.pop(r.id, None)
    table_rows = {
        r.id: r.s for r in read_table(spark, t).collect()
    }
    assert live == table_rows

    # batch CDF over the same pure-append prefix agrees (v1→v2 inserts)
    batch = table_changes(spark, t, from_version=1, to_version=2)
    assert sorted(r.new_id for r in batch.collect()) == [3]


def test_resume_from_checkpoint_is_exactly_once(spark, tmp_path):
    """Restarting with the SAME checkpoint consumes only versions
    committed after the first run — no replays, no gaps."""
    t = str(tmp_path / "t")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    versioned_write(spark, _df(spark, [(1, "a")]), t)  # v1
    versioned_write(spark, _df(spark, [(2, "b")]), t)  # v2
    rows = _drain_pq(spark, t, ck, out)
    assert _events(rows) == [
        (1, "a", "insert", 1),
        (2, "b", "insert", 2),
    ]
    versioned_write(spark, _df(spark, [(3, "c")]), t)  # v3 while down
    versioned_write(spark, _df(spark, [(4, "d")]), t)  # v4
    # same checkpoint, same sink: only the new versions arrive — the
    # accumulated output holds each row exactly once
    rows2 = _drain_pq(spark, t, ck, out)
    assert _events(rows2) == [
        (1, "a", "insert", 1),
        (2, "b", "insert", 2),
        (3, "c", "insert", 3),
        (4, "d", "insert", 4),
    ]


def test_bootstrap_survives_vacuumed_history_with_mor_mask(spark, tmp_path):
    """startingVersion=earliest on a table whose early versions were
    vacuumed: the initial snapshot reads the earliest RETAINED manifest —
    with live merge-on-read delete entries applied per file by birth
    scoping — then streams increments."""
    t = str(tmp_path / "t")
    versioned_write(spark, _df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    versioned_write(spark, _df(spark, [(4, "d")]), t)  # v2
    merge_into(  # v3: MOR delete id=2 (no rewrite — mask must apply)
        spark, t, spark.createDataFrame([(2,)], "id long"),
        key_col="id", when_matched="delete", strategy="merge-on-read",
    )
    vacuum(spark, t, keep_last=1)  # only v3 retained
    versioned_write(spark, _df(spark, [(5, "e")]), t)  # v4

    _, rows = _drain(spark, t, str(tmp_path / "ck"))
    assert _events(rows) == [
        (1, "a", "insert", 3),  # snapshot pinned at earliest retained v3
        (3, "c", "insert", 3),
        (4, "d", "insert", 3),
        (5, "e", "insert", 4),
    ]


def test_rate_limit_bounds_versions_per_batch(spark, tmp_path):
    """maxVersionsPerBatch splits a backlog into multiple micro-batches
    without losing or duplicating rows."""
    t = str(tmp_path / "t")
    for i in range(6):  # v1..v6
        versioned_write(spark, _df(spark, [(i, f"r{i}")]), t)
    name, rows = _drain(
        spark, t, str(tmp_path / "ck"), maxVersionsPerBatch="2"
    )
    assert _events(rows) == [
        (i, f"r{i}", "insert", i + 1) for i in range(6)
    ]
    # the availableNow run must have taken >= 3 batches (6 versions / 2)
    progress_dir = os.path.join(str(tmp_path / "ck"), "offsets")
    assert len(os.listdir(progress_dir)) >= 3


def test_mor_upsert_streams_delete_insert_pairs(spark, tmp_path):
    """A merge-on-read UPSERT commit streams its native change rows:
    delete (the entry keys) + insert (the appended update rows) at the
    same version — net application by key reproduces the table."""
    t = str(tmp_path / "t")
    versioned_write(spark, _df(spark, [(1, "a"), (2, "b")]), t)  # v1
    merge_into(  # v2: MOR upsert id=2 -> "B"
        spark, t, _df(spark, [(2, "B")]),
        key_col="id", when_matched="update", strategy="merge-on-read",
    )
    _, rows = _drain(spark, t, str(tmp_path / "ck"))
    assert _events(rows) == [
        (1, "a", "insert", 1),
        (2, None, "delete", 2),
        (2, "B", "insert", 2),
        (2, "b", "insert", 1),
    ]
    live = {}
    for r in sorted(
        rows, key=lambda r: (r._commit_version, r._change_type == "insert")
    ):  # within a version: delete before insert
        if r._change_type == "insert":
            live[r.id] = r.s
        else:
            live.pop(r.id, None)
    assert live == {1: "a", 2: "B"}


def test_cow_rewrites_raise_unless_ignore_changes(spark, tmp_path):
    """A copy-on-write merge (or rollback/overwrite) mid-range fails the
    stream with guidance by default; ignoreChanges=true emits the new
    files as inserts (Delta's documented caveat)."""
    t = str(tmp_path / "t")
    versioned_write(spark, _df(spark, [(1, "a"), (2, "b")]), t)  # v1
    merge_into(  # v2: COW update rewrites matched files
        spark, t, _df(spark, [(2, "B")]), key_col="id",
        when_matched="update",
    )
    with pytest.raises(Exception, match="copy-on-write merge"):
        _drain(spark, t, str(tmp_path / "ck1"))
    shutil.rmtree(str(tmp_path / "ck1"), ignore_errors=True)
    _, rows = _drain(
        spark, t, str(tmp_path / "ck2"), ignoreChanges="true"
    )
    # v1 snapshot + v2's rewritten file re-emitted as inserts
    assert (2, "B", "insert", 2) in _events(rows)
    assert (1, "a", "insert", 1) in _events(rows)
    # rollback also raises without the opt-in (start AT the rollback
    # commit so the COW merge at v2 is not what trips first)
    rollback(spark, t, 1)  # v3
    with pytest.raises(Exception, match="op='rollback'"):
        _drain(spark, t, str(tmp_path / "ck3"), startingVersion="3")


def test_starting_version_forms(spark, tmp_path):
    """startingVersion: integer N includes N's own changes (Delta's
    inclusive rule); 'latest' consumes only post-start commits."""
    t = str(tmp_path / "t")
    versioned_write(spark, _df(spark, [(1, "a")]), t)  # v1
    versioned_write(spark, _df(spark, [(2, "b")]), t)  # v2
    versioned_write(spark, _df(spark, [(3, "c")]), t)  # v3
    _, rows = _drain(
        spark, t, str(tmp_path / "ck1"), startingVersion="2"
    )
    assert _events(rows) == [
        (2, "b", "insert", 2),
        (3, "c", "insert", 3),
    ]
    ck2, out2 = str(tmp_path / "ck2"), str(tmp_path / "out2")
    rows = _drain_pq(spark, t, ck2, out2, startingVersion="latest")
    assert rows == []  # nothing after the stream's start yet
    versioned_write(spark, _df(spark, [(4, "d")]), t)  # v4
    rows = _drain_pq(spark, t, ck2, out2, startingVersion="latest")
    assert _events(rows) == [(4, "d", "insert", 4)]
