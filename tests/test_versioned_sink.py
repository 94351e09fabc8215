"""Exactly-once streaming appends onto the versioned table format."""

from __future__ import annotations

from procurement_data_pipeline_spark.operators.versioning import (
    history,
    read_table,
    versioned_write,
)
from procurement_data_pipeline_spark.streaming.versioned_sink import (
    last_committed_batch,
    stream_to_versioned_table,
)


def _write_sources(spark, src):
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string").coalesce(
        1
    ).write.mode("append").parquet(src)
    spark.createDataFrame([(3, "c")], "id long, s string").coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _run(spark, src, table, ckpt):
    stream = (
        spark.readStream.schema("id long, s string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_to_versioned_table(stream, table, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_each_batch_is_one_version(spark, tmp_path):
    src, table = str(tmp_path / "src"), str(tmp_path / "tbl")
    _write_sources(spark, src)
    _run(spark, src, table, str(tmp_path / "ckpt"))
    assert _ids(read_table(spark, table)) == [1, 2, 3]
    hist = history(spark, table)
    assert [h["op"] for h in hist] == ["append", "append"]
    assert last_committed_batch(spark, table) == 1
    # every microbatch is a time-travel point
    assert len(_ids(read_table(spark, table, version=1))) == 1 or len(
        _ids(read_table(spark, table, version=1))
    ) == 2  # file order determines which batch came first
    assert _ids(read_table(spark, table, version=2)) == [1, 2, 3]


def test_replay_is_exactly_once(spark, tmp_path):
    src, table = str(tmp_path / "src"), str(tmp_path / "tbl")
    _write_sources(spark, src)
    _run(spark, src, table, str(tmp_path / "ckpt1"))
    before = _ids(read_table(spark, table))
    n_versions = len(history(spark, table))
    # a lost checkpoint replays every batch from scratch with the same
    # monotone ids — the at-least-once worst case; the sink must no-op
    _run(spark, src, table, str(tmp_path / "ckpt2"))
    assert _ids(read_table(spark, table)) == before
    assert len(history(spark, table)) == n_versions


def test_interleaved_batch_write_does_not_hide_stream_state(spark, tmp_path):
    src, table = str(tmp_path / "src"), str(tmp_path / "tbl")
    _write_sources(spark, src)
    _run(spark, src, table, str(tmp_path / "ckpt"))
    # a maintenance write (no stream_batch_id) lands on top
    extra_df = spark.createDataFrame([(9, "z")], "id long, s string")
    versioned_write(spark, extra_df, table, mode="append")
    assert last_committed_batch(spark, table) == 1  # scans past it
    # replayed stream still no-ops; the manual row survives
    _run(spark, src, table, str(tmp_path / "ckpt3"))
    assert _ids(read_table(spark, table)) == [1, 2, 3, 9]
