"""Streaming-semantics pins: left-outer stream-stream NULL emission after
watermark expiry, and watermark late-data dropping — the two subtle
Structured Streaming behaviors the engine's streaming layer depends on.

Both tests drive the file source batch-by-batch (one file per trigger)
across restarts of the same checkpoint, which is how watermark advancement
interleaves with emission in production micro-batching. The sink is a
parquet directory (the memory sink cannot recover a checkpoint), so the
rows a run emitted are the difference of the accumulated output."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.streaming.pipeline import (
    click_attribution_join,
    hourly_rollup,
    read_event_stream,
    stream_to_warehouse,
)


def _write_events(spark, path: str, rows: list[tuple]) -> None:
    """rows: (event_id, ts, user_id, event_type, value)."""
    df = spark.createDataFrame(
        [(i, t, u, ty, v, "{}") for i, t, u, ty, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _t(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m)


def _drain(spark, build, out: str, ckpt: str) -> list:
    stream_to_warehouse(build(), out, ckpt)
    try:
        return spark.read.parquet(out).collect()
    except Exception:  # noqa: BLE001 — no output yet (nothing emitted)
        return []


def test_left_outer_stream_join_emits_null_after_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def build():
        stream = read_event_stream(spark, src, max_files_per_trigger=1)
        purchases = stream.where(F.col("event_type") == "purchase")
        clicks = stream.where(F.col("event_type") == "click")
        return click_attribution_join(
            purchases, clicks, join_type="left_outer"
        )

    # Batch 1: user 1 converts with a click; user 2 converts with none.
    _write_events(
        spark,
        src,
        [
            (1, _t(11, 30), 1, "click", 1.0),
            (2, _t(12, 0), 1, "purchase", 9.0),
            (3, _t(12, 0), 2, "purchase", 9.0),
        ],
    )
    rows1 = _drain(spark, build, out, ckpt)
    matched = {(r.purchase_id, r.click_ts is None) for r in rows1}
    assert (2, False) in matched  # inner match emits immediately
    assert not any(r.purchase_id == 3 for r in rows1)  # NULL row held back

    # Batches 2-3: the GLOBAL watermark is the min over both sides' event
    # time, and each side only sees its own filtered rows — so the
    # advancing traffic must contain BOTH new clicks and new purchases
    # (a 'view' would advance neither). The trailing file gives the
    # post-advance trigger in which the NULL row emits.
    _write_events(
        spark,
        src,
        [(4, _t(16, 0), 8, "click", 0.0), (5, _t(16, 5), 9, "purchase", 1.0)],
    )
    _write_events(
        spark,
        src,
        [(6, _t(17, 0), 8, "click", 0.0), (7, _t(17, 5), 9, "purchase", 1.0)],
    )
    rows2 = _drain(spark, build, out, ckpt)
    null_rows = [r for r in rows2 if r.purchase_id == 3]
    assert len(null_rows) == 1
    assert null_rows[0].click_ts is None
    assert null_rows[0].user_id == 2
    # The matched pair from run 1 must NOT re-emit (checkpointed state):
    # exactly one accumulated row for purchase 2 across both runs.
    assert sum(1 for r in rows2 if r.purchase_id == 2) == 1


def test_watermark_drops_late_events_from_rollup(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def build():
        stream = read_event_stream(spark, src, max_files_per_trigger=1)
        return hourly_rollup(stream)

    # Batches: two 10:xx events, then a 13:30 event (advances watermark to
    # 11:30 > window end 11:00, closing hour 10).
    _write_events(
        spark,
        src,
        [(1, _t(10, 0), 1, "view", 1.0), (2, _t(10, 30), 2, "view", 1.0)],
    )
    _write_events(spark, src, [(3, _t(13, 30), 3, "view", 1.0)])
    rows1 = _drain(spark, build, out, ckpt)
    hour10 = [r for r in rows1 if r.hour_start == _t(10, 0)]
    assert len(hour10) == 1 and hour10[0].n_events == 2

    # A LATE 10:15 event now arrives (watermark 11:30 ⇒ dropped), plus a
    # closer at 18:00 so every remaining window finalizes.
    _write_events(spark, src, [(4, _t(10, 15), 4, "view", 1.0)])
    _write_events(spark, src, [(5, _t(18, 0), 5, "view", 1.0)])
    rows2 = _drain(spark, build, out, ckpt)
    # Hour 10 must NOT re-emit with the late event folded in: still
    # exactly one accumulated row, still counting 2.
    hour10b = [r for r in rows2 if r.hour_start == _t(10, 0)]
    assert len(hour10b) == 1 and hour10b[0].n_events == 2
    # The batch layer (no watermark) counts 3 for hour 10 — the delta IS
    # the documented watermark trade, made visible.
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("win.start") == _t(10, 0))
        .collect()
    )
    assert batch[0].n == 3


class _FakeQuery:
    """Duck-typed StreamingQuery for _await_drained unit tests: scripted
    (status, lastProgress) per poll; records when stop() was called."""

    def __init__(self, script):
        self._script = script  # list of (status_dict, last_progress)
        self._i = 0
        self.stopped_at = None

    def awaitTermination(self, _timeout):
        if self._i < len(self._script) - 1:
            self._i += 1
        return False

    @property
    def status(self):
        return self._script[self._i][0]

    @property
    def lastProgress(self):
        return self._script[self._i][1]

    def stop(self):
        self.stopped_at = self._i


def test_await_drained_does_not_stop_on_initializing_status(spark):
    """Advice r9: Spark's INITIAL status is isDataAvailable=False AND
    isTriggerActive=False ('Initializing sources') — identical to the
    drained signature. A slow source init must NOT be stopped with zero
    batches; the idle signal only counts after a committed trigger, held
    across two consecutive polls."""
    from procurement_data_pipeline_spark.streaming.pipeline import (
        _await_drained,
    )

    init = {"isDataAvailable": False, "isTriggerActive": False,
            "message": "Initializing sources"}
    busy = {"isDataAvailable": True, "isTriggerActive": True,
            "message": "Processing"}
    gap = {"isDataAvailable": False, "isTriggerActive": False,
           "message": "Waiting for data to arrive"}
    prog = {"batchId": 0}
    # polls 0-2: initializing with NO committed trigger (lastProgress None)
    # poll 3: processing; polls 4-5: idle after a commit → drain on 5
    q = _FakeQuery(
        [(init, None), (init, None), (init, None),
         (busy, prog), (gap, prog), (gap, prog), (gap, prog)]
    )
    _await_drained(q, timeout_sec=60, what="fake")
    assert q.stopped_at == 5  # two consecutive idle polls AFTER the commit


def test_await_drained_requires_two_consecutive_idle_polls(spark):
    """A single between-trigger idle poll (committed, but more data is
    coming) must not end the drain."""
    from procurement_data_pipeline_spark.streaming.pipeline import (
        _await_drained,
    )

    busy = {"isDataAvailable": True, "isTriggerActive": True, "message": ""}
    gap = {"isDataAvailable": False, "isTriggerActive": False, "message": ""}
    prog = {"batchId": 1}
    q = _FakeQuery(
        [(busy, prog), (gap, prog), (busy, prog), (gap, prog), (gap, prog)]
    )
    _await_drained(q, timeout_sec=60, what="fake")
    assert q.stopped_at == 4  # the lone idle poll at index 1 did not stop it
