"""Tests for the sequence-pattern operators (operators/seqmatch.py) and the
pattern-batch analytics: hand fixtures with known session structure, plus
invariants on the new gap-fill / k-anonymity / concentration queries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.operators.seqmatch import (
    match_patterns,
    session_sequences,
    sessionize,
)

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    """rows: (event_id, user_id, minutes_offset, event_type)."""
    data = [
        (eid, uid, BASE + dt.timedelta(minutes=m), etype, None)
        for eid, uid, m, etype in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_sessionize_gap_splits_sessions(spark):
    ev = _ev(
        spark,
        [
            (1, 7, 0, "view"),
            (2, 7, 10, "click"),
            (3, 7, 100, "view"),  # 90-min gap -> new session
            (4, 8, 0, "signup"),
        ],
    )
    out = {
        (r["event_id"]): r["session_idx"]
        for r in sessionize(ev, gap_min=30).select("event_id", "session_idx").collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_session_sequences_order_and_alphabet(spark):
    # Same-timestamp tie broken by event_id; characters follow the alphabet.
    ev = _ev(
        spark,
        [
            (2, 7, 0, "click"),
            (1, 7, 0, "view"),
            (3, 7, 1, "purchase"),
            (4, 7, 2, "error"),
            (5, 7, 3, "unknown_type"),
        ],
    )
    seqs = session_sequences(ev, gap_min=30).collect()
    assert len(seqs) == 1
    assert seqs[0]["seq"] == "VCPEO"


def test_match_patterns_counts(spark):
    ev = _ev(
        spark,
        [
            # user 1: view -> click -> purchase (one session)
            (1, 1, 0, "view"),
            (2, 1, 1, "click"),
            (3, 1, 2, "purchase"),
            # user 2: bounce (single view)
            (4, 2, 0, "view"),
            # user 3: click click (burst), no purchase
            (5, 3, 0, "click"),
            (6, 3, 1, "click"),
        ],
    )
    sessions = session_sequences(ev, gap_min=30)
    got = {
        r["pattern"]: r["n_sessions"]
        for r in match_patterns(
            sessions,
            {"to_purchase": "V.*P", "burst": "CC", "bounce": "^.$"},
        ).collect()
    }
    assert got == {"to_purchase": 1, "burst": 1, "bounce": 1}


def test_transitions_probabilities_sum_to_one(spark):
    from procurement_data_pipeline_spark.registry import load_all

    spec = load_all()["events_type_transitions"]
    out = spec.builder(spark, "/root/testdata/sf0.001").collect()
    by_type: dict[str, float] = {}
    for r in out:
        by_type[r["event_type"]] = by_type.get(r["event_type"], 0.0) + r["p_transition"]
    assert by_type, "expected at least one transition"
    for etype, total in by_type.items():
        assert abs(total - 1.0) < 1e-9, (etype, total)


def test_gapfill_carries_last_purchase_forward(spark):
    ev = spark.createDataFrame(
        [
            (1, 5, BASE, "view", None),
            (2, 5, BASE + dt.timedelta(minutes=1), "purchase", 10.5),
            (3, 5, BASE + dt.timedelta(minutes=2), "click", 99.0),  # not a purchase
            (4, 5, BASE + dt.timedelta(minutes=3), "purchase", 20.0),
            (5, 5, BASE + dt.timedelta(minutes=4), "view", None),
        ],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pvalue = F.when(F.col("event_type") == "purchase", F.col("value"))
    out = {
        r["event_id"]: r["filled"]
        for r in ev.select(
            "event_id", F.last(pvalue, ignorenulls=True).over(w).alias("filled")
        ).collect()
    }
    assert out == {1: None, 2: 10.5, 3: 10.5, 4: 20.0, 5: 20.0}


def test_concentration_extremes(spark):
    """Monopoly -> HHI 1 and Gini near (n-1)/n-scaled max; perfect equality
    -> HHI 1/n and Gini 0."""
    from procurement_data_pipeline_spark.queries.patterns import (
        q_supplier_spend_concentration,
    )
    import tempfile

    def run(rows):
        with tempfile.TemporaryDirectory() as d:
            li = spark.createDataFrame(
                rows,
                "l_suppkey long, l_extendedprice double, l_discount double",
            )
            li.write.parquet(f"{d}/lineitem.parquet")
            return q_supplier_spend_concentration(spark, d).collect()[0]

    eq = run([(s, 100.0, 0.0) for s in range(1, 5)])
    assert eq["n_suppliers"] == 4
    assert abs(eq["hhi"] - 0.25) < 1e-12
    assert abs(eq["gini"]) < 1e-12
    assert abs(eq["cr4_share"] - 1.0) < 1e-12

    mono = run([(1, 1000.0, 0.0), (2, 0.01, 0.0), (3, 0.01, 0.0)])
    assert mono["hhi"] > 0.99
    assert mono["gini"] > 0.6
