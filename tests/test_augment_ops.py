"""As-of join, deterministic sampling, and set-op query tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.sampling import (
    fraction_threshold,
    hash_sample,
    split_train_eval,
    stratified_sample_n,
)
from procurement_data_pipeline_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2026-01-01T10:00:00"), 100.0),
            ("A", _ts("2026-01-01T10:00:05"), 101.0),
            ("A", _ts("2026-01-01T10:01:00"), 102.0),
            ("B", _ts("2026-01-01T10:00:02"), 50.0),
        ],
        "sym string, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            ("A", _ts("2026-01-01T10:00:03"), 10),  # after 10:00:00
            ("A", _ts("2026-01-01T10:00:05"), 20),  # tie → inclusive match
            ("A", _ts("2026-01-01T09:59:59"), 30),  # before any quote
            ("B", _ts("2026-01-01T10:30:00"), 40),  # stale match
            ("C", _ts("2026-01-01T10:00:00"), 50),  # key with no quotes
        ],
        "sym string, ts timestamp, qty int",
    )
    return quotes, trades


def test_asof_join_backward_inclusive(spark):
    quotes, trades = _frames(spark)
    got = {
        (r.sym, r.qty): (r.ts_asof, r.px_asof)
        for r in asof_join(
            trades, quotes, on="sym", ts_col="ts", value_cols=["px"]
        ).collect()
    }
    assert got[("A", 10)] == (_ts("2026-01-01T10:00:00"), 100.0)
    assert got[("A", 20)] == (_ts("2026-01-01T10:00:05"), 101.0)  # inclusive
    assert got[("A", 30)] == (None, None)  # nothing at-or-before
    assert got[("B", 40)] == (_ts("2026-01-01T10:00:02"), 50.0)
    assert got[("C", 50)] == (None, None)  # key absent from right
    assert len(got) == 5  # every left row survives


def test_asof_join_tolerance_nulls_stale_matches(spark):
    quotes, trades = _frames(spark)
    got = {
        (r.sym, r.qty): r.px_asof
        for r in asof_join(
            trades,
            quotes,
            on="sym",
            ts_col="ts",
            value_cols=["px"],
            tolerance_seconds=60,
        ).collect()
    }
    assert got[("A", 10)] == 100.0  # 3s old: fresh
    assert got[("B", 40)] is None  # ~30min old: nulled by tolerance


def test_hash_sample_deterministic_and_stable_under_growth(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    s1 = {r.k for r in hash_sample(df, "k", 0.2).collect()}
    s2 = {r.k for r in hash_sample(df, "k", 0.2).collect()}
    assert s1 == s2
    assert 0.1 < len(s1) / 2000 < 0.3  # ~binomial(2000, .2)
    # growth stability: the half-corpus sample is exactly the subset
    half = {r.k for r in hash_sample(df.filter("k < 1000"), "k", 0.2).collect()}
    assert half == {k for k in s1 if k < 1000}
    # independent draw under a different salt
    s3 = {r.k for r in hash_sample(df, "k", 0.2, salt="other").collect()}
    assert s3 != s1


def test_split_train_eval_disjoint_exhaustive(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    train, ev = split_train_eval(df, "k", 0.25)
    t = {r.k for r in train.collect()}
    e = {r.k for r in ev.collect()}
    assert t | e == set(range(1000)) and not (t & e)
    assert 0.15 < len(e) / 1000 < 0.35


def test_fraction_threshold_bounds():
    assert fraction_threshold(0.0) == "00000000"
    assert fraction_threshold(0.1) == "19999999"
    assert fraction_threshold(1.0) == "gggggggg"  # admits all hex prefixes


def test_stratified_sample_caps_each_stratum(spark):
    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, "k long, s string")
    got = stratified_sample_n(df, "s", "k", 10).groupBy("s").count().collect()
    counts = {r.s: r["count"] for r in got}
    assert counts == {"big": 10, "small": 3}
    # deterministic choice
    a = sorted(r.k for r in stratified_sample_n(df, "s", "k", 10).collect())
    b = sorted(r.k for r in stratified_sample_n(df, "s", "k", 10).collect())
    assert a == b


def test_range_join_inner_and_left(spark):
    from procurement_data_pipeline_spark.operators.rangejoin import range_join

    intervals = spark.createDataFrame(
        [
            (1, "u1", 100.0, 200.0),
            (2, "u1", 150.0, 250.0),  # overlaps interval 1
            (3, "u2", 0.0, 50.0),     # no points in range
        ],
        "iid int, k string, s double, e double",
    )
    points = spark.createDataFrame(
        [
            ("u1", 100.0),  # on start boundary of 1
            ("u1", 175.0),  # inside 1 AND 2
            ("u1", 250.0),  # on end boundary of 2
            ("u1", 300.0),  # outside all
            ("u2", 60.0),   # outside u2's interval
        ],
        "k string, t double",
    )
    inner = {
        (r.iid, r.t)
        for r in range_join(
            intervals, points, ["k"], "s", "e", "t", bucket_seconds=30
        ).collect()
    }
    # boundary-inclusive, overlapping intervals each match, one row per pair
    assert inner == {(1, 100.0), (1, 175.0), (2, 175.0), (2, 250.0)}

    left = range_join(
        intervals, points, ["k"], "s", "e", "t", bucket_seconds=30, how="left"
    ).collect()
    assert {(r.iid, r.t) for r in left} == inner | {(3, None)}


def test_range_join_bucket_width_invariance(spark):
    from procurement_data_pipeline_spark.operators.rangejoin import range_join

    intervals = spark.createDataFrame(
        [(i, "k", float(i * 7), float(i * 7 + 13)) for i in range(40)],
        "iid int, k string, s double, e double",
    )
    points = spark.createDataFrame(
        [("k", float(t * 3 + 1)) for t in range(100)], "k string, t double"
    )
    expected = None
    for w in (1, 5, 1000):  # widths spanning tiny → larger-than-any-interval
        got = sorted(
            (r.iid, r.t)
            for r in range_join(
                intervals, points, ["k"], "s", "e", "t", bucket_seconds=w
            ).collect()
        )
        if expected is None:
            expected = got
        assert got == expected, f"width {w} changed the result"
    assert len(expected) > 0


def test_set_op_cohorts_partition_supplier_space(spark, sf_dir):
    from procurement_data_pipeline_spark.queries.augment import q_supplier_cohorts
    from procurement_data_pipeline_spark.sources.tables import load_table

    got = {r.cohort: r.n_suppliers for r in q_supplier_cohorts(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    union_both_years = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_suppkey")
        .distinct()
        .count()
    )
    # retained + churned + new partitions the two-year supplier universe
    assert got["retained"] + got["churned"] + got["new"] == union_both_years


def test_funnel_walk_order_and_tie_semantics(spark):
    from procurement_data_pipeline_spark.operators.funnel import funnel_stages

    t = lambda s: dt.datetime.fromisoformat(f"2026-01-01T{s}")  # noqa: E731
    rows = [
        # u1: full funnel in order
        (1, "view", t("10:00:00")),
        (1, "click", t("10:05:00")),
        (1, "purchase", t("10:10:00")),
        # u2: click BEFORE view — click must not count; no second click
        (2, "click", t("09:00:00")),
        (2, "view", t("09:30:00")),
        # u3: equal-ts click with the view — strict ordering rejects it
        (3, "view", t("11:00:00")),
        (3, "click", t("11:00:00")),
        # u4: no funnel events at all
        (4, "error", t("12:00:00")),
        # u5: view then click (no purchase)
        (5, "view", t("08:00:00")),
        (5, "click", t("08:01:00")),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        r.stage: (r.stage_name, r.n_users)
        for r in funnel_stages(ev, ["view", "click", "purchase"]).collect()
    }
    # stage 1: u1, u2, u3, u5; stage 2: u1, u5; stage 3: u1
    assert got == {
        1: ("view", 4),
        2: ("click", 2),
        3: ("purchase", 1),
    }


def test_stratified_sample_tolerates_map_columns(spark):
    """Advice r9: the whole-row tie hash used xxhash64 over EVERY column;
    Spark rejects hash expressions over MapType (at any nesting depth), so
    a map column broke sampling outright. Maps are excluded from the tie
    hash — determinism still holds (remaining ties are full duplicates on
    every hashable field)."""
    rows = [(i % 3, f"k{i}", {"a": i}) for i in range(30)]
    df = spark.createDataFrame(rows, "s int, k string, m map<string,int>")
    got = stratified_sample_n(df, "s", "k", 5)
    counts = {r["s"]: r["count"] for r in got.groupBy("s").count().collect()}
    assert counts == {0: 5, 1: 5, 2: 5}
    a = sorted(r.k for r in stratified_sample_n(df, "s", "k", 5).collect())
    b = sorted(r.k for r in stratified_sample_n(df, "s", "k", 5).collect())
    assert a == b
