"""Aggregate-navigator rewrite: rollup answers must equal direct fact
aggregation for every derivable kind, and non-derivable requests must be
rejected loudly (fallback-to-facts contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.operators.rollup_rewrite import (
    RollupMismatch,
    RollupSpec,
    build_rollup,
    answer_from_rollup,
)
from procurement_data_pipeline_spark.registry import load_all
from procurement_data_pipeline_spark.sources.tables import load_table

SPEC = RollupSpec(
    grain=("day", "event_type"),
    measures={
        "value": ("sum", "value_micros"),
        "n": ("count", "*"),
        "vmin": ("min", "value_micros"),
        "vmax": ("max", "value_micros"),
        "vavg": ("avg", "value_micros"),
    },
)


@pytest.fixture(scope="module")
def facts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("ts").cast("date").alias("day"),
        "event_type",
        F.floor(F.col("value") * 1_000_000).cast("long").alias("value_micros"),
    )


@pytest.fixture(scope="module")
def rollup(facts):
    df = build_rollup(facts, SPEC)
    df.persist().count()
    yield df
    df.unpersist()


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_rollup_answers_match_facts_at_coarser_grain(facts, rollup):
    got = answer_from_rollup(
        rollup,
        SPEC,
        ["event_type"],
        {
            "total": ("sum", "value"),
            "n": ("count", "n"),
            "lo": ("min", "vmin"),
            "hi": ("max", "vmax"),
            "mean": ("avg", "vavg"),
        },
    )
    want = facts.groupBy("event_type").agg(
        F.sum("value_micros").alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.min("value_micros").alias("lo"),
        F.max("value_micros").alias("hi"),
        (
            F.sum("value_micros").cast("double")
            / F.count(F.when(F.col("value_micros").isNotNull(), 1)).cast("double")
        ).alias("mean"),
    )
    assert _sorted_rows(got) == _sorted_rows(want)


def test_rollup_answers_match_with_grain_filter(facts, rollup):
    pred = F.col("day") >= F.lit("2024-01-15").cast("date")
    got = answer_from_rollup(
        rollup, SPEC, ["day"], {"total": ("sum", "value")}, grain_filter=pred
    )
    want = facts.filter(pred).groupBy("day").agg(F.sum("value_micros").alias("total"))
    assert _sorted_rows(got) == _sorted_rows(want)
    assert got.count() > 0  # the filter keeps data — non-vacuous


def test_rollup_never_scans_facts(spark, rollup, tmp_path):
    """The rewritten plan's ONLY scan is the materialized rollup — the
    fact table (events.parquet) never appears."""
    path = str(tmp_path / "rollup")
    rollup.write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    plan = answer_from_rollup(
        stored, SPEC, ["event_type"], {"n": ("count", "n")}
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "events.parquet" not in plan  # facts never scanned
    assert "n__count" in plan  # the scan reads the stored partials


def test_rejects_group_col_outside_grain(rollup):
    with pytest.raises(RollupMismatch, match="not in rollup grain"):
        answer_from_rollup(rollup, SPEC, ["user_id"], {"n": ("count", "n")})


def test_rejects_filter_on_non_grain_column(rollup):
    with pytest.raises(RollupMismatch, match="only grain columns"):
        answer_from_rollup(
            rollup,
            SPEC,
            ["event_type"],
            {"n": ("count", "n")},
            grain_filter=F.col("user_id") > 5,
        )


def test_rejects_underivable_measures(rollup):
    # avg requested but only a bare sum is stored
    with pytest.raises(RollupMismatch, match="needs the .sum, count. pair"):
        answer_from_rollup(rollup, SPEC, [], {"m": ("avg", "value")})
    # unknown measure
    with pytest.raises(RollupMismatch, match="not in rollup spec"):
        answer_from_rollup(rollup, SPEC, [], {"m": ("sum", "nope")})
    # holistic kind is not even a valid spec kind
    with pytest.raises(ValueError, match="unsupported kind"):
        RollupSpec(grain=("day",), measures={"u": ("count_distinct", "user_id")})


def test_sum_derivable_from_avg_pair(facts, rollup):
    got = answer_from_rollup(rollup, SPEC, [], {"total": ("sum", "vavg")})
    want = facts.agg(F.sum("value_micros").alias("total"))
    assert _sorted_rows(got) == _sorted_rows(want)


def test_interleaved_shuffle_round_robins_sources(spark, sf_dir):
    """Any global-order prefix sees per-source counts within 1 of each
    other until a source exhausts, and the ordering is deterministic."""
    q = load_all()["docs_interleaved_shuffle"]
    rows = sorted(
        ((r["global_pos"], r["source"]) for r in q.builder(spark, sf_dir).collect())
    )
    totals: dict[str, int] = {}
    for _, s in rows:
        totals[s] = totals.get(s, 0) + 1
    seen: dict[str, int] = dict.fromkeys(totals, 0)
    for pos, s in rows:
        seen[s] += 1
        live_min = min(
            seen[t] for t in totals if seen[t] < totals[t] or t == s
        )
        assert seen[s] - live_min <= 1  # round-robin fairness
    assert [p for p, _ in rows] == list(range(len(rows)))  # dense 0-based
    again = sorted(
        ((r["global_pos"], r["source"]) for r in q.builder(spark, sf_dir).collect())
    )
    assert again == rows  # deterministic
