"""Tests for the trend batch: streaks vs a Python gaps-and-islands replay,
growth lag identities, and substitution band membership."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.queries.trend import (
    q_events_activity_streaks,
    q_orders_monthly_growth,
    q_part_substitution_candidates,
)
from procurement_data_pipeline_spark.sources.tables import load_table


def test_streaks_match_python_replay(spark, sf_dir):
    rows = {r.user_id: r for r in q_events_activity_streaks(spark, sf_dir).collect()}
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .collect()
    )
    by_user = defaultdict(set)
    for e in ev:
        by_user[e.user_id].add(e.day)
    for uid, days in by_user.items():
        ordered = sorted(days)
        streaks = []
        cur = 1
        for prev, nxt in zip(ordered, ordered[1:]):
            if (nxt - prev).days == 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        r = rows[uid]
        assert r.n_active_days == len(days)
        assert r.n_streaks == len(streaks)
        assert r.longest_streak == max(streaks)
        assert r.current_streak == streaks[-1]


def test_monthly_growth_lag_identity(spark, sf_dir):
    rows = sorted(
        q_orders_monthly_growth(spark, sf_dir).collect(),
        key=lambda r: (r.yr, r.mon),
    )
    assert rows
    rev = {(r.yr, r.mon): round(r.revenue * 100) for r in rows}
    keys = [(r.yr, r.mon) for r in rows]
    for i, r in enumerate(rows):
        if i == 0:
            assert r.mom_pct is None
        else:
            prev = rev[keys[i - 1]]
            assert abs(r.mom_pct - (rev[keys[i]] - prev) / prev) < 1e-9
        if i < 12:
            assert r.yoy_pct is None


def test_substitution_band_membership(spark, sf_dir):
    rows = q_part_substitution_candidates(spark, sf_dir).collect()
    parts = {
        p.p_partkey: p for p in load_table(spark, sf_dir, "part").collect()
    }
    for r in rows:
        a, b = parts[r.part_a], parts[r.part_b]
        assert (a.p_type, a.p_size) == (b.p_type, b.p_size) == (
            r.part_type,
            r.part_size,
        )
        assert a.p_brand != b.p_brand
        ca, cb = int(a.p_retailprice * 100 // 1), int(b.p_retailprice * 100 // 1)
        assert 20 * abs(ca - cb) <= min(ca, cb)
        assert r.rel_spread <= 0.05 + 1e-12
    spreads = [r.rel_spread for r in rows]
    assert spreads == sorted(spreads)
