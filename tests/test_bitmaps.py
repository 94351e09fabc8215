"""Packed-bitmap audience analytics: bitmap counts must equal exact
set-based truth (the whole point of the encoding is exactness without
COUNT(DISTINCT) shuffles)."""

from __future__ import annotations

import duckdb

from procurement_data_pipeline_spark.registry import load_all


def _events(sf_dir: str):
    return f"'{sf_dir}/events.parquet'"


def test_segment_overlap_equals_exact_sets(spark, sf_dir):
    rows = load_all()["events_segment_bitmap_overlap"].builder(spark, sf_dir).collect()
    assert rows
    truth = {}
    for et, uid in duckdb.sql(
        f"SELECT DISTINCT event_type, user_id FROM {_events(sf_dir)}"
    ).fetchall():
        truth.setdefault(et, set()).add(uid)
    seen_pairs = set()
    for r in rows:
        a, b = truth[r["type_a"]], truth[r["type_b"]]
        assert r["type_a"] < r["type_b"]
        assert r["users_a"] == len(a)
        assert r["users_b"] == len(b)
        assert r["common_users"] == len(a & b)
        assert r["union_users"] == len(a | b)
        assert r["jaccard"] == len(a & b) / len(a | b)
        seen_pairs.add((r["type_a"], r["type_b"]))
    n_types = len(truth)
    assert len(seen_pairs) == n_types * (n_types - 1) // 2


def test_retention_equals_exact_day_sets(spark, sf_dir):
    rows = load_all()["events_retention_bitmap"].builder(spark, sf_dir).collect()
    assert rows
    days = {}
    for day, uid in duckdb.sql(
        f"SELECT DISTINCT CAST(ts AS DATE), user_id FROM {_events(sf_dir)}"
    ).fetchall():
        days.setdefault(day, set()).add(uid)
    by_day = {r["day"]: r for r in rows}
    import datetime

    for day, r in by_day.items():
        cur = days[day]
        nxt = days[day + datetime.timedelta(days=1)]
        assert r["dau"] == len(cur)
        assert r["dau_next"] == len(nxt)
        assert r["retained"] == len(cur & nxt)
        assert r["retention_rate"] == len(cur & nxt) / len(cur)
    # every day with a successor day is present
    expected_days = {d for d in days if d + datetime.timedelta(days=1) in days}
    assert set(by_day) == expected_days


def test_triple_intersections_equal_exact_sets(spark, sf_dir):
    rows = load_all()["events_segment_bitmap_triple"].builder(spark, sf_dir).collect()
    assert rows
    truth = {}
    for et, uid in duckdb.sql(
        f"SELECT DISTINCT event_type, user_id FROM {_events(sf_dir)}"
    ).fetchall():
        truth.setdefault(et, set()).add(uid)
    from itertools import combinations

    expected_triples = set(combinations(sorted(truth), 3))
    seen = set()
    for r in rows:
        t = (r["type_a"], r["type_b"], r["type_c"])
        assert t[0] < t[1] < t[2]
        assert r["common_users"] == len(truth[t[0]] & truth[t[1]] & truth[t[2]])
        seen.add(t)
    assert seen == expected_triples
