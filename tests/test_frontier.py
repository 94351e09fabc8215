"""Tests for the frontier batch: skyline vs a brute-force domination scan,
mode vs Counter, and bridge-term conservation."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.queries.frontier import (
    q_events_type_mode_per_user,
    q_orders_revenue_bridge,
    q_part_price_size_skyline,
)
from procurement_data_pipeline_spark.sources.tables import load_table


def test_skyline_matches_bruteforce_domination(spark, sf_dir):
    rows = q_part_price_size_skyline(spark, sf_dir).collect()
    parts = [
        (int(p.p_retailprice * 100 // 1), p.p_size, p.p_partkey)
        for p in load_table(spark, sf_dir, "part").collect()
    ]
    expected = set()
    for price, size, key in parts:
        dominated = any(
            q_price <= price
            and q_size >= size
            and (q_price < price or q_size > size)
            for q_price, q_size, _ in parts
        )
        if not dominated:
            expected.add(key)
    assert {r.p_partkey for r in rows} == expected
    # Frontier shape: sorted by price, sizes strictly decrease... no —
    # strictly INCREASE as price decreases; equivalently along ascending
    # price the sizes are strictly ascending.
    ordered = sorted(rows, key=lambda r: r.price)
    sizes = [r.part_size for r in ordered]
    assert sizes == sorted(set(sizes))


def test_mode_matches_counter(spark, sf_dir):
    rows = {r.user_id: r for r in q_events_type_mode_per_user(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    per_user = defaultdict(Counter)
    for e in ev:
        per_user[e.user_id][e.event_type] += 1
    for uid, counts in per_user.items():
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert (rows[uid].mode_type, rows[uid].mode_count) == best


def test_bridge_terms_sum_to_delta(spark, sf_dir):
    rows = q_orders_revenue_bridge(spark, sf_dir).collect()
    assert rows
    for r in rows:
        total = r.volume_effect + r.rate_effect + r.cross_effect
        assert abs(total - r.delta_revenue) < 1e-6 * max(1.0, abs(r.delta_revenue))
