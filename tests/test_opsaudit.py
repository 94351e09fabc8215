"""Tests for the operational-audit queries: skew stats vs a Python count,
and duplicate-payment band/window membership."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.queries.opsaudit import (
    q_lineitem_skew_diagnosis,
    q_orders_duplicate_payments,
)
from procurement_data_pipeline_spark.sources.tables import load_table


def test_skew_diagnosis_matches_python_count(spark, sf_dir):
    rows = sorted(
        q_lineitem_skew_diagnosis(spark, sf_dir).collect(), key=lambda r: r.rank
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey").collect()
    counts = Counter(r.l_suppkey for r in li)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r.suppkey, r.n_rows) for r in rows] == top
    total = sum(counts.values())
    for r in rows:
        assert r.n_keys == len(counts)
        assert r.total_rows == total
        assert r.share == r.n_rows / total
        assert r.skew_vs_mean == r.n_rows / (total / len(counts))
        assert r.skew_vs_mean >= 1.0  # the top keys are above the mean


def test_duplicate_payments_membership(spark, sf_dir):
    rows = q_orders_duplicate_payments(spark, sf_dir).collect()
    o = {
        r.o_orderkey: r
        for r in load_table(spark, sf_dir, "orders").collect()
    }
    seen = set()
    for r in rows:
        a, b = o[r.order_a], o[r.order_b]
        assert r.order_a < r.order_b
        assert a.o_custkey == b.o_custkey == r.custkey
        ca = int(a.o_totalprice * 100 // 1)
        cb = int(b.o_totalprice * 100 // 1)
        assert ca // 1000000 == cb // 1000000  # same $10k band
        assert r.day_gap <= 7
        assert (r.order_a, r.order_b) not in seen
        seen.add((r.order_a, r.order_b))
