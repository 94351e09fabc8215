"""Model-based tests: FIFO allocation against a per-part simulation loop,
and accumulating-snapshot milestone invariants."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.queries.inventory import (
    q_order_lifecycle_snapshot,
    q_part_fifo_consumption,
)
from procurement_data_pipeline_spark.sources.tables import load_table


def test_fifo_matches_naive_loop(spark, sf_dir):
    rows = {r.partkey: r for r in q_part_fifo_consumption(spark, sf_dir).collect()}
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").cast("date").alias("d"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .collect()
    )
    lots = defaultdict(list)
    for r in li:
        lots[r.l_partkey].append((r.d, r.l_orderkey, r.l_linenumber, r.q))
    for pk, ls in lots.items():
        ls.sort()
        total = sum(q for *_, q in ls)
        demand = total // 2
        left = demand
        touched = 0
        consumed = 0
        boundary = None
        for d, _, _, q in ls:
            take = min(left, q)
            if take > 0:
                touched += 1
                consumed += take
                boundary = d
                left -= take
        r = rows[pk]
        assert r.total_qty == total
        assert r.demand_qty == demand
        assert r.n_lots == len(ls)
        assert r.n_lots_touched == touched
        assert r.consumed_qty == consumed == demand
        assert r.boundary_ship_day == boundary


def test_lifecycle_snapshot_invariants(spark, sf_dir):
    rows = q_order_lifecycle_snapshot(spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert len(rows) == n_orders  # exactly one row per order
    for r in rows:
        if r.lifecycle_state == "placed":
            assert r.n_lines == 0 and r.first_ship is None
        else:
            assert r.n_lines > 0
            assert r.first_ship <= r.last_ship
            assert r.days_to_first_ship <= r.days_to_complete
            if r.lifecycle_state == "returned":
                assert r.n_returned > 0
            else:
                assert r.n_returned == 0


def test_reorder_points_formula_invariants(spark, sf_dir):
    """safety_stock ≥ 0, reorder_point = μ·L + safety exactly, σ ≥ 0, and
    a part with steadier demand must carry proportionally less safety
    stock than its sigma ordering implies (spot formula wiring)."""
    from procurement_data_pipeline_spark.registry import load_all

    rows = load_all()["part_reorder_points"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["sigma_d"] >= 0.0
        assert r["lead_days"] >= 0.0
        assert r["safety_stock"] >= 0.0
        assert abs(r["reorder_point"] - (r["mu_d"] * r["lead_days"] + r["safety_stock"])) < 1e-9
        assert r["safety_stock"] == 1.645 * (r["lead_days"] ** 0.5) * r["sigma_d"]
