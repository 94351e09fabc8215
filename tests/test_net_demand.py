"""MRP net-demand operator unit tests on reference-replica fixtures.

Fixtures mirror FIXTURES.md: 5 products / 3 suppliers / 2 mappings per
product (docker/dags/sql/ddl_postgres.sql:51-82), exercising every scenario
the reference's semantics define: clamp-at-zero, COALESCE safety-stock
fallback, inactive exclusion, multi-warehouse rollup, rank tie-breaks.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from procurement_data_pipeline_spark.operators.net_demand import (
    net_demand,
    preferred_suppliers,
    rollup_inventory,
)

D = dt.date


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("order_id", T.LongType()),
                T.StructField("product_id", T.IntegerType()),
                T.StructField("quantity", T.IntegerType()),
                T.StructField("order_date", T.DateType()),
            ]
        ),
    )


def _inventory(spark, rows):
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("product_id", T.IntegerType()),
                T.StructField("warehouse_id", T.IntegerType()),
                T.StructField("available_qty", T.IntegerType()),
                T.StructField("reserved_qty", T.IntegerType()),
                T.StructField("safety_stock", T.IntegerType()),
                T.StructField("snapshot_date", T.DateType()),
            ]
        ),
    )


def _products(spark, rows):
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("product_id", T.IntegerType()),
                T.StructField("product_name", T.StringType()),
                T.StructField("safety_stock_level", T.IntegerType()),
                T.StructField("is_active", T.BooleanType()),
            ]
        ),
    )


def _suppliers(spark, rows):
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("supplier_id", T.IntegerType()),
                T.StructField("supplier_name", T.StringType()),
                T.StructField("is_active", T.BooleanType()),
            ]
        ),
    )


def _mappings(spark, rows):
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("product_id", T.IntegerType()),
                T.StructField("supplier_id", T.IntegerType()),
                T.StructField("unit_cost", T.DecimalType(10, 2)),
                T.StructField("priority", T.IntegerType()),
            ]
        ),
    )


DAY = D(2026, 1, 14)


@pytest.fixture(scope="module")
def golden(spark):
    """Reference golden-day replica (ddl_postgres.sql seed + one day's data)."""
    products = _products(
        spark,
        [
            (1, "Widget A", 100, True),
            (2, "Widget B", 50, True),
            (3, "Component X", 200, True),
            (4, "Component Y", 150, True),
            (5, "Assembly Kit", 30, True),
        ],
    )
    suppliers = _suppliers(
        spark,
        [(1, "TechSupply Co", True), (2, "Global Parts Inc", True), (3, "FastShip Ltd", True)],
    )
    mappings = _mappings(
        spark,
        [
            (1, 1, Decimal("20.00"), 1),
            (1, 2, Decimal("22.00"), 2),
            (2, 1, Decimal("35.00"), 1),
            (2, 3, Decimal("36.50"), 2),
            (3, 2, Decimal("11.00"), 1),
            (3, 3, Decimal("10.50"), 2),
            (4, 2, Decimal("44.00"), 1),
            (4, 1, Decimal("46.00"), 2),
            (5, 3, Decimal("60.00"), 1),
            (5, 2, Decimal("62.00"), 2),
        ],
    )
    return products, suppliers, mappings


def _run(spark, golden, orders_rows, inv_rows, **kw):
    products, suppliers, mappings = golden
    return net_demand(
        _orders(spark, orders_rows),
        _inventory(spark, inv_rows),
        products,
        suppliers,
        mappings,
        "2026-01-14",
        "2026-01-15",
        "2026-01-15",
        **kw,
    )


def test_mrp_formula_and_supplier_selection(spark, golden):
    # demand 100, stock position 150-10=140, safety 60 → net 100+60-140=20
    out = _run(
        spark,
        golden,
        [(1, 1, 100, DAY)],
        [(1, 1, 150, 10, 60, DAY)],
    ).collect()
    # all 5 products appear (LEFT JOIN keeps orderless products at their
    # safety-stock demand); product 1 carries the computed MRP value
    assert {r.product_id for r in out} == {1, 2, 3, 4, 5}
    r = next(x for x in out if x.product_id == 1)
    assert r.net_demand == 20
    assert r.supplier_id == 1  # priority-1 supplier
    assert r.estimated_cost == Decimal("400.00")
    assert r.calculation_date == D(2026, 1, 15)


def test_clamp_at_zero_excludes_row(spark, golden):
    # demand 5 + safety 10 - (500-0) < 0 → clamped to 0 → filtered out
    out = _run(spark, golden, [(1, 1, 5, DAY)], [(1, 1, 500, 0, 10, DAY)]).collect()
    assert 1 not in {r.product_id for r in out}


def test_safety_stock_fallback_when_inventory_missing(spark, golden):
    # product 2 has orders but no inventory: COALESCE(ai.safety_stock,
    # p.safety_stock_level)=50; available/reserved→0 → net = 40+50 = 90
    out = _run(spark, golden, [(10, 2, 40, DAY)], []).collect()
    by_pid = {r.product_id: r for r in out}
    assert by_pid[2].net_demand == 90
    assert by_pid[2].supplier_id == 1  # priority 1 beats cheaper priority 2


def test_no_orders_product_gets_safety_stock_demand(spark, golden):
    # Products with no orders and no inventory still appear with
    # net = safety_stock_level (LEFT JOIN semantics, net_demand.sql:64-68).
    out = _run(spark, golden, [], []).collect()
    by_pid = {r.product_id: r for r in out}
    assert set(by_pid) == {1, 2, 3, 4, 5}
    assert by_pid[3].net_demand == 200
    # product 3: supplier 2 has priority 1 despite supplier 3 being cheaper
    assert by_pid[3].supplier_id == 2


def test_multi_warehouse_rollup(spark, golden):
    # SUM(available), SUM(reserved), MAX(safety) across warehouses
    inv = [
        (1, 1, 100, 10, 60, DAY),
        (1, 2, 50, 5, 80, DAY),
    ]
    out = _run(spark, golden, [(1, 1, 200, DAY)], inv).collect()
    r = next(x for x in out if x.product_id == 1)
    # net = 200 + max(60,80) - (150 - 15) = 145
    assert r.net_demand == 145


def test_rollup_inventory_shapes(spark):
    inv = _inventory(
        spark,
        [(1, 1, 100, 10, 60, DAY), (1, 2, 50, 5, 80, DAY), (2, 1, 9, 1, 7, DAY)],
    )
    got = {r.product_id: r for r in rollup_inventory(inv).collect()}
    assert (got[1].available_qty, got[1].reserved_qty, got[1].safety_stock) == (150, 15, 80)
    assert (got[2].available_qty, got[2].reserved_qty, got[2].safety_stock) == (9, 1, 7)


def test_inactive_product_and_supplier_excluded(spark, golden):
    products, suppliers, mappings = golden
    products = products.replace({True: False}, subset=["is_active"]).filter(
        "product_id = 1"
    ).unionByName(products.filter("product_id != 1"))
    out = net_demand(
        _orders(spark, [(1, 1, 100, DAY)]),
        _inventory(spark, []),
        products,
        suppliers,
        mappings,
        "2026-01-14",
        "2026-01-15",
        "2026-01-15",
    ).collect()
    assert 1 not in {r.product_id for r in out}


def test_preferred_supplier_tie_break_by_cost(spark, golden):
    # same priority, different cost → cheaper wins rank 1
    mappings = _mappings(
        spark,
        [(9, 1, Decimal("10.00"), 1), (9, 2, Decimal("9.50"), 1)],
    )
    out = preferred_suppliers(mappings).collect()
    assert len(out) == 1 and out[0].supplier_id == 2


def test_demand_window_filters_dates(spark, golden):
    orders = [
        (1, 1, 100, DAY),
        (2, 1, 999, D(2026, 1, 13)),  # outside window
        (3, 1, 999, D(2026, 1, 15)),  # outside window (exclusive end)
    ]
    out = _run(spark, golden, orders, [(1, 1, 100, 0, 50, DAY)]).collect()
    r = next(x for x in out if x.product_id == 1)
    assert r.net_demand == 100 + 50 - 100


def test_present_net_demand_output_order(spark, sf_dir):
    """O1: final ORDER BY supplier_id, supplier_priority, net_demand DESC
    (net_demand.sql:87) at the presentation boundary."""
    from procurement_data_pipeline_spark.operators.net_demand import (
        present_net_demand,
    )
    from procurement_data_pipeline_spark.queries.parity import _net_demand

    rows = present_net_demand(_net_demand(spark, sf_dir)).collect()
    assert len(rows) > 1
    keys = [
        (r.supplier_id, r.supplier_priority, -r.net_demand) for r in rows
    ]
    assert keys == sorted(keys)
