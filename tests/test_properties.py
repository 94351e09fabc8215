"""Property-based MRP invariants (SURVEY.md §5 item 4).

Hypothesis generates random small procurement worlds; each run checks the
engine's net-demand output against a pure-Python reference model AND the
reference's documented invariants:

* net_demand > 0 for every emitted row (the filter IS the contract)
* estimated_cost = net_demand * unit_cost for every row
* every emitted (product) uses its rank-1 supplier
* per-supplier export totals equal the sum of their item costs
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from procurement_data_pipeline_spark.operators.export import supplier_orders
from procurement_data_pipeline_spark.operators.net_demand import net_demand

DATE = dt.date(2026, 1, 15)
N_PRODUCTS = 5
N_SUPPLIERS = 3

world = st.fixed_dictionaries(
    {
        # per-product demand rows: (product_id, qty) pairs
        "orders": st.lists(
            st.tuples(
                st.integers(1, N_PRODUCTS), st.integers(1, 100)
            ),
            max_size=30,
        ),
        # per-(product, warehouse) inventory
        "inventory": st.lists(
            st.tuples(
                st.integers(1, N_PRODUCTS),
                st.integers(1, 2),
                st.integers(0, 500),
                st.integers(0, 50),
                st.integers(0, 100),
            ),
            max_size=10,
            unique_by=lambda r: (r[0], r[1]),
        ),
        # per-product (safety_stock_level, active flag)
        "products": st.lists(
            st.tuples(st.integers(0, 100), st.booleans()),
            min_size=N_PRODUCTS,
            max_size=N_PRODUCTS,
        ),
        # (product, supplier, unit_cost_cents, priority) — priority unique
        # per product so ranking is deterministic (SURVEY §4 item 3)
        "mappings": st.lists(
            st.tuples(
                st.integers(1, N_PRODUCTS),
                st.integers(1, N_SUPPLIERS),
                st.integers(100, 9999),
            ),
            min_size=5,
            max_size=12,
            unique_by=lambda r: (r[0], r[1]),
        ),
    }
)


def _python_mrp(w):
    """Pure-Python reference model of net_demand.sql:4-87."""
    demand: dict[int, int] = {}
    for pid, qty in w["orders"]:
        demand[pid] = demand.get(pid, 0) + qty
    inv: dict[int, dict[str, int]] = {}
    for pid, _wh, avail, res, ss in w["inventory"]:
        agg = inv.setdefault(pid, {"a": 0, "r": 0, "s": 0})
        agg["a"] += avail
        agg["r"] += res
        agg["s"] = max(agg["s"], ss)
    ranked: dict[int, tuple] = {}
    by_product: dict[int, list] = {}
    for i, (pid, sid, cost) in enumerate(w["mappings"]):
        by_product.setdefault(pid, []).append((i + 1, cost / 100.0, sid))
    for pid, rows in by_product.items():
        # priority = insertion order (unique); rank by (priority, cost, sid)
        ranked[pid] = sorted(rows)[0]
    out = {}
    for pid in range(1, N_PRODUCTS + 1):
        ss_level, active = w["products"][pid - 1]
        if not active or pid not in ranked:
            continue
        d = demand.get(pid, 0)
        i = inv.get(pid)
        safety = i["s"] if i else ss_level
        avail = i["a"] if i else 0
        res = i["r"] if i else 0
        nd = max(0, d + safety - (avail - res))
        if nd > 0:
            prio, cost, sid = ranked[pid]
            out[pid] = (sid, nd, round(nd * cost, 2))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(world)
def test_mrp_matches_python_model_and_invariants(spark, w):
    orders = spark.createDataFrame(
        [
            (i + 1, pid, qty, DATE)
            for i, (pid, qty) in enumerate(w["orders"])
        ]
        or [(0, 1, 0, dt.date(1970, 1, 1))],
        "order_id long, product_id int, quantity int, order_date date",
    )
    inventory = spark.createDataFrame(
        [(pid, wh, a, r, s, DATE) for pid, wh, a, r, s in w["inventory"]]
        or [(0, 0, 0, 0, 0, dt.date(1970, 1, 1))],
        "product_id int, warehouse_id int, available_qty int,"
        " reserved_qty int, safety_stock int, snapshot_date date",
    )
    products = spark.createDataFrame(
        [
            (pid, f"P{pid}", ss, act)
            for pid, (ss, act) in enumerate(w["products"], start=1)
        ],
        "product_id int, product_name string, safety_stock_level int,"
        " is_active boolean",
    )
    suppliers = spark.createDataFrame(
        [(s, f"S{s}", True) for s in range(1, N_SUPPLIERS + 1)],
        "supplier_id int, supplier_name string, is_active boolean",
    )
    mappings = spark.createDataFrame(
        [
            (pid, sid, cents / 100.0, i + 1)
            for i, (pid, sid, cents) in enumerate(w["mappings"])
        ],
        "product_id int, supplier_id int, unit_cost double, priority int",
    )

    got = net_demand(
        orders,
        inventory,
        products,
        suppliers,
        mappings,
        "2026-01-15",
        "2026-01-16",
        "2026-01-16",
    ).collect()
    expected = _python_mrp(w)

    assert {r.product_id: (r.supplier_id, r.net_demand) for r in got} == {
        p: (sid, nd) for p, (sid, nd, _) in expected.items()
    }
    for r in got:
        assert r.net_demand > 0
        assert r.estimated_cost == Decimal(str(expected[r.product_id][2]))

    # export invariant: supplier totals == sum of their item costs
    nd_df = net_demand(
        orders, inventory, products, suppliers, mappings,
        "2026-01-15", "2026-01-16", "2026-01-16",
    )
    docs = supplier_orders(nd_df, "2026-01-17", "2026-01-15").collect()
    for d in docs:
        assert float(d.total_estimated_cost) == round(
            sum(float(i.total_cost) for i in d.items), 2
        )
