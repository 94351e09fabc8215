"""Model-based tests for the planning/statistics queries: exact budget
conservation in apportionment, the ancestor-explode rollup against naive
recursion, weighted-median crossing, churn set identities, and the
conditional-reset counter against a per-row simulation."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.queries.planning import (
    _BUDGET_UNITS,
    q_customer_churn_sets,
    q_events_since_last_purchase,
    q_nation_budget_apportionment,
    q_part_hierarchy_rollup,
    q_part_weighted_median_price,
    q_supplier_spc_chart,
)


def test_apportionment_conserves_budget_exactly(spark, sf_dir):
    rows = q_nation_budget_apportionment(spark, sf_dir).collect()
    assert rows
    assert sum(r.alloc_units for r in rows) == _BUDGET_UNITS
    # Hamilton quota property: every allocation is floor or ceil of the
    # exact proportional share.
    total_rev = sum(round(r.revenue * 100) for r in rows)
    for r in rows:
        share = _BUDGET_UNITS * round(r.revenue * 100) / total_rev
        assert int(share) <= r.alloc_units <= int(share) + 1


def test_hierarchy_rollup_matches_naive_recursion(spark, sf_dir):
    rows = q_part_hierarchy_rollup(spark, sf_dir).collect()
    parts = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_retailprice"
    ).collect()
    cents = {p.p_partkey: int(p.p_retailprice * 100 // 1) for p in parts}
    # Naive: every key contributes to each ancestor obtained by repeated
    # integer division by 10.
    sub_n: dict[int, int] = defaultdict(int)
    sub_c: dict[int, int] = defaultdict(int)
    for k, c in cents.items():
        a = k
        while a > 0:
            sub_n[a] += 1
            sub_c[a] += c
            a //= 10
    got = {r.p_partkey: r for r in rows}
    keys = set(cents)
    assert set(got) == {k for k in sub_n if k in keys}
    for k, r in got.items():
        assert r.n_subtree == sub_n[k], k
        assert round(r.subtree_value * 100) == sub_c[k], k
        assert r.depth == len(str(k)) - 1


def test_weighted_median_crossing_property(spark, sf_dir):
    rows = q_part_weighted_median_price(spark, sf_dir).collect()
    assert rows
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    joined = (
        p.join(li, p.p_partkey == li.l_partkey)
        .groupBy("p_brand", "p_partkey", "p_retailprice")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("w"))
        .collect()
    )
    by_brand: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for r in joined:
        by_brand[r.p_brand].append((int(r.p_retailprice * 100 // 1), r.w))
    for r in rows:
        items = sorted(by_brand[r.brand])
        tot = sum(w for _, w in items)
        assert r.total_weight == tot
        cum = 0
        median = None
        for price, w in items:
            cum += w
            if 2 * cum >= tot:
                median = price
                break
        assert round(r.w_median_price * 100) == median, r.brand


def test_churn_set_identities(spark, sf_dir):
    rows = q_customer_churn_sets(spark, sf_dir).collect()
    assert rows
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    active = (
        o.select(F.year("o_orderdate").alias("yr"), "o_custkey")
        .distinct()
        .collect()
    )
    sets: dict[int, set] = defaultdict(set)
    for r in active:
        sets[r.yr].add(r.o_custkey)
    for r in rows:
        cur, nxt = sets[r.yr], sets[r.yr + 1]
        assert r.n_active == len(cur)
        assert r.n_retained == len(cur & nxt)
        assert r.n_churned == len(cur - nxt)
        assert r.n_new_next == len(nxt - cur)


def test_spc_chart_bounds(spark, sf_dir):
    rows = q_supplier_spc_chart(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_weeks >= 1
        assert 0 <= r.n_out_of_control <= r.n_weeks
        assert r.mean_qty > 0
        if r.n_weeks == 1:
            assert r.avg_mr is None and r.n_out_of_control == 0


def test_since_last_purchase_matches_simulation(spark, sf_dir):
    rows = {r.user_id: r for r in q_events_since_last_purchase(spark, sf_dir).collect()}
    from procurement_data_pipeline_spark.sources.tables import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    streams: dict[int, list] = defaultdict(list)
    for e in ev:
        streams[e.user_id].append((e.us, e.event_id, e.event_type))
    for uid, es in streams.items():
        es.sort()
        since = None
        max_streak = None
        n_purch = 0
        for _, _, typ in es:
            if typ == "purchase":
                since = 0
                n_purch += 1
            elif since is not None:
                since += 1
            if since is not None:
                max_streak = since if max_streak is None else max(max_streak, since)
        r = rows[uid]
        assert r.n_events == len(es)
        assert r.n_purchases == n_purch
        assert r.max_streak == max_streak
        assert r.end_streak == since
