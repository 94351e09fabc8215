"""Graph-stats & EWMA-chart queries vs independent Python recomputation."""

from __future__ import annotations

import math
from collections import defaultdict
from itertools import combinations

import duckdb

from procurement_data_pipeline_spark.queries.trend import (
    _EWMA_LAMBDA,
    _EWMA_WIDTH,
)
from procurement_data_pipeline_spark.registry import load_all


def _order_parts(sf_dir):
    import os

    p = f"{sf_dir}/lineitem.parquet"
    if os.path.isdir(p):  # Spark directory layout in synthetic fixtures
        p = f"{p}/*.parquet"
    by_order = defaultdict(set)
    for ok, pk in duckdb.sql(
        f"SELECT l_orderkey, l_partkey FROM read_parquet('{p}')"
    ).fetchall():
        by_order[ok].add(pk)
    return by_order


def test_triangle_stats_match_python(spark, sf_dir):
    by_order = _order_parts(sf_dir)
    edges = set()
    for parts in by_order.values():
        for a, b in combinations(sorted(parts), 2):
            edges.add((a, b))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = defaultdict(int)
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if b < c:  # a < b < c counts each triangle once
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    expected = []
    for v in adj:
        d, t = len(adj[v]), tri.get(v, 0)
        clust = (2.0 * t) / float(d * (d - 1)) if d >= 2 else 0.0
        expected.append((v, d, t, clust))
    expected.sort(key=lambda r: (-r[2], r[0]))
    expected = expected[:25]
    rows = load_all()["part_triangle_stats"].builder(spark, sf_dir).collect()
    got = [(r["part"], r["degree"], r["triangles"], r["clustering"]) for r in rows]
    assert got == expected
    # triangle incidence is consistent: total corner credits = 3 * #triangles
    n_triangles = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if b < c
    )
    assert sum(tri.values()) == 3 * n_triangles


def test_also_bought_cosine_matches_python(spark, sf_dir):
    by_order = _order_parts(sf_dir)
    npart = defaultdict(int)
    nab = defaultdict(int)
    for parts in by_order.values():
        for p in parts:
            npart[p] += 1
        for a, b in combinations(sorted(parts), 2):
            nab[(a, b)] += 1
    recs = defaultdict(list)
    for (a, b), n in nab.items():
        cos = float(n) / math.sqrt(float(npart[a] * npart[b]))
        recs[a].append((cos, b, n))
        recs[b].append((cos, a, n))
    expected = {}
    for p, lst in recs.items():
        lst.sort(key=lambda r: (-r[0], r[1]))
        for rk, (cos, q, n) in enumerate(lst[:3], start=1):
            expected[(p, q)] = (n, cos, rk)
    rows = load_all()["part_also_bought_cosine"].builder(spark, sf_dir).collect()
    got = {
        (r["part"], r["also_bought"]): (r["together_orders"], r["cosine"], r["rank"])
        for r in rows
    }
    assert got == expected
    # every part that co-occurs at all gets a rank-1 neighbor
    assert {p for p, _ in got} == set(recs)


def test_ewma_chart_matches_python(spark, sf_dir):
    daily = defaultdict(int)
    for (d,) in duckdb.sql(
        f"SELECT CAST(ts AS DATE) FROM '{sf_dir}/events.parquet'"
    ).fetchall():
        daily[d] += 1
    days = sorted(daily)
    xs = [float(daily[d]) for d in days]
    n = len(xs)
    s1 = sum(daily[d] for d in days)
    s2 = sum(daily[d] * daily[d] for d in days)
    mean = float(s1) / float(n)
    sigma = math.sqrt(float(n * s2 - s1 * s1) / (float(n) * float(n)))
    ucl = mean + 3.0 * sigma * _EWMA_WIDTH
    lcl = mean - 3.0 * sigma * _EWMA_WIDTH
    ewma = {}
    acc = mean
    for d, x in zip(days, xs):
        acc = acc * (1.0 - _EWMA_LAMBDA) + x * _EWMA_LAMBDA
        ewma[d] = acc
    rows = load_all()["events_ewma_chart"].builder(spark, sf_dir).collect()
    assert sorted(r["day"] for r in rows) == days
    for r in rows:
        assert r["x"] == daily[r["day"]]
        assert r["ewma"] == ewma[r["day"]]  # bit-exact ordered fold
        assert r["ucl"] == ucl and r["lcl"] == lcl
        assert r["breach"] == (r["ewma"] < lcl or r["ewma"] > ucl)
    # the chart's memory: consecutive EWMAs differ by exactly λ·(x−prev)
    by_day = {r["day"]: r for r in rows}
    prev = mean
    for d in days:
        r = by_day[d]
        assert r["ewma"] == prev * (1.0 - _EWMA_LAMBDA) + r["x"] * _EWMA_LAMBDA
        prev = r["ewma"]


def test_triangle_stats_on_hub_graph(spark, tmp_path):
    """A staple part in EVERY basket — the skew shape the degree-ordered
    orientation exists for. Correctness must hold (the hub's count and
    clustering included), and the replay verifies every top-25 row."""
    rows = []
    # 40 orders of 3 parts each: hub part 0 + a rotating pair
    for o in range(40):
        rows += [(o, 0), (o, 1 + (o % 8)), (o, 9 + (o % 5))]
    li = spark.createDataFrame(
        [(o, p, 1.0) for o, p in rows],
        "l_orderkey long, l_partkey long, l_quantity double",
    )
    sf = str(tmp_path / "hub")
    li.write.parquet(sf + "/lineitem.parquet")

    by_order = _order_parts(sf)
    edges = set()
    for parts in by_order.values():
        for a, b in combinations(sorted(parts), 2):
            edges.add((a, b))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    tri = defaultdict(int)
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if b < c:
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    expected = []
    for v in adj:
        d, t = len(adj[v]), tri.get(v, 0)
        clust = (2.0 * t) / float(d * (d - 1)) if d >= 2 else 0.0
        expected.append((v, d, t, clust))
    expected.sort(key=lambda r: (-r[2], r[0]))
    from procurement_data_pipeline_spark.registry import load_all

    rows_got = load_all()["part_triangle_stats"].builder(spark, sf).collect()
    got = [
        (r["part"], r["degree"], r["triangles"], r["clustering"])
        for r in rows_got
    ]
    assert got == expected[:25]
    hub = got[0]
    assert hub[0] == 0 and hub[1] == 13  # the hub leads, fully connected
