"""Portfolio & representation health queries vs Python recomputation."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from procurement_data_pipeline_spark.registry import load_all


def _embs(sf_dir):
    return duckdb.sql(
        f"SELECT vec_id, label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()


def test_norm_quality_matches_python(spark, sf_dir):
    by_label = defaultdict(list)
    for vec_id, label, emb in _embs(sf_dir):
        q2 = sum(math.floor(float(x) * 1e6) ** 2 for x in emb)
        by_label[label].append((q2, vec_id))
    rows = {
        r["label"]: r
        for r in load_all()["emb_norm_quality"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == set(by_label)
    for label, vals in by_label.items():
        vals.sort()
        n = len(vals)
        r = rows[label]
        assert r["n_vectors"] == n
        k50, k95 = (n * 50 + 99) // 100, (n * 95 + 99) // 100
        assert r["p50_norm"] == math.sqrt(vals[k50 - 1][0] / 1e12)
        assert r["p95_norm"] == math.sqrt(vals[k95 - 1][0] / 1e12)
        assert r["n_zero"] == sum(1 for q2, _ in vals if q2 == 0)
        assert r["n_off_unit"] == sum(
            1 for q2, _ in vals if abs(q2 - 10**12) > 2 * 10**10
        )
        assert r["p50_norm"] <= r["p95_norm"]


def test_label_confusion_matches_python(spark, sf_dir):
    sums = defaultdict(lambda: defaultdict(int))
    for _, label, emb in _embs(sf_dir):
        for i, x in enumerate(emb):
            sums[label][i] += math.floor(float(x) * 1e6)
    labels = sorted(sums)
    rows = {
        (r["label_a"], r["label_b"]): r
        for r in load_all()["emb_label_confusion"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == {
        (a, b) for i, a in enumerate(labels) for b in labels[i + 1 :]
    }
    for (a, b), r in rows.items():
        dims = sorted(set(sums[a]) | set(sums[b]))
        dot = na2 = nb2 = 0.0
        for d in dims:
            sa, sb = float(sums[a][d]), float(sums[b][d])
            dot += sa * sb
            na2 += sa * sa
            nb2 += sb * sb
        assert r["centroid_cosine"] == dot / (math.sqrt(na2) * math.sqrt(nb2))
        assert -1.0 - 1e-12 <= r["centroid_cosine"] <= 1.0 + 1e-12


def test_priority_sla_matches_python(spark, sf_dir):
    lt = defaultdict(list)
    for prio, t in duckdb.sql(
        f"""SELECT o.o_orderpriority,
                   GREATEST(date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(MAX(l.l_shipdate) AS DATE)), 0)
            FROM '{sf_dir}/orders.parquet' o
            JOIN '{sf_dir}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate"""
    ).fetchall():
        lt[prio].append(t)
    rows = {
        r["priority"]: r
        for r in load_all()["orders_priority_sla"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == set(lt)
    for prio, ts in lt.items():
        r = rows[prio]
        n = len(ts)
        assert r["n_orders"] == n
        for d in (30, 60, 90):
            assert r[f"sla_{d}d"] == float(sum(1 for t in ts if t <= d)) / float(n)
        # SLA curves are monotone in the window
        assert r["sla_30d"] <= r["sla_60d"] <= r["sla_90d"] <= 1.0


def test_slow_movers_match_python(spark, sf_dir):
    li = duckdb.sql(
        f"SELECT l_partkey, CAST(l_shipdate AS DATE), "
        f"CAST(FLOOR(l_extendedprice*100) AS BIGINT) "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    brand = dict(
        duckdb.sql(
            f"SELECT p_partkey, p_brand FROM '{sf_dir}/part.parquet'"
        ).fetchall()
    )
    d0 = max(d for _, d, _ in li)
    last = {}
    spend = defaultdict(int)
    for pk, d, c in li:
        last[pk] = max(last.get(pk, d), d)
        spend[pk] += c
    agg = defaultdict(lambda: [0, 0, 0])
    for pk in last:
        b = brand[pk]
        slow = (d0 - last[pk]).days > 60
        agg[b][0] += 1
        if slow:
            agg[b][1] += 1
            agg[b][2] += spend[pk]
    rows = {
        r["brand"]: r
        for r in load_all()["part_slow_movers"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == set(agg)
    for b, (n, ns, sp) in agg.items():
        r = rows[b]
        assert r["n_parts"] == n
        assert r["n_slow"] == ns
        assert r["share_slow"] == float(ns) / float(n)
        assert r["spend_at_risk"] == float(sp) / 100.0
