"""Cluster purity & location quotient vs independent Python recomputation."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from procurement_data_pipeline_spark.registry import load_all


def test_cluster_purity_matches_python(spark, sf_dir):
    labels = dict(
        duckdb.sql(
            f"SELECT vec_id, label FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    )
    asg = {
        r["vec_id"]: r["cluster"]
        for r in load_all()["emb_kmeans"].builder(spark, sf_dir).collect()
    }
    assert set(asg) == set(labels)  # every vector is assigned
    cells = defaultdict(int)
    for vid, cl in asg.items():
        cells[(cl, labels[vid])] += 1
    per_cluster = defaultdict(list)
    for (cl, lb), n in cells.items():
        per_cluster[cl].append((n, lb))
    rows = {
        r["cluster"]: r
        for r in load_all()["emb_cluster_purity"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == set(per_cluster)
    for cl, pairs in per_cluster.items():
        n_points = sum(n for n, _ in pairs)
        top_n, top_lb = max((n, -lb) for n, lb in pairs)
        r = rows[cl]
        assert r["n_points"] == n_points
        assert r["top_label"] == -top_lb and r["top_label_n"] == top_n
        assert r["purity"] == float(top_n) / float(n_points)
        assert 0.0 < r["purity"] <= 1.0


def test_location_quotient_matches_python(spark, sf_dir):
    sup_nat = dict(
        duckdb.sql(
            f"SELECT s_suppkey, s_nationkey FROM '{sf_dir}/supplier.parquet'"
        ).fetchall()
    )
    ptype = dict(
        duckdb.sql(
            f"SELECT p_partkey, p_type FROM '{sf_dir}/part.parquet'"
        ).fetchall()
    )
    nations = dict(
        duckdb.sql(
            f"SELECT n_nationkey, n_name FROM '{sf_dir}/nation.parquet'"
        ).fetchall()
    )
    x = defaultdict(int)
    for sk, pk, c in duckdb.sql(
        f"SELECT l_suppkey, l_partkey, CAST(FLOOR(l_extendedprice*100) AS BIGINT) "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall():
        x[(sup_nat[sk], ptype[pk])] += c
    row_c = defaultdict(int)
    col_c = defaultdict(int)
    all_c = 0
    for (nk, t), c in x.items():
        row_c[nk] += c
        col_c[t] += c
        all_c += c
    rows = {
        (r["nation"], r["part_type"]): r
        for r in load_all()["nation_part_lq"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == {(nations[nk], t) for nk, t in x}
    for (nk, t), c in x.items():
        r = rows[(nations[nk], t)]
        assert r["exports"] == float(c) / 100.0
        sin = float(c) / float(row_c[nk])
        sg = float(col_c[t]) / float(all_c)
        assert r["share_in_nation"] == sin
        assert r["share_global"] == sg
        assert r["lq"] == sin / sg
    # LQs average to 1 when weighted by global type shares, per nation
    for nk in row_c:
        s = sum(
            rows[(nations[nk], t)]["lq"] * (float(col_c[t]) / float(all_c))
            for (nk2, t) in x
            if nk2 == nk
        )
        assert abs(s - 1.0) < 1e-9
