"""Price-index identities and ABC-XYZ matrix consistency."""

from __future__ import annotations

import math

import duckdb

from procurement_data_pipeline_spark.registry import load_all


def test_price_index_matches_python_replay(spark, sf_dir):
    rows = load_all()["part_price_index_brand"].builder(spark, sf_dir).collect()
    assert rows
    raw = duckdb.sql(
        f"""
        SELECT p.p_brand, l.l_partkey,
               CASE WHEN l.l_shipdate < DATE '1998-01-01' THEN 0 ELSE 1 END,
               SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)),
               SUM(CAST(l.l_quantity AS BIGINT))
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate < DATE '1998-01-01'
           OR l.l_shipdate >= DATE '1999-01-01'
        GROUP BY 1, 2, 3
        """
    ).fetchall()
    per = {}
    for brand, pk, period, v, q in raw:
        per.setdefault((brand, pk), {})[period] = (
            math.floor(v / q * 10000.0),
            q,
        )
    agg: dict[str, list] = {}
    for (brand, pk), periods in per.items():
        if 0 in periods and 1 in periods:
            (p0, q0), (p1, q1) = periods[0], periods[1]
            agg.setdefault(brand, []).append((p0, q0, p1, q1))
    for r in rows:
        pairs = agg[r["brand"]]
        l_num = sum(p1 * q0 for p0, q0, p1, q1 in pairs)
        l_den = sum(p0 * q0 for p0, q0, p1, q1 in pairs)
        p_num = sum(p1 * q1 for p0, q0, p1, q1 in pairs)
        p_den = sum(p0 * q1 for p0, q0, p1, q1 in pairs)
        assert r["n_parts"] == len(pairs)
        assert r["laspeyres"] == l_num / l_den
        assert r["paasche"] == p_num / p_den
        assert r["fisher"] == math.sqrt((l_num / l_den) * (p_num / p_den))
    assert set(agg) == {r["brand"] for r in rows}


def test_abc_xyz_matrix_consistent_with_parents(spark, sf_dir):
    """Every part lands in exactly one cell; cell totals reconcile with
    the standalone ABC classification and shares sum to one."""
    cells = load_all()["part_abc_xyz_matrix"].builder(spark, sf_dir).collect()
    assert cells
    abc = load_all()["abc_part_classification"].builder(spark, sf_dir).collect()
    n_parts_abc = len(abc)
    assert sum(r["n_parts"] for r in cells) == n_parts_abc
    assert abs(sum(r["revenue_share"] for r in cells) - 1.0) < 1e-9
    # per-ABC-class totals agree with the standalone query
    from collections import Counter

    abc_counts = Counter(r["abc_class"] for r in abc)
    cell_counts = Counter()
    for r in cells:
        assert r["abc_class"] in {"A", "B", "C"}
        assert r["xyz_class"] in {"X", "Y", "Z"}
        cell_counts[r["abc_class"]] += r["n_parts"]
    assert cell_counts == abc_counts


def test_ar_aging_buckets_partition_open_orders(spark, sf_dir):
    rows = load_all()["orders_ar_aging"].builder(spark, sf_dir).collect()
    got = {r["bucket"]: r for r in rows}
    assert set(got) <= {"0-30", "31-60", "61-90", "90+"}
    n_open, total = duckdb.sql(
        f"""
        SELECT COUNT(*), SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT))
        FROM '{sf_dir}/orders.parquet' WHERE o_orderstatus <> 'F'
        """
    ).fetchone()
    assert sum(r["n_orders"] for r in rows) == n_open
    assert sum(r["open_cents"] for r in rows) == total
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9


def test_minmax_scale_bounds_and_inverse(spark, sf_dir):
    """Scaled values live in [0,1]; rescaling back with the fitted min/max
    recovers the original float32 values exactly (the chain is two exact
    IEEE ops, so the inverse is exact up to one rounding)."""
    rows = load_all()["emb_minmax_scale"].builder(spark, sf_dir).collect()
    assert rows
    stats = {
        pos: (mn, mx)
        for pos, mn, mx in duckdb.sql(
            f"""
            SELECT pos, MIN(x), MAX(x) FROM (
              SELECT generate_subscripts(embedding, 1) AS pos,
                     CAST(unnest(embedding) AS DOUBLE) AS x
              FROM '{sf_dir}/embeddings.parquet'
            ) GROUP BY 1
            """
        ).fetchall()
    }
    orig = {
        (vid, pos): x
        for vid, pos, x in duckdb.sql(
            f"""
            SELECT vec_id, generate_subscripts(embedding, 1),
                   CAST(unnest(embedding) AS DOUBLE)
            FROM '{sf_dir}/embeddings.parquet' WHERE vec_id < 50
            """
        ).fetchall()
    }
    for r in rows:
        assert 0.0 <= r["sx"] <= 1.0
        mn, mx = stats[r["pos"]]
        back = r["sx"] * (mx - mn) + mn
        assert abs(back - orig[(r["vec_id"], r["pos"])]) <= 1e-12 * max(
            1.0, abs(mx), abs(mn)
        )
