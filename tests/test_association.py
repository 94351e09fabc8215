"""Association/memory queries vs independent Python recomputation:
Cramér's V, variance-ratio test, template clusters."""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import duckdb

from procurement_data_pipeline_spark.registry import load_all


def test_cramers_v_matches_dense_chi2(spark, sf_dir):
    cells = defaultdict(int)
    for et, hr in duckdb.sql(
        f"SELECT event_type, hour(ts) FROM '{sf_dir}/events.parquet'"
    ).fetchall():
        cells[(et, hr)] += 1
    types = sorted({t for t, _ in cells})
    hours = sorted({h for _, h in cells})
    r = {t: sum(c for (tt, _), c in cells.items() if tt == t) for t in types}
    c = {h: sum(v for (_, hh), v in cells.items() if hh == h) for h in hours}
    n = sum(cells.values())
    # dense chi2 the textbook way (float, order-insensitive reference)
    chi2_ref = 0.0
    for t in types:
        for h in hours:
            e = r[t] * c[h] / n
            o = cells.get((t, h), 0)
            chi2_ref += (o - e) ** 2 / e
    [row] = load_all()["events_cramers_v"].builder(spark, sf_dir).collect()
    assert row["n_events"] == n
    assert row["n_types"] == len(types)
    assert row["n_hours"] == len(hours)
    assert math.isclose(row["chi2"], chi2_ref, rel_tol=1e-9)
    v_ref = math.sqrt(chi2_ref / (n * min(len(types) - 1, len(hours) - 1)))
    assert math.isclose(row["cramers_v"], v_ref, rel_tol=1e-9)
    assert 0.0 <= row["cramers_v"] <= 1.0


def test_variance_ratio_matches_python(spark, sf_dir):
    Q = 5
    daily = defaultdict(int)
    for et, d, v in duckdb.sql(
        f"SELECT event_type, CAST(date_trunc('day', ts) AS DATE), "
        f"CAST(FLOOR(value * 100) AS BIGINT) FROM '{sf_dir}/events.parquet'"
    ).fetchall():
        daily[(et, d)] += v
    by_type = defaultdict(dict)
    for (et, d), y in daily.items():
        by_type[et][d] = y
    rows = {
        r["event_type"]: r
        for r in load_all()["events_value_variance_ratio"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert set(rows) == set(by_type)
    for et, series in by_type.items():
        days = sorted(series)
        d0 = days[0]
        n_days = len(days)
        keep = Q * (n_days // Q)
        kept = [(d, series[d]) for d in days if (d - d0).days < keep]
        blocks = defaultdict(int)
        for d, y in kept:
            blocks[(d - d0).days // Q] += y

        def varp(vals):
            nn, s1, s2 = len(vals), sum(vals), sum(v * v for v in vals)
            return float(nn * s2 - s1 * s1) / float(nn * nn)

        r = rows[et]
        assert r["n_days"] == n_days
        assert r["n_kept_days"] == len(kept)
        assert r["n_blocks"] == len(blocks)
        vd = varp([y for _, y in kept])
        vb = varp(list(blocks.values()))
        assert r["var_daily"] == vd / 10000.0
        assert r["var_block"] == vb / 10000.0
        if vd:
            assert r["variance_ratio"] == vb / (float(Q) * vd)
        assert r["variance_ratio"] > 0.0


def test_template_clusters_match_python(spark, sf_dir):
    docs = duckdb.sql(
        f"SELECT text, source, n_chars FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    groups = defaultdict(lambda: [0, set(), 0])
    for text, source, n_chars in docs:
        ws = re.sub(r"\s+", " ", text).strip().lower().split(" ")
        fp = hashlib.md5(" ".join(ws[:8]).encode()).hexdigest()
        g = groups[fp]
        g[0] += 1
        g[1].add(source)
        g[2] += n_chars
    expected = {fp: g for fp, g in groups.items() if g[0] >= 2}
    rows = {
        r["fingerprint"]: r
        for r in load_all()["docs_template_clusters"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == set(expected)
    for fp, (nd, srcs, chars) in expected.items():
        r = rows[fp]
        assert r["n_docs"] == nd
        assert r["n_sources"] == len(srcs)
        assert r["n_chars_total"] == chars
