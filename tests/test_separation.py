"""Distribution-distance & class-separation queries vs independent Python
recomputation: exact EMD, Hellinger between sources, per-dim ANOVA."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import duckdb

from procurement_data_pipeline_spark.registry import load_all

SPLIT = "2024-01-16 00:00:00"


def test_emd_matches_python_and_bounds(spark, sf_dir):
    rows_db = duckdb.sql(
        f"SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT), "
        f"ts < TIMESTAMP '{SPLIT}' FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    pre = defaultdict(list)
    post = defaultdict(list)
    for et, v, is_pre in rows_db:
        (pre if is_pre else post)[et].append(v)
    rows = {
        r["event_type"]: r
        for r in load_all()["events_value_emd"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == set(pre) | set(post)
    for et, r in rows.items():
        a, b = sorted(pre[et]), sorted(post[et])
        na, nb = len(a), len(b)
        assert r["n_pre"] == na and r["n_post"] == nb
        # integer-identity replay over distinct values
        vals = sorted(set(a) | set(b))
        ca = cb = 0
        ai = {v: 0 for v in vals}
        bi = {v: 0 for v in vals}
        for v in a:
            ai[v] += 1
        for v in b:
            bi[v] += 1
        total = 0
        for i, v in enumerate(vals):
            ca += ai[v]
            cb += bi[v]
            gap = vals[i + 1] - v if i + 1 < len(vals) else 0
            total += abs(ca * nb - cb * na) * gap
        assert r["emd_dollars"] == float(total) / float(na * nb) / 100.0
        # W1 is lower-bounded by the mean shift and nonnegative
        mean_gap = abs(sum(a) / na - sum(b) / nb) / 100.0
        assert r["emd_dollars"] >= mean_gap - 1e-9
        assert r["emd_dollars"] >= 0.0


def test_hellinger_matches_python(spark, sf_dir):
    docs = duckdb.sql(
        f"SELECT source, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    wc = defaultdict(int)
    for source, text in docs:
        for w in re.sub(r"\s+", " ", text).strip().lower().split(" "):
            wc[(source, w)] += 1
    gl = defaultdict(int)
    for (_, w), c in wc.items():
        gl[w] += c
    topw = {
        w
        for w, _ in sorted(gl.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    }
    sup = defaultdict(dict)
    for (s, w), c in wc.items():
        if w in topw:
            sup[s][w] = c
    totals = {s: sum(d.values()) for s, d in sup.items()}
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in load_all()["docs_source_hellinger"].builder(spark, sf_dir).collect()
    }
    sources = sorted(sup)
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            shared = sorted(set(sup[sa]) & set(sup[sb]))
            if not shared:
                assert (sa, sb) not in rows
                continue
            bc = 0.0
            for w in shared:
                bc += math.sqrt(
                    float(sup[sa][w] * sup[sb][w])
                    / float(totals[sa] * totals[sb])
                )
            r = rows[(sa, sb)]
            assert r["n_shared_words"] == len(shared)
            assert math.isclose(r["bhattacharyya"], bc, rel_tol=1e-12)
            assert r["hellinger"] == math.sqrt(max(0.0, 1.0 - r["bhattacharyya"]))
            assert 0.0 <= r["hellinger"] <= 1.0


def test_dim_anova_matches_python(spark, sf_dir):
    vecs = duckdb.sql(
        f"SELECT label, embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    per_dim = defaultdict(lambda: defaultdict(list))
    for label, emb in vecs:
        for i, x in enumerate(emb):
            per_dim[i + 1][label].append(math.floor(float(x) * 1000000))
    rows = {
        r["dim"]: r for r in load_all()["emb_dim_anova"].builder(spark, sf_dir).collect()
    }
    for dim, groups in per_dim.items():
        k = len(groups)
        n = sum(len(v) for v in groups.values())
        s = sum(sum(v) for v in groups.values())
        t = sum(y * y for v in groups.values() for y in v)
        pg = 0.0
        for label in sorted(groups):
            v = groups[label]
            pg += float(sum(v)) ** 2 / float(len(v))
        ssw = float(t) - pg
        if not (k > 1 and n > k and ssw > 0):
            assert dim not in rows
            continue
        r = rows[dim]
        ssb = pg - float(s) * float(s) / float(n)
        assert r["k_labels"] == k and r["n_obs"] == n
        assert math.isclose(r["ss_between"], ssb / 1e12, rel_tol=1e-12)
        assert math.isclose(r["ss_within"], ssw / 1e12, rel_tol=1e-12)
        assert math.isclose(
            r["f_stat"], (ssb * (n - k)) / (ssw * (k - 1)), rel_tol=1e-12
        )
        assert r["f_stat"] >= 0.0
