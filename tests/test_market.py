"""Market-structure & sequence queries vs independent Python recomputation:
HHI/CR4 concentration, Markov transition matrix, and session path mining."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from procurement_data_pipeline_spark.registry import load_all

GAP_US = 30 * 60 * 1_000_000


def test_hhi_matches_direct_computation(spark, sf_dir):
    spend = duckdb.sql(
        f"""
        SELECT s.s_nationkey, l.l_suppkey,
               SUM(CAST(FLOOR(l.l_extendedprice * 100) AS HUGEINT))
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
        GROUP BY 1, 2
        """
    ).fetchall()
    nations = dict(
        duckdb.sql(
            f"SELECT n_nationkey, n_name FROM '{sf_dir}/nation.parquet'"
        ).fetchall()
    )
    by_nation: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for nk, sk, c in spend:
        by_nation[nk].append((int(c), sk))
    rows = {r["nation"]: r for r in load_all()["nation_supplier_hhi"].builder(spark, sf_dir).collect()}
    assert len(rows) == len(by_nation)
    for nk, cs in by_nation.items():
        r = rows[nations[nk]]
        t = sum(c for c, _ in cs)
        ss = sum(c * c for c, _ in cs)
        top4 = sum(c for c, _ in sorted(cs, key=lambda p: (-p[0], p[1]))[:4])
        assert r["n_suppliers"] == len(cs)
        assert r["total_spend"] == float(t) / 100.0
        assert r["hhi"] == float(ss) / (float(t) * float(t))
        assert r["top1_share"] == float(max(c for c, _ in cs)) / float(t)
        assert r["cr4"] == float(top4) / float(t)
        # HHI bounds: 1/n (perfectly even) .. 1 (monopoly)
        assert 1.0 / len(cs) <= r["hhi"] + 1e-15 and r["hhi"] <= 1.0
        assert r["top1_share"] <= r["cr4"] <= 1.0


def _user_sequences(sf_dir):
    evs = duckdb.sql(
        f"SELECT user_id, epoch_us(ts), event_id, event_type "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    seqs: dict[int, list[tuple[int, int, str]]] = defaultdict(list)
    for u, ts, eid, et in evs:
        seqs[u].append((ts, eid, et))
    for s in seqs.values():
        s.sort(key=lambda x: (x[0], x[1]))
    return seqs


def test_markov_transitions_match_and_rows_normalize(spark, sf_dir):
    seqs = _user_sequences(sf_dir)
    counts: Counter[tuple[str, str]] = Counter()
    for s in seqs.values():
        for (_, _, a), (_, _, b) in zip(s, s[1:]):
            counts[(a, b)] += 1
    rows = load_all()["events_markov_transitions"].builder(spark, sf_dir).collect()
    assert {(r["from_type"], r["to_type"]): r["n"] for r in rows} == dict(counts)
    row_tot: dict[str, int] = defaultdict(int)
    for (a, _), n in counts.items():
        row_tot[a] += n
    p_sum: dict[str, float] = defaultdict(float)
    for r in rows:
        assert r["p"] == float(r["n"]) / float(row_tot[r["from_type"]])
        p_sum[r["from_type"]] += r["p"]
    for tot in p_sum.values():
        assert abs(tot - 1.0) < 1e-9


def test_session_paths_match_direct_computation(spark, sf_dir):
    seqs = _user_sequences(sf_dir)
    paths: Counter[str] = Counter()
    for s in seqs.values():
        cur: list[str] = []
        prev = None
        for ts, _, et in s:
            if prev is not None and ts - prev > GAP_US:
                paths[">".join(cur)] += 1
                cur = []
            cur.append(et)
            prev = ts
        if cur:
            paths[">".join(cur)] += 1
    top = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = load_all()["events_session_paths"].builder(spark, sf_dir).collect()
    got = [(r["path"], r["n_sessions"]) for r in rows]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == top
    for r in rows:
        assert r["n_events"] == r["path"].count(">") + 1
