"""Neyman stratified sampling + TWAP vs independent Python recomputation."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb

from procurement_data_pipeline_spark.registry import load_all

BUDGET = 500


def _strata(sf_dir):
    vals = duckdb.sql(
        f"SELECT event_type, event_id, CAST(FLOOR(value * 1000000) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    groups: dict[str, list[tuple[int, int]]] = defaultdict(list)
    for t, eid, y in vals:
        groups[t].append((eid, y))
    return groups


def _neyman_alloc(groups):
    stats = {}
    for t, rows in groups.items():
        n = len(rows)
        s1 = sum(y for _, y in rows)
        s2 = sum(y * y for _, y in rows)
        sigma = math.sqrt(
            (float(n) * float(s2) - float(s1) * float(s1)) / (float(n) * float(n))
        )
        stats[t] = (n, sigma)
    w_tot = 0.0
    for t in sorted(stats):  # ordered-fold contract
        w_tot = w_tot + float(stats[t][0]) * stats[t][1]
    base, frac = {}, {}
    for t, (n, sigma) in stats.items():
        q = float(BUDGET) * (float(n) * sigma) / w_tot
        base[t] = int(math.floor(q))
        frac[t] = q - math.floor(q)
    leftover = BUDGET - sum(base.values())
    order = sorted(stats, key=lambda t: (-frac[t], t))
    alloc = {}
    for i, t in enumerate(order):
        alloc[t] = min(stats[t][0], base[t] + (1 if i < leftover else 0))
    return stats, alloc


def test_neyman_sample_matches_reference(spark, sf_dir):
    groups = _strata(sf_dir)
    _, alloc = _neyman_alloc(groups)
    expected = set()
    for t, rows in groups.items():
        ranked = sorted(
            rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0])
        )
        for eid, _ in ranked[: alloc[t]]:
            expected.add((eid, t))
    got = load_all()["events_neyman_sample"].builder(spark, sf_dir).collect()
    assert {(r["event_id"], r["event_type"]) for r in got} == expected
    per_type = defaultdict(int)
    for r in got:
        per_type[r["event_type"]] += 1
        assert r["src_rank"] <= r["alloc_n"]
    assert dict(per_type) == {t: n for t, n in alloc.items() if n > 0}
    assert sum(per_type.values()) <= BUDGET


def test_neyman_beats_proportional_allocation(sf_dir):
    """The point of Neyman: the stratified-mean variance under the Neyman
    allocation is no worse than under proportional allocation (equality
    only when all sigma_h coincide)."""
    groups = _strata(sf_dir)
    stats, alloc = _neyman_alloc(groups)
    n_total = sum(n for n, _ in stats.values())

    def variance(a):  # Var(ȳ_st) = Σ (N_h/N)² σ_h² / n_h  (no fpc)
        return sum(
            (n / n_total) ** 2 * sigma**2 / a[t]
            for t, (n, sigma) in stats.items()
            if a[t] > 0
        )

    prop = {
        t: max(1, round(BUDGET * n / n_total)) for t, (n, _) in stats.items()
    }
    assert variance(alloc) <= variance(prop) + 1e-18


def test_twap_matches_reference_and_differs_from_plain_mean(spark, sf_dir):
    vals = duckdb.sql(
        f"SELECT event_type, epoch_us(ts), event_id, "
        f"CAST(FLOOR(value * 1000000) AS BIGINT) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    groups: dict[str, list[tuple[int, int, int]]] = defaultdict(list)
    for t, ts, eid, y in vals:
        groups[t].append((ts, eid, y))
    rows = {r["event_type"]: r for r in load_all()["events_value_twap"].builder(spark, sf_dir).collect()}
    assert set(rows) == set(groups)
    for t, obs in groups.items():
        obs.sort(key=lambda x: (x[0], x[1]))
        num = den = 0
        for (ts1, _, y), (ts2, _, _) in zip(obs, obs[1:]):
            w = (ts2 - ts1) // 1_000_000
            num += y * w
            den += w
        r = rows[t]
        assert r["n_intervals"] == len(obs) - 1
        assert r["total_sec"] == den
        assert r["twap"] == float(num) / float(den) / 1e6
