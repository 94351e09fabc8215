"""Model-based tests for the lifecycle analytics queries: the CUSUM window
identity against the naive recurrence, backlog conservation, RFM quintile
contract, and association-rule consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.queries.lifecycle import (
    q_customer_rfm,
    q_events_cusum_drift,
    q_events_interarrival_stats,
    q_orders_open_backlog_daily,
    q_part_affinity_rules,
)


def _naive_cusum(devs: list[int]) -> list[int]:
    """Textbook recurrence S_t = max(0, S_{t-1} + d_t)."""
    out, s = [], 0
    for d in devs:
        s = max(0, s + d)
        out.append(s)
    return out


def _window_cusum(devs: list[int]) -> list[int]:
    """The closed form used by the query: P_t - min(0, min_{k<=t} P_k)."""
    out, p, running_min = [], 0, 0
    for d in devs:
        p += d
        running_min = min(running_min, p)
        out.append(p - min(running_min, 0))
    return out


def test_cusum_identity_matches_recurrence():
    # The identity is what lets the detector run as two window aggregates
    # instead of an iterative fold — prove it on adversarial sequences.
    cases = [
        [5, -3, 4, -10, 2, 2, 2],
        [-1, -1, -1, 10, -20, 30],
        [0, 0, 0],
        [7],
        [],
        [-5, -5, 12, -1, -1, -1, 20],
    ]
    for devs in cases:
        assert _window_cusum(devs) == _naive_cusum(devs), devs


def test_cusum_drift_runs_and_bounds(spark, sf_dir):
    rows = q_events_cusum_drift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_alarms <= r.n_events
        assert r.users_drifted <= r.n_alarms or r.n_alarms == 0
        assert r.max_cusum >= 0.0


def test_backlog_conservation(spark, sf_dir):
    df = q_orders_open_backlog_daily(spark, sf_dir)
    rows = sorted(df.collect(), key=lambda r: r.day)
    assert rows
    # Cumulative identity: open_eod == running (placed - completed).
    run = 0
    for r in rows:
        run += r.placed - r.completed
        assert r.open_eod == run
        assert r.open_eod >= 0  # can't complete an order before placing it
    # Final backlog equals orders whose lines never shipped.
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    never_shipped = (
        o.join(
            li.select(F.col("l_orderkey").alias("o_orderkey")).distinct(),
            "o_orderkey",
            "left_anti",
        ).count()
    )
    assert rows[-1].open_eod == never_shipped


def test_rfm_scores_contract(spark, sf_dir):
    rows = q_customer_rfm(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    for col in ("r_score", "f_score", "m_score"):
        vals = [getattr(r, col) for r in rows]
        assert set(vals) <= set(range(1, 6))
        # NTILE balance: bucket sizes differ by at most one.
        sizes = [vals.count(b) for b in sorted(set(vals))]
        assert max(sizes) - min(sizes) <= 1
    # Deterministic under re-run (tie-broken by custkey).
    again = q_customer_rfm(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # Monetary is exact cents: frequency>0 and monetary>0 for every buyer.
    assert all(r.frequency > 0 and r.monetary > 0 for r in rows)
    assert n == len({r.custkey for r in rows})


def test_interarrival_nonnegative_and_ordered(spark, sf_dir):
    rows = q_events_interarrival_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_gaps >= 1
        assert 0 <= r.min_gap_sec <= r.avg_gap_sec <= r.max_gap_sec


def test_affinity_rule_consistency(spark, sf_dir):
    rows = q_part_affinity_rules(spark, sf_dir).collect()
    for r in rows:
        assert r.part_a < r.part_b
        assert r.pair_n >= 3
        assert 0.0 < r.support <= 1.0
        assert 0.0 < r.conf_a_to_b <= 1.0
        assert 0.0 < r.conf_b_to_a <= 1.0
        assert r.lift > 0.0
        # lift == conf_a_to_b / support(b): cross-check the ratios agree
        # to double precision from the published columns alone.
        support_b = r.conf_a_to_b / r.lift if r.lift else 0.0
        assert abs(support_b * r.lift - r.conf_a_to_b) < 1e-12
