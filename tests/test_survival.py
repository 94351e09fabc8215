"""Kaplan-Meier estimator invariants."""

from __future__ import annotations

from collections import defaultdict

from procurement_data_pipeline_spark.registry import load_all


def _curves(spark, sf_dir):
    rows = load_all()["orders_kaplan_meier"].builder(spark, sf_dir).collect()
    by_p = defaultdict(list)
    for r in rows:
        by_p[r["priority"]].append(r)
    for p in by_p:
        by_p[p].sort(key=lambda r: r["week"])
    return by_p


def test_km_survival_is_a_valid_curve(spark, sf_dir):
    by_p = _curves(spark, sf_dir)
    assert by_p
    for rows in by_p.values():
        prev_s, prev_n = 1.0 + 1e-12, None
        for r in rows:
            assert 0.0 <= r["survival"] <= 1.0
            assert r["survival"] <= prev_s + 1e-12  # monotone nonincreasing
            prev_s = r["survival"]
            assert r["n_risk"] > 0
            if prev_n is not None:
                assert r["n_risk"] < prev_n  # risk set strictly shrinks
            prev_n = r["n_risk"]
            assert 0.0 <= r["hazard"] <= 1.0


def test_km_first_interval_identity(spark, sf_dir):
    """S(t_0) must equal 1 − d_0/n_0 exactly — the fold's base case."""
    for rows in _curves(spark, sf_dir).values():
        r0 = rows[0]
        assert r0["survival"] == 1.0 - r0["d_events"] / r0["n_risk"]


def test_km_risk_set_conservation(spark, sf_dir):
    """Everyone leaves the study exactly once: n_risk at interval i equals
    the total population minus everyone who completed or censored earlier."""
    for rows in _curves(spark, sf_dir).values():
        total = rows[0]["n_risk"]
        left = 0
        for r in rows:
            assert r["n_risk"] == total - left
            left += r["d_events"] + r["c_censored"]
        assert left == total  # exhaustive


def test_km_deterministic(spark, sf_dir):
    b = load_all()["orders_kaplan_meier"].builder
    r1 = sorted(map(tuple, b(spark, sf_dir).collect()))
    r2 = sorted(map(tuple, b(spark, sf_dir).collect()))
    assert r1 == r2


def _lifetimes(sf_dir):
    import duckdb

    return duckdb.sql(
        f"""
        SELECT o.o_orderpriority,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(MAX(l.l_shipdate) AS DATE)),
               MAX(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
        FROM '{sf_dir}/orders.parquet' o
        JOIN '{sf_dir}/lineitem.parquet' l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
        """
    ).fetchall()


def test_rmst_matches_python_replay(spark, sf_dir):
    H, W = 120, 7
    wmax = H // W
    counts = defaultdict(lambda: defaultdict(lambda: [0, 0]))  # prio→week→[d,c]
    totals = defaultdict(int)
    for prio, t, _ in _lifetimes(sf_dir):
        week = int(min(max(t, 0), H) // W)
        ev = 1 if t <= H else 0
        counts[prio][week][0 if ev else 1] += 0  # touch
        if ev:
            counts[prio][week][0] += 1
        else:
            counts[prio][week][1] += 1
        totals[prio] += 1
    rows = {
        r["priority"]: r
        for r in load_all()["orders_rmst"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == set(counts)
    for prio, r in rows.items():
        assert r["n_orders"] == totals[prio]
        s, rmst, at_risk = 1.0, 0.0, totals[prio]
        for w in range(0, wmax + 1):
            d, c = counts[prio].get(w, [0, 0])
            f = 1.0 if at_risk == 0 else 1.0 - float(d) / float(at_risk)
            s = s * f
            rmst = rmst + s
            at_risk -= d + c
        assert r["rmst_weeks"] == rmst
        assert r["rmst_days"] == rmst * 7.0
        # bounded by the horizon and nonnegative
        assert 0.0 <= r["rmst_weeks"] <= wmax + 1


def test_competing_risks_replay_and_conservation(spark, sf_dir):
    H, W = 120, 7
    grid = defaultdict(lambda: defaultdict(lambda: [0, 0, 0]))  # [ret, ful, cens]
    for prio, t, ret in _lifetimes(sf_dir):
        week = int(min(max(t, 0), H) // W)
        if t <= H:
            grid[prio][week][0 if ret else 1] += 1
        else:
            grid[prio][week][2] += 1
    rows = load_all()["orders_competing_risks"].builder(spark, sf_dir).collect()
    by_p = defaultdict(list)
    for r in rows:
        by_p[r["priority"]].append(r)
    assert set(by_p) == set(grid)
    for prio, rs in by_p.items():
        rs.sort(key=lambda r: r["week"])
        assert [r["week"] for r in rs] == sorted(grid[prio])
        at_risk = sum(sum(v) for v in grid[prio].values())
        s, cr, cf = 1.0, 0.0, 0.0
        for r in rs:
            dret, dful, cens = grid[prio][r["week"]]
            assert r["n_risk"] == at_risk
            assert r["d_returned"] == dret and r["d_fulfilled"] == dful
            f = 1.0 - float(dret + dful) / float(at_risk)
            cr = cr + s * (float(dret) / float(at_risk))
            cf = cf + s * (float(dful) / float(at_risk))
            s = s * f
            assert r["survival"] == s
            assert r["cif_returned"] == cr
            assert r["cif_fulfilled"] == cf
            # conservation: mass is split exactly between the three states
            assert abs(r["survival"] + r["cif_returned"] + r["cif_fulfilled"] - 1.0) < 1e-12
            # CIFs are monotone nondecreasing, survival nonincreasing
            at_risk -= dret + dful + cens
        assert all(
            rs[i]["cif_returned"] <= rs[i + 1]["cif_returned"] + 1e-15
            and rs[i]["survival"] >= rs[i + 1]["survival"] - 1e-15
            for i in range(len(rs) - 1)
        )


def test_mcnemar_cells_match_python(spark, sf_dir):
    import duckdb

    evs = duckdb.sql(
        f"SELECT user_id, event_type, ts < TIMESTAMP '2024-01-16 00:00:00' "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    p1, p2, users = set(), set(), set()
    for u, et, pre in evs:
        users.add(u)
        if et == "purchase":
            (p1 if pre else p2).add(u)
    b = len({u for u in p1 if u not in p2})
    c = len({u for u in p2 if u not in p1})
    [r] = load_all()["events_mcnemar_conversion"].builder(spark, sf_dir).collect()
    assert r["n_users"] == len(users)
    assert r["pre_only"] == b and r["post_only"] == c
    assert r["both_periods"] == len(p1 & p2)
    assert r["neither"] == len(users) - len(p1 | p2)
    assert r["n_users"] == r["both_periods"] + r["pre_only"] + r["post_only"] + r["neither"]
    if b + c:
        assert r["mcnemar_chi2"] == float((b - c) ** 2) / float(b + c)
        assert r["significant"] == (r["mcnemar_chi2"] > 3.841458820694124)
