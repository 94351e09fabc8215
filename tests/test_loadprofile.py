"""Load-shape queries vs independent Python recomputation: single-bin DFT,
sweep-line peak concurrency, and nested-sample vocabulary growth."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import duckdb

from procurement_data_pipeline_spark.registry import load_all

GAP_US = 30 * 60 * 1_000_000
US_PER_HOUR = 3_600_000_000


def _events(sf_dir):
    return duckdb.sql(
        f"SELECT user_id, epoch_us(ts), event_id, event_type, "
        f"CAST(FLOOR(value * 100) AS BIGINT) FROM '{sf_dir}/events.parquet'"
    ).fetchall()


def test_dft_matches_python_replay(spark, sf_dir):
    cos24 = [round(1e6 * math.cos(2 * math.pi * i / 24)) for i in range(24)]
    sin24 = [round(1e6 * math.sin(2 * math.pi * i / 24)) for i in range(24)]
    hourly = defaultdict(int)
    for _, ts_us, _, et, v_c in _events(sf_dir):
        hourly[(et, ts_us // US_PER_HOUR)] += v_c
    by_type = defaultdict(list)
    for (et, h), y in hourly.items():
        by_type[et].append((h, y))
    rows = {
        r["event_type"]: r
        for r in load_all()["events_dft_daily_power"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == set(by_type)
    for et, series in by_type.items():
        r = rows[et]
        assert r["n_hours"] == len(series)
        ac = sum(y * cos24[h % 24] for h, y in series)
        as_ = sum(y * sin24[h % 24] for h, y in series)
        a, b = float(ac) / 1e8, float(as_) / 1e8
        assert r["cos24"] == a and r["sin24"] == b
        assert r["power24"] == a * a + b * b
        assert r["amplitude24"] == 2.0 * math.sqrt(a * a + b * b) / float(len(series))
        assert r["power24"] >= 0.0 and r["power12"] >= 0.0


def _sessions(sf_dir):
    per_user = defaultdict(list)
    for u, ts_us, eid, _, _ in _events(sf_dir):
        per_user[u].append((ts_us, eid))
    sessions = []
    for u, evs in per_user.items():
        evs.sort()
        start = end = evs[0][0]
        for ts_us, _ in evs[1:]:
            if ts_us - end > GAP_US:
                sessions.append((start, end))
                start = ts_us
            end = ts_us
        sessions.append((start, end))
    return sessions


def test_peak_concurrency_matches_sweep(spark, sf_dir):
    import datetime as dt

    sessions = _sessions(sf_dir)
    deltas = defaultdict(lambda: [0, 0])  # ts → [net, started]
    for s, e in sessions:
        deltas[s][0] += 1
        deltas[s][1] += 1
        deltas[e + 1][0] -= 1
    conc = 0
    day_peak: dict = {}
    day_started = defaultdict(int)
    for ts in sorted(deltas):
        net, started = deltas[ts]
        conc += net
        day = dt.datetime.fromtimestamp(ts / 1e6, dt.timezone.utc).date()
        day_peak[day] = max(day_peak.get(day, -(10**9)), conc)
        day_started[day] += started
    rows = {
        r["day"]: r
        for r in load_all()["events_peak_concurrency"].builder(spark, sf_dir).collect()
    }
    assert set(rows) == set(day_peak)
    for day, r in rows.items():
        assert r["peak_concurrency"] == day_peak[day]
        assert r["sessions_started"] == day_started[day]
    assert sum(r["sessions_started"] for r in rows.values()) == len(sessions)


def _norm_words(text: str) -> list[str]:
    import re

    return re.sub(r"\s+", " ", text).strip().lower().split(" ")


def test_vocab_growth_matches_python_and_is_nested(spark, sf_dir):
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    doc_count = defaultdict(int)
    tok_count = defaultdict(int)
    word_maxd: dict = {}
    for doc_id, text in docs:
        frac = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16) / float(
            1 << 52
        )
        depth = 0
        for lvl in (6, 5, 4, 3, 2, 1):
            if frac < 2.0**-lvl:
                depth = lvl
                break
        ws = _norm_words(text)
        doc_count[depth] += 1
        tok_count[depth] += len(ws)
        for w in set(ws):
            word_maxd[w] = max(word_maxd.get(w, -1), depth)
    vocab_d = defaultdict(int)
    for w, d in word_maxd.items():
        vocab_d[d] += 1
    rows = sorted(
        load_all()["docs_vocab_growth"].builder(spark, sf_dir).collect(),
        key=lambda r: r["level"],
    )
    assert [r["level"] for r in rows] == list(range(7))
    for r in rows:
        lv = r["level"]
        nd = sum(doc_count[d] for d in range(lv, 7))
        nt = sum(tok_count[d] for d in range(lv, 7))
        vs = sum(vocab_d[d] for d in range(lv, 7))
        assert r["n_docs"] == nd
        assert r["n_tokens"] == nt
        assert r["vocab_size"] == vs
        if nt:
            assert r["type_token_ratio"] == float(vs) / float(nt)
    # nesting: deeper levels are subsets — all three counters monotone
    for a, b in zip(rows, rows[1:]):
        assert a["n_docs"] >= b["n_docs"]
        assert a["vocab_size"] >= b["vocab_size"]
        assert a["n_tokens"] >= b["n_tokens"]
    # level 0 covers the whole corpus
    assert rows[0]["n_docs"] == len(docs)


def test_littles_law_matches_python_and_conserves(spark, sf_dir):
    """Per-day L/λ/W vs a Python interval replay, plus the exact Fubini
    conservation Σ_day ∫active dt == Σ session durations."""
    import datetime as dt
    from collections import defaultdict

    import duckdb

    from procurement_data_pipeline_spark.queries.events import SESSION_GAP_MIN
    from procurement_data_pipeline_spark.registry import load_all

    rows = duckdb.sql(
        f"SELECT user_id, epoch_us(ts), event_id "
        f"FROM '{sf_dir}/events.parquet' ORDER BY user_id, 2, 3"
    ).fetchall()
    gap = SESSION_GAP_MIN * 60 * 1_000_000
    sessions = []
    prev_user = prev_ts = None
    for uid, ts_us, _eid in rows:
        if uid != prev_user or ts_us - prev_ts > gap:
            sessions.append([ts_us, ts_us])
        else:
            sessions[-1][1] = ts_us
        prev_user, prev_ts = uid, ts_us
    us_day = 86_400_000_000
    epoch = dt.date(1970, 1, 1)
    per_day = defaultdict(lambda: [0, 0, 0, 0])  # started, active, ovl, dur
    for s, e in sessions:
        d0, d1 = s // us_day, e // us_day
        for d in range(d0, d1 + 1):
            st = per_day[epoch + dt.timedelta(days=d)]
            st[1] += 1
            st[2] += min(e, (d + 1) * us_day) - max(s, d * us_day)
            if d == d0:
                st[0] += 1
                st[3] += e - s
    got = {
        r["day"]: r
        for r in load_all()["events_littles_law"].builder(spark, sf_dir).collect()
    }
    assert set(got) == set(per_day)
    for day, (n_st, n_act, ovl, dur) in per_day.items():
        r = got[day]
        assert r["n_started"] == n_st
        assert r["n_active_sessions"] == n_act
        assert r["active_us"] == ovl
        assert r["l_avg"] == float(ovl) / float(us_day)
        assert r["lambda_starts_per_hour"] == float(n_st) / 24.0
        if n_st:
            assert r["w_mean_min"] == (float(dur) / float(n_st)) / 60000000.0
    # Fubini: the day-clipped integral telescopes to exactly the durations
    assert sum(r["active_us"] for r in got.values()) == sum(
        e - s for s, e in sessions
    )
