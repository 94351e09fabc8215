"""Bench regression gate (VERDICT r5 item 7): a >25% NON-uniform per-query
slowdown between the last driver-parsed bench and the newest local bench
run must fail loudly before it ships, instead of being discovered in the
next round's VERDICT.

Pure-arithmetic test over artifacts already on disk — it never runs Spark.
Skips when either side is missing (fresh clone, bench not yet run this
session): the gate guards *shipping a measured regression*, not *having
measured*.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# non-uniform threshold AFTER calibration/median normalization: a query
# must move >25% against its peers (not just with the machine) to fail
TARGETED = 1.25


def _latest_parsed_round() -> dict | None:
    rounds = sorted(
        glob.glob(os.path.join(REPO, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", p).group(1)),
    )
    for p in reversed(rounds):
        with open(p) as f:
            doc = json.load(f)
        parsed = doc.get("parsed")
        if parsed and parsed.get("queries"):
            return parsed
    return None


def _current_local() -> dict | None:
    p = os.path.join(REPO, "BENCH_EXTENDED.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def test_no_targeted_headline_regression():
    old, new = _latest_parsed_round(), _current_local()
    if old is None or new is None:
        pytest.skip("need a parsed BENCH_r*.json and a local BENCH_EXTENDED.json")
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    if len(shared) < 5:
        pytest.skip("headline sets barely overlap — nothing comparable")
    ratios = {q: new["queries"][q] / old["queries"][q] for q in shared}
    # Ambient normalization: the gate's target is a NON-uniform move — a
    # query shifting >25% against its PEERS. The CPU calibration row only
    # sees compute contention; round 8 measured a uniform ~×1.11 drift
    # across every headline query (including ones reading disjoint files)
    # while calibration sat at ×1.03 — IO/page-cache ambient the CPU
    # dipstick cannot remove, with DIFFERENT queries crossing the
    # threshold on each rerun (noise, not a plan change). So the ambient
    # factor is the LARGER of the calibration ratio and the median peer
    # ratio: uniform drift divides out either way, while a genuinely
    # targeted regression (one query moving while peers sit still) leaves
    # the median ≈1 and still fails the gate.
    peer = statistics.median(ratios.values())
    cal = None
    if old.get("calibration_sec") and new.get("calibration_sec"):
        cal = new["calibration_sec"] / old["calibration_sec"]
    # Guard the guard (code-review r8): peer-median ambient must itself be
    # explainable — if EVERY query slowed >25% beyond what the CPU
    # calibration accounts for, that is a code regression in a shared path
    # (session config, common scan wrapper), not weather, and letting the
    # median divide itself out would hide it. The measured round-8 IO
    # drift sat ~8% above calibration, far inside this bound; a machine
    # drifting worse than 25% is unmeasurable anyway and a loud failure
    # prompting an idle rerun is the correct behavior.
    if cal is not None:
        assert peer <= cal * TARGETED, (
            f"UNIFORM bench slowdown: median peer ratio x{peer:.2f} vs "
            f"calibration x{cal:.2f} — every headline query slowed beyond "
            "ambient headroom; suspect a shared-path code regression (or "
            "rerun idle if the machine was loaded)"
        )
    ambient = peer if cal is None else max(peer, cal)
    normalized = {q: r / ambient for q, r in ratios.items()}
    offenders = {
        q: round(r, 2) for q, r in normalized.items() if r > TARGETED
    }
    assert not offenders, (
        f"targeted bench regression vs last parsed round (ambient factor "
        f"x{ambient:.2f} already removed): {offenders} — either fix the "
        "plan or document the intentional change and refresh the baseline"
    )
