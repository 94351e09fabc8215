"""Compare two bench JSON files per query.

Usage: python tools/compare_bench.py OLD.json NEW.json [--threshold 1.15]

Prints one line per query with old/new seconds and the ratio, sections for
headline and extended groups, and a summary distinguishing UNIFORM shifts
(ambient load — every query moved by a similar factor) from TARGETED
regressions (a few queries moved, the rest flat). The driver's BENCH_r*.json
wraps the bench line under "parsed"; raw bench.py output is also accepted.
"""

from __future__ import annotations

import json
import statistics
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    return doc.get("parsed", doc)


def _group(doc: dict, key: str) -> dict[str, float]:
    if key == "queries":
        return dict(doc.get("queries") or {})
    ext = doc.get("extended") or {}
    return dict(ext.get("queries", ext) if isinstance(ext, dict) else {})


def compare(old: dict, new: dict, threshold: float) -> int:
    worst_rc = 0
    # calibration normalization (round 6+): both sides carry a fixed-cost
    # CPU reference; dividing every ratio by the calibration ratio removes
    # uniform ambient-load shifts BEFORE the targeted-regression test, so
    # "the machine was busy" can no longer mask or mimic a real regression
    calib = None
    if old.get("calibration_sec") and new.get("calibration_sec"):
        calib = new["calibration_sec"] / old["calibration_sec"]
        print(
            f"calibration: {old['calibration_sec']:.3f}s -> "
            f"{new['calibration_sec']:.3f}s (ambient factor x{calib:.2f}; "
            "per-query ratios below are normalized by it)"
        )
    for section in ("queries", "extended"):
        o, n = _group(old, section), _group(new, section)
        shared = sorted(set(o) & set(n))
        if not shared:
            continue
        ratios = []
        print(f"\n== {section} ({len(shared)} shared queries) ==")
        for q in shared:
            r = n[q] / o[q] if o[q] else float("inf")
            if calib:
                r /= calib
            ratios.append(r)
            flag = " <-- " if r > threshold else ""
            print(f"{q:42s} {o[q]:7.3f}s -> {n[q]:7.3f}s  x{r:.2f}{flag}")
        med = statistics.median(ratios)
        spread = max(ratios) / min(ratios) if min(ratios) > 0 else float("inf")
        outliers = [q for q, r in zip(shared, ratios) if r > med * 1.25]
        print(f"median ratio x{med:.2f}, max/min ratio spread {spread:.2f}")
        if outliers and med <= threshold:
            print(f"TARGETED suspects (>{1.25:.2f}x the median): {outliers}")
            worst_rc = 1
        elif med > threshold and spread < 1.5:
            print("UNIFORM shift — consistent with ambient load, not a regression")
        only_new = sorted(set(n) - set(o))
        if only_new:
            print(f"new-only queries (no baseline): {len(only_new)}")
    return worst_rc


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.15
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            threshold = float(a.split("=", 1)[1]) if "=" in a else threshold
    if len(args) != 2:
        print(__doc__)
        return 2
    return compare(_load(args[0]), _load(args[1]), threshold)


if __name__ == "__main__":
    sys.exit(main())
