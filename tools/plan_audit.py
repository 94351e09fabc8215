"""Physical-plan quality audit over every declared query.

For each registry entry, build the DataFrame at a given sf_dir and inspect
the optimized physical plan for the properties that determine scale
behavior:

* parquet scans and whether each carries PushedFilters
* exchange (shuffle) count
* broadcast vs sort-merge vs nested-loop join mix
* cartesian products (always a bug at scale)
* whole-stage codegen presence

Writes a markdown table to stdout (redirect to PLANS.md for an audit
snapshot). tests/test_plan_quality.py enforces the invariants that must
never regress.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from procurement_data_pipeline_spark.registry import load_all  # noqa: E402
from procurement_data_pipeline_spark.session import get_session  # noqa: E402


def plan_stats(df) -> dict:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # The formatted plan prints each node twice (tree + detail section);
    # count only the detail headers "(<n>) <NodeName>" so every physical
    # node is counted exactly once.
    node = lambda name: len(  # noqa: E731
        re.findall(rf"^\(\d+\) {name}\b", plan, re.MULTILINE)
    )
    return {
        "scans": node("Scan parquet"),
        "scans_with_pushdown": len(re.findall(r"PushedFilters: \[(?!\])", plan)),
        "exchanges": node("Exchange"),
        "broadcast_joins": node("BroadcastHashJoin"),
        "smj": node("SortMergeJoin"),
        "bnlj": node("BroadcastNestedLoopJoin"),
        "cartesian": node("CartesianProduct"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("plan-audit")
    print(f"# Plan audit @ {sf_dir}\n")
    print(
        "| query | scans | pushdown | shuffles | bhj | smj | bnlj | cartesian |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for name, spec in sorted(load_all().items()):
        try:
            s = plan_stats(spec.builder(spark, sf_dir))
        except Exception as ex:  # pragma: no cover - audit robustness
            print(f"| {name} | ERROR: {ex} | | | | | | |")
            continue
        print(
            f"| {name} | {s['scans']} | {s['scans_with_pushdown']}"
            f" | {s['exchanges']} | {s['broadcast_joins']} | {s['smj']}"
            f" | {s['bnlj']} | {s['cartesian']} |"
        )


if __name__ == "__main__":
    main()
