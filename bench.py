"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": <sf>}

Each query is built lazily and executed via a count-style full materialization
(``df.write.format("noop")`` — runs the whole plan, no driver collect cost,
no disk write), which is the fair analogue of the reference pushing results
into a warehouse table.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from procurement_data_pipeline_spark.registry import load_all
from procurement_data_pipeline_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    specs = load_all()
    bench_specs = {n: s for n, s in sorted(specs.items()) if s.bench}

    spark = get_session("bench")
    # Warm-up execution of every query (codegen compile, parquet footers,
    # noop-sink init) so the timed pass measures steady-state plan execution
    # — the quantity that extrapolates to cluster scale — not constant
    # first-touch JVM costs.
    for name in bench_specs:
        bench_specs[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # Two timed passes, report the min: the container shares cores with
    # other tenants, and min-of-N is the standard estimator for the
    # machine-independent cost under intermittent external load.
    timings: dict[str, float] = {}
    for _ in range(2):
        for name, spec in bench_specs.items():
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 4)
            timings[name] = min(timings.get(name, elapsed), elapsed)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
