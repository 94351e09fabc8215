"""Command-line entry points.

The reference ships as Airflow DAGs triggered by date; the equivalent here
is a thin CLI over the same library surface:

    python -m procurement_data_pipeline_spark run-daily \
        --date 2026-01-15 --warehouse /tmp/wh
    python -m procurement_data_pipeline_spark list-queries
    python -m procurement_data_pipeline_spark run-query net_demand_mrp \
        --sf-dir /root/testdata/sf0.01 --limit 20

Cluster deployments submit this module via spark-submit with the package
wheel on --py-files; locally it builds the same session the tests use.
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_run_daily(args: argparse.Namespace) -> int:
    from procurement_data_pipeline_spark.plans.procurement import run_daily
    from procurement_data_pipeline_spark.session import get_session

    spark = get_session("run-daily")
    _, results = run_daily(spark, args.warehouse, args.date, seed=args.seed)
    print(json.dumps({name: str(out) for name, out in results.items()}, indent=2))
    return 0


def _cmd_list_queries(args: argparse.Namespace) -> int:
    from procurement_data_pipeline_spark.registry import load_all

    for name, spec in sorted(load_all().items()):
        kind = "oracle" if spec.oracle is not None else "rows-only"
        tags = ",".join(spec.tags)
        print(f"{name}\t{kind}\t{tags}")
    return 0


def _cmd_run_query(args: argparse.Namespace) -> int:
    from procurement_data_pipeline_spark.caching import release_cached
    from procurement_data_pipeline_spark.registry import load_all
    from procurement_data_pipeline_spark.session import get_session

    specs = load_all()
    if args.name not in specs:
        print(f"unknown query: {args.name} (see list-queries)", file=sys.stderr)
        return 2
    spark = get_session("run-query")
    try:
        df = specs[args.name].builder(spark, args.sf_dir)
        df.show(args.limit, truncate=False)
    finally:
        release_cached()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="procurement_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    daily = sub.add_parser("run-daily", help="run the daily procurement pipeline")
    daily.add_argument("--date", required=True, help="data date YYYY-MM-DD")
    daily.add_argument("--warehouse", required=True, help="warehouse root dir")
    daily.add_argument("--seed", type=int, default=42)
    daily.set_defaults(fn=_cmd_run_daily)

    lq = sub.add_parser("list-queries", help="list declared queries")
    lq.set_defaults(fn=_cmd_list_queries)

    rq = sub.add_parser("run-query", help="run one declared query")
    rq.add_argument("name")
    rq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    rq.add_argument("--limit", type=int, default=20)
    rq.set_defaults(fn=_cmd_run_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
