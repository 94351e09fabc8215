"""Shared-session multi-tenancy: concurrent query execution must equal
serial execution.

A long-lived Spark session serves many callers at once (dashboards, the
DAG runner, ad-hoc users). Spark plans are immutable and jobs schedule
independently, so concurrency should be invisible to results — but
engine-side state this repo adds (the scoped-persist pool, broadcast
scalar builds, eager bloom builds) could in principle leak across
threads. This suite pins the contract: N queries raced on one session
return exactly what they return serially."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from procurement_data_pipeline_spark.caching import release_cached
from procurement_data_pipeline_spark.registry import load_all

# A mix that exercises persist-pool users, scalar broadcasts, an eager
# bloom build, windows, and a plain aggregate.
QUERIES = [
    "agg_orders_daily",
    "events_kmv_distinct_users",
    "lineitem_bloom_pruned_revenue",
    "events_ab_cuped",
    "orders_kaplan_meier",
    "tpch_q6_revenue_forecast",
]


def _run(spark, sf_dir, name):
    rows = load_all()[name].builder(spark, sf_dir).collect()
    return sorted(map(tuple, rows))


def test_concurrent_execution_equals_serial(spark, sf_dir):
    serial = {n: _run(spark, sf_dir, n) for n in QUERIES}
    release_cached()
    with ThreadPoolExecutor(max_workers=len(QUERIES)) as pool:
        futures = {n: pool.submit(_run, spark, sf_dir, n) for n in QUERIES}
        concurrent = {n: f.result(timeout=300) for n, f in futures.items()}
    release_cached()
    for n in QUERIES:
        assert concurrent[n] == serial[n], f"{n} diverged under concurrency"


def test_release_during_foreign_query_is_safe(spark, sf_dir):
    """release_cached() from one tenant while another tenant's
    persist-using query is mid-flight must not corrupt results — persist
    keeps lineage, so an early release recomputes, never breaks."""
    specs = load_all()
    with ThreadPoolExecutor(max_workers=2) as pool:
        fut = pool.submit(_run, spark, sf_dir, "events_kmv_type_overlap")
        release_cached()  # the hostile interleaving
        got = fut.result(timeout=300)
    want = _run(spark, sf_dir, "events_kmv_type_overlap")
    release_cached()
    assert got == want
