"""Data-observability DAG: the monitors a 100 TB table needs, as one run.

The engine now carries each detector individually — declarative
expectations (operators/expectations), distribution drift
(events_value_drift_chi2's χ² core), distinctness tracking
(llm_ops/kmv + streaming state), heavy hitters (llm_ops/sketch) — and
this DAG composes them through the Pipeline runner the way an
orchestrator would schedule a nightly observability job:

    gate ─┬─ drift ────┬─ report
          ├─ distincts ┤
          └─ hitters ──┘

* gate      — expectations pass over the fact table; violations counted,
              clean rows feed the detectors (bad rows can't skew drift).
* drift     — per-type χ² between the window's two halves (rational
              arithmetic; NULL = type absent from one period = maximal
              drift, reported as an alert, not silence).
* distincts — merges today's KMV sketch into the persisted state
              (crash-safe swap, idempotent under replay), then reports
              each group's estimate — the "did cardinality jump?" signal.
* hitters   — space-saving top keys with the mergeable error bounds; the
              "one user is 40% of traffic" signal.
* report    — ONE summary row per monitor: name, observed value, alert
              flag. The artifact a scheduler gates on and a human reads.

Every stage is failure-isolated by the runner (a broken detector yields
its error row; the others still report). Per-stage cost: one scan each,
all bounded-state — the whole DAG is schedulable hourly at any volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.caching import scoped_persist
from procurement_data_pipeline_spark.llm_ops.kmv import kmv_bottom_k, kmv_hash
from procurement_data_pipeline_spark.llm_ops.sketch import frequent_items
from procurement_data_pipeline_spark.operators.expectations import (
    check,
    in_range,
    isin,
    not_null,
)
from procurement_data_pipeline_spark.plans.runner import Pipeline
from procurement_data_pipeline_spark.registry import load_all
from procurement_data_pipeline_spark.streaming.cardinality import (
    kmv_state_estimates,
    merge_kmv_state,
)

KMV_K = 64
TOP_SHARE_ALERT = 0.25  # one key owning >25% of rows
DRIFT_CHI2_ALERT = 30.0  # ~p<1e-4 at dof 9; generous for a nightly gate
DISTINCT_JUMP_ALERT = 2.0  # estimate more than doubled vs prior state


def run_monitoring(
    spark: SparkSession,
    sf_dir: str,
    state_dir: str,
    event_types: tuple[str, ...] = ("click", "error", "purchase", "signup", "view"),
) -> DataFrame:
    """Execute the observability DAG; returns the report DataFrame
    (monitor, subject, value, alert)."""
    from procurement_data_pipeline_spark.sources.tables import load_table

    p = Pipeline("monitoring")

    @p.task("gate")
    def _gate(ctx):
        ev = load_table(spark, sf_dir, "events")
        clean, quarantine, summary = check(
            ev,
            [
                not_null("user_id"),
                not_null("ts"),
                in_range("value", 0.0, 1e6),
                isin("event_type", list(event_types)),
            ],
        )
        ctx["clean"] = scoped_persist(clean)
        return [
            ("expectations", r["expectation"], float(r["n_violations"]),
             bool(r["n_violations"] > 0))
            for r in summary.collect()
        ]

    @p.task("drift", deps=("gate",))
    def _drift(ctx):
        rows = load_all()["events_value_drift_chi2"].builder(spark, sf_dir).collect()
        return [
            (
                "drift_chi2",
                r["event_type"],
                float(r["chi2"]) if r["chi2"] is not None else float("nan"),
                (r["chi2"] is None) or (r["chi2"] > DRIFT_CHI2_ALERT),
            )
            for r in rows
        ]

    @p.task("distincts", deps=("gate",))
    def _distincts(ctx):
        state = state_dir.rstrip("/") + "/kmv_users"
        prior = {}
        try:
            prior = {
                r["g"]: r["est_distinct"]
                for r in kmv_state_estimates(spark, state, KMV_K).collect()
            }
        except Exception:  # noqa: BLE001 — first run: no state yet
            prior = {}
        sk = kmv_bottom_k(
            ctx["clean"].select(
                F.col("event_type").alias("g"), kmv_hash("user_id").alias("h")
            ),
            ["g"],
            "h",
            KMV_K,
        )
        merge_kmv_state(spark, state, sk, ["g"], KMV_K)
        out = []
        for r in kmv_state_estimates(spark, state, KMV_K).collect():
            jumped = (
                r["g"] in prior
                and prior[r["g"]] > 0
                and r["est_distinct"] / prior[r["g"]] > DISTINCT_JUMP_ALERT
            )
            out.append(("distinct_users", r["g"], float(r["est_distinct"]), jumped))
        return out

    @p.task("hitters", deps=("gate",))
    def _hitters(ctx):
        clean = ctx["clean"]
        total = clean.count()
        top = frequent_items(clean, "user_id", k=3, capacity=256).collect()
        return [
            (
                "heavy_hitter",
                str(r["item"]),
                r["count_hi"] / max(total, 1),
                r["count_hi"] / max(total, 1) > TOP_SHARE_ALERT,
            )
            for r in top
        ]

    ctx: dict = {}
    results = p.run(ctx)
    # The report is assembled OUTSIDE the task graph: the runner's
    # trigger-rule skips dependents of a failed task, but an
    # observability report must publish even when a detector breaks —
    # a broken detector is itself the alert.
    rows = []
    for task in ("gate", "drift", "distincts", "hitters"):
        if results[task].status != "success":
            rows.append((task, "<failed>", float("nan"), True))
        else:
            rows.extend(ctx[task])
    return spark.createDataFrame(
        rows, "monitor string, subject string, value double, alert boolean"
    )
