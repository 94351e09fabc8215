"""Ordered-funnel analysis — multi-stage conversion in ONE pass.

"How many users did view → click → purchase, in that order?" The textbook
SQL is a cascade of N self-joins/aggregations (one per stage). Here each
user's events collapse into one sorted array and a single ``aggregate``
lambda walks it carrying (stage-reached, stage-time) state — the greedy
earliest-match walk, which is optimal for funnels (taking the earliest
qualifying time for stage k can only enlarge the candidate set for stage
k+1). One shuffle on the user key, O(events-per-user) work per user,
whole-stage codegen (no UDF), and adding funnel stages costs zero extra
passes.

Per-user event volume is bounded by the same invariant sessionization
relies on; a hot user caps at its own array walk, not a join explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(stage: int 1-based, stage_name, n_users) — users whose event history
    contains the stage prefix in STRICTLY increasing time order (an
    equal-timestamp event cannot satisfy the next stage — tie semantics
    are then independent of any secondary sort order, and the greedy walk
    is exactly the strict MIN-cascade a SQL oracle expresses)."""
    n = len(stages)
    relevant = events.filter(F.col(type_col).isin(stages)).select(
        F.col(user_col).alias("_u"),
        F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("e")).alias("_ev"),
    )
    seqs = relevant.groupBy("_u").agg(
        F.sort_array(F.collect_list("_ev")).alias("_seq")
    )

    # state = (stage reached, time it was reached); one pass, carrying the
    # strict t > state.t requirement between consecutive stages. The init
    # time is a typed NULL so any orderable ts type works (timestamp,
    # epoch double/long, date); it is never compared — the stage==0 arm
    # of the OR admits the first stage unconditionally.
    expected = F.array(*[F.lit(s) for s in stages])
    init = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast(events.schema[ts_col].dataType).alias("t"),
    )
    walk = F.aggregate(
        F.col("_seq"),
        init,
        lambda acc, ev: F.when(
            (acc["stage"] < n)
            & (ev["e"] == F.element_at(expected, acc["stage"] + 1))
            & ((acc["stage"] == 0) | (ev["t"] > acc["t"])),
            F.struct(
                (acc["stage"] + 1).alias("stage"), ev["t"].alias("t")
            ),
        ).otherwise(acc),
    )
    reached = seqs.select(walk["stage"].alias("_reached")).filter(
        F.col("_reached") > 0
    )
    # count users at each stage ≤ reached (map-side Expand, one shuffle)
    return (
        reached.select(
            F.explode(F.sequence(F.lit(1), F.col("_reached"))).alias("stage")
        )
        .groupBy("stage")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            F.col("stage").cast("int").alias("stage"),
            F.element_at(expected, F.col("stage")).alias("stage_name"),
            "n_users",
        )
    )
