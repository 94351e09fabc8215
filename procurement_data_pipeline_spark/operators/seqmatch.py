"""Event-sequence pattern matching (MATCH_RECOGNIZE-style) over sessions.

The reference engine's analytics stop at set-based SQL; modern clickstream
warehouses add row-pattern recognition (SQL:2016 MATCH_RECOGNIZE — public
spec; Flink/Trino both ship it, Spark does not). This module supplies the
Spark-native equivalent for the common case where the pattern alphabet is a
per-row classification: encode each event as one character, assemble the
per-session string in event-time order, and run ordinary regular expressions
over it. A regex over a session string is exactly a row-pattern match whose
row predicates are single-row classifications — which covers funnels,
retry bursts, bounce detection, and "A eventually followed by B" without a
per-pattern join cascade.

Scale shape: ONE shuffle on the session key; per-session strings are bounded
by session length (the 30-minute gap guarantees sessions end), so state never
exceeds a session — the same bound Structured Streaming's session windows
rely on. Pattern evaluation is a JVM-side ``rlike`` per session row: no
Python, no second shuffle, patterns added for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Default one-character alphabet for the events table's event_type domain.
DEFAULT_ALPHABET: dict[str, str] = {
    "view": "V",
    "click": "C",
    "purchase": "P",
    "signup": "S",
    "error": "E",
}
OTHER_CHAR = "O"


def encode_event(event_type: str | Column, alphabet: dict[str, str] | None = None) -> Column:
    """Map an event-type column onto the single-character pattern alphabet."""
    alphabet = DEFAULT_ALPHABET if alphabet is None else alphabet
    col = F.col(event_type) if isinstance(event_type, str) else event_type
    expr: Column | None = None
    for etype, ch in alphabet.items():
        expr = F.when(col == etype, ch) if expr is None else expr.when(col == etype, ch)
    assert expr is not None, "alphabet must not be empty"
    return expr.otherwise(OTHER_CHAR)


def sessionize(
    events: DataFrame,
    gap_min: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: adds ``ts_us`` (event-time micros) and
    ``session_idx`` (1-based per-user session ordinal). A new session starts
    when the gap to the previous event exceeds ``gap_min`` minutes — the
    same contract as the batch/streaming sessionization queries, kept as a
    reusable operator so sequence analytics can't drift from it.

    One shuffle on ``user_col``; both window functions reuse it.
    """
    ev = events.withColumn("ts_us", F.unix_micros(F.col(ts_col)))
    w = Window.partitionBy(user_col).orderBy("ts_us", id_col)
    prev = F.lag("ts_us").over(w)
    is_new = (
        F.when(F.col("ts_us") - prev > gap_min * 60 * 1_000_000, 1)
        .when(prev.isNull(), 1)
        .otherwise(0)
    )
    return ev.withColumn("_is_new", is_new).withColumn(
        "session_idx",
        F.sum("_is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_is_new")


def session_sequences(
    events: DataFrame,
    gap_min: int,
    alphabet: dict[str, str] | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per session with its event-character string ``seq``.

    The collect_list is unordered by contract; determinism comes from
    array_sort over (ts_us, id) structs before the characters are joined —
    id breaks timestamp ties, so the string is unique for a given input.
    """
    sess = sessionize(events, gap_min, user_col, ts_col, id_col).withColumn(
        "_ch", encode_event(type_col, alphabet)
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("ts_us"), F.col(id_col).alias("_id"), F.col("_ch")))
    )
    return sess.groupBy(user_col, "session_idx").agg(
        F.array_join(F.transform(ordered, lambda x: x["_ch"]), "").alias("seq")
    )


def match_patterns(sessions: DataFrame, patterns: dict[str, str]) -> DataFrame:
    """Count sessions matching each named regex in ONE aggregation pass.

    Returns (pattern, n_sessions) long-form rows. All patterns evaluate as
    JVM ``rlike`` predicates inside a single global aggregate — adding a
    pattern adds a codegen'd expression, not a pass over the data.
    """
    aggs = [
        F.sum(F.when(F.col("seq").rlike(rx), 1).otherwise(0)).cast("long").alias(name)
        for name, rx in patterns.items()
    ]
    counts = sessions.agg(*aggs)
    stack_args = ", ".join(f"'{name}', {name}" for name in patterns)
    return counts.select(
        F.expr(f"stack({len(patterns)}, {stack_args}) as (pattern, n_sessions)")
    )
