"""Custom stateful streaming operator: per-user running activity stats.

Built-in streaming aggregates (window/session counts) cover the reference
surface; this operator demonstrates the *custom* stateful path —
``applyInPandasWithState`` — for semantics the built-ins can't express:
a per-key running profile (lifetime event count, exact value total, last-seen
timestamp) that emits an updated row every microbatch and expires keys idle
past a processing-time timeout.

Scale shape: state lives in the executor state store partitioned by the
grouping key (user_id), so state volume scales horizontally with executors;
each microbatch shuffles only that batch's rows to their key partitions.
Value totals accumulate in exact integer micros (see functions.money) so
re-partitioning/replay cannot change results.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RUNNING_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events_total", LongType()),
        StructField("value_total", DoubleType()),
        StructField("last_event_type", StringType()),
        StructField("last_ts", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("value_micros", LongType()),
        StructField("last_event_type", StringType()),
        StructField("last_ts_micros", LongType()),
    ]
)

_MICROS = 1_000_000


def _update_user_stats(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        n_events, value_micros, last_type, last_ts_micros = state.get
    else:
        n_events, value_micros, last_type, last_ts_micros = 0, 0, None, 0
    for pdf in batches:
        n_events += len(pdf)
        value_micros += int((pdf["value"] * _MICROS).floordiv(1).sum())
        newest = pdf["ts"].idxmax()
        ts_micros = int(pdf["ts"][newest].value // 1000)
        if ts_micros >= last_ts_micros:
            last_ts_micros = ts_micros
            last_type = str(pdf["event_type"][newest])
    state.update((n_events, value_micros, last_type, last_ts_micros))
    state.setTimeoutDuration(3600 * 1000)  # expire after 1h idle
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events_total": [n_events],
            "value_total": [value_micros / _MICROS],
            "last_event_type": [last_type],
            "last_ts": [pd.Timestamp(last_ts_micros, unit="us")],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running stats stream (one updated row per active user per
    microbatch; keys expire after 1 hour of processing-time inactivity)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
