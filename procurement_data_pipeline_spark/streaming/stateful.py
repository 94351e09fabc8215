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


SCD2_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("version", LongType()),
        StructField("event_type", StringType()),
        StructField("valid_from_us", LongType()),
        StructField("valid_to_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

_SCD2_STATE_SCHEMA = StructType(
    [
        StructField("cur_type", StringType()),
        StructField("valid_from_us", LongType()),
        StructField("n_events", LongType()),
        StructField("version", LongType()),
    ]
)


def _make_update_scd2(timeout_ms: int | None):
    """Factory: the per-group update closure captures the timeout via
    cloudpickle, so the configured value travels to the workers (a module
    global would reset to its default when workers re-import)."""

    def _update_scd2(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            cur_type, valid_from, n_events, version = state.get
        else:
            cur_type, valid_from, n_events, version = None, 0, 0, 0
        closed: list[tuple] = []
        pdf = pd.concat(list(batches), ignore_index=True)
        pdf["ts_us"] = pdf["ts"].astype("int64") // 1000
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for ts_us, etype in zip(pdf["ts_us"], pdf["event_type"]):
            if cur_type is None:
                cur_type, valid_from, n_events, version = str(etype), int(ts_us), 1, 1
            elif str(etype) == cur_type:
                n_events += 1
            else:
                closed.append(
                    (user_id, version, cur_type, valid_from, int(ts_us), n_events)
                )
                cur_type, valid_from, n_events = str(etype), int(ts_us), 1
                version += 1
        state.update((cur_type, valid_from, n_events, version))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "version",
                    "event_type",
                    "valid_from_us",
                    "valid_to_us",
                    "n_events",
                ],
            )

    return _update_scd2


def streaming_scd2(events: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Streaming SCD Type-2 run compaction: per-user state carries the OPEN
    interval (current type, start, count, version) across microbatches and
    emits each interval the moment a type change CLOSES it — append-mode
    output, so every emitted row is final and warehouse-appendable.

    Matches the batch ``events_user_state_scd2`` exactly on the closed
    intervals (pytest-asserted across a forced multi-batch run) PROVIDED
    each user's rows arrive in event-time order across triggers — true for
    time-partitioned file ingest. Out-of-order arrivals within one
    microbatch are repaired by the per-batch sort; across microbatches
    they would mis-chain (the documented limit of append-final emission:
    re-sequence late sources with the batch builder instead).

    Scale: state is one tiny tuple per USER (not per event), store-
    partitioned by user_id. By default state never expires — correct
    versioning requires remembering every user's open run. Pass
    ``timeout_ms`` to bound state for unbounded key spaces, accepting the
    documented trade: an expired user's OPEN interval is dropped
    unemitted and their versions restart at 1 on return, so downstream
    must treat (user_id, version) as unique only within a state epoch.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_scd2(timeout_ms),
        outputStructType=SCD2_SCHEMA,
        stateStructType=_SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
