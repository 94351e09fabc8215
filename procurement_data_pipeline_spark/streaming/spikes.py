"""Streaming burst detection: the events_rate_spikes baseline as live state.

The batch ``events_rate_spikes`` query (queries/flows.py) flags hours whose
count exceeds 3× the median of the SAME clock-hour over the previous 7
observed days. This operator maintains that rolling 7-slot baseline as
keyed state under ``applyInPandasWithState``, so the pager fires within a
microbatch of the hour closing instead of after the nightly batch.

Stream-equals-batch contract: rows arrive at the (event_type, day, hr)
grain (the hourly rollup the ingest already produces), day-ordered per
key — the state then holds exactly the batch query's ROWS 7 PRECEDING..1
PRECEDING frame, and every emitted spike row carries the identical
integers and the identical single-division ratio. The equivalence test
asserts exact values, the same evidence class as streaming_croston.

State per (event_type, hr) key is ≤7 (epoch_day, count) pairs — O(types ×
24) storage, independent of event volume.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_FACTOR = 3  # spike threshold multiplier, matching the batch query
_BASE = 7  # baseline slots (previous observed same-hour days)

SPIKE_STREAM_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("hr", LongType()),
        StructField("epoch_day", LongType()),
        StructField("n_events", LongType()),
        StructField("baseline_median", LongType()),
        StructField("spike_ratio", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("days", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def _update_spikes(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    event_type, hr = key
    if state.exists:
        days, counts = state.get
        days, counts = list(days), list(counts)
    else:
        days, counts = [], []
    rows = pd.concat(list(batches), ignore_index=True)
    rows = rows.sort_values("epoch_day")
    out: list[dict] = []
    for _, r in rows.iterrows():
        day = int(r["epoch_day"])
        n = int(r["n_events"])
        if len(counts) == _BASE:
            med = sorted(counts)[(_BASE - 1) // 2]  # 4th smallest of 7
            if n > _FACTOR * med:
                out.append(
                    {
                        "event_type": event_type,
                        "hr": int(hr),
                        "epoch_day": day,
                        "n_events": n,
                        "baseline_median": med,
                        "spike_ratio": float(n) / float(med),
                    }
                )
        days.append(day)
        counts.append(n)
        if len(counts) > _BASE:
            days, counts = days[-_BASE:], counts[-_BASE:]
    state.update((days, counts))
    if out:
        yield pd.DataFrame(out)


def streaming_rate_spikes(hourly: DataFrame) -> DataFrame:
    """``hourly``: a streaming DataFrame with columns (event_type string,
    hr long, epoch_day long, n_events long), day-ordered per key."""
    return hourly.groupBy("event_type", "hr").applyInPandasWithState(
        _update_spikes,
        outputStructType=SPIKE_STREAM_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
