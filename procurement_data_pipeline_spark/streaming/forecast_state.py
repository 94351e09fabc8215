"""Streaming forecast maintenance: Croston state under applyInPandasWithState.

The batch ``part_croston_forecast`` query (queries/replenishment.py) folds
each part's day-ordered demand series once; this operator maintains the
SAME fold as live state, so the demand-planning forecast updates per
microbatch instead of per nightly rebuild. Because exponential smoothing
is a left fold over the arrival order, streamed state is BIT-IDENTICAL to
the batch fold whenever events arrive day-ordered per key (the warehouse
ingest order) — the equivalence test asserts exact doubles, not
tolerances, the same stream-equals-batch evidence class as streaming_scd2
and the KMV/Bloom sketch states.

State per part is four scalars (z, p, last epoch-day, n) — storage is
O(parts), independent of event volume; each microbatch shuffles only its
own rows to their key partitions. Days inside one microbatch are sorted
before folding, so a batch boundary can fall anywhere between days
without changing the result (intra-day order is already collapsed by the
daily-demand grain).
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
    StructField,
    StructType,
)

_ALPHA = 0.25  # exact binary smoothing weight, matching the batch query

CROSTON_STREAM_SCHEMA = StructType(
    [
        StructField("partkey", LongType()),
        StructField("n_demand_days", LongType()),
        StructField("smoothed_qty", DoubleType()),
        StructField("smoothed_gap", DoubleType()),
        StructField("croston_rate", DoubleType()),
    ]
)

_CROSTON_STATE_SCHEMA = StructType(
    [
        StructField("z", DoubleType()),
        StructField("p", DoubleType()),
        StructField("last_epoch_day", LongType()),
        StructField("n", LongType()),
    ]
)


def _update_croston(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (partkey,) = key
    if state.hasTimedOut:  # pragma: no cover - no timeout configured
        state.remove()
        return
    if state.exists:
        z, p, last_day, n = state.get
    else:
        z, p, last_day, n = 0.0, 0.0, -1, 0
    pdf = pd.concat(list(batches), ignore_index=True)
    # Day order within the batch; the daily grain makes days unique per key.
    pdf = pdf.sort_values("epoch_day")
    for day, qty in zip(pdf["epoch_day"], pdf["qty"]):
        day, q = int(day), float(qty)
        gap = 1.0 if n == 0 else float(day - last_day)
        if n == 0:
            z, p = q, gap  # seed with the first observation, gap := 1
        else:
            # identical IEEE ops, identical order to the batch fold
            z = z * (1.0 - _ALPHA) + q * _ALPHA
            p = p * (1.0 - _ALPHA) + gap * _ALPHA
        last_day = day
        n += 1
    state.update((z, p, last_day, n))
    yield pd.DataFrame(
        {
            "partkey": [partkey],
            "n_demand_days": [n],
            "smoothed_qty": [z],
            "smoothed_gap": [p],
            "croston_rate": [z / p],
        }
    )


def streaming_croston(daily_demand: DataFrame) -> DataFrame:
    """Maintain per-part Croston state over a stream of daily demand rows
    ``(partkey long, epoch_day long, qty long)``; emits the updated
    forecast row for every part seen in each microbatch (update mode).
    No state timeout: a part's forecast stays current until the next
    demand arrives — planning state is not session state."""
    return daily_demand.groupBy("partkey").applyInPandasWithState(
        _update_croston,
        outputStructType=CROSTON_STREAM_SCHEMA,
        stateStructType=_CROSTON_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


__all__ = ["streaming_croston", "CROSTON_STREAM_SCHEMA"]
