"""Exact global ranks and NTILEs without the single-partition sort.

``Window.orderBy(...)`` with no ``partitionBy`` compiles to ``Exchange
SinglePartition`` + Sort: every input row moves to ONE task and is sorted
there. Over a tiny aggregated relation that is fine; over an entity-grain
relation (customers, users, suppliers — sf-proportional) it is the
one-executor bottleneck VERDICT r7 flagged: at 100 TB a global NTILE over
~1e9 customers would serialize the whole query behind a single sort.

Spark's own global ``orderBy`` already knows the distributed answer:
range-partition on the sort keys, sort each partition locally, and the
concatenation of partitions IS the total order. A global ROW_NUMBER only
additionally needs to know how many rows precede each partition. So:

1. ``repartitionByRange(n, *keys)`` — one shuffle; partition i holds a
   contiguous key range, ranges ascend with i;
2. count rows per partition (map-side combined — the counts relation has
   at most ``n`` rows);
3. prefix offsets over those ≤n rows via a broadcast triangular join
   (NOT a window — a window would re-introduce the single-partition sort
   this module exists to remove; a BNLJ over ≤n² tiny rows is the repo's
   allowlisted bounded-scalar pattern);
4. local position within each partition + the partition's offset =
   the EXACT global rank. The local position is free: after
   ``sortWithinPartitions``, ``monotonically_increasing_id``'s low 33
   bits are the 0-based row index in physical (= sorted) order and its
   high bits are the partition id — no pid window, no second shuffle.
   Values are independent of where the sampled range boundaries fall —
   boundaries only move work between partitions, never reorder keys — so
   results are deterministic and hash-stable even though
   ``repartitionByRange`` samples.

NTILE is then pure arithmetic on (rank, total): the SQL-standard tiling
puts ``m % n`` groups of size ``m div n + 1`` first — no second sort.

Precedent: queries/tsadvanced.py's two-stage bucket selection (round 6)
removed the same bottleneck for order-statistic SELECTION; this module
generalizes it to full rank ASSIGNMENT.

Cost model: rank/NTILE cost ONE distributed shuffle of the relation
(the range partitioning; local sort + id projection ride the same
stage) plus one bounded broadcast — versus one shuffle of everything
into a single task. cumsum/cummax additionally pay a pid-hash exchange
for their running-aggregate window. At any scale where the relation
exceeds one executor's sort budget, this wins; below that the overhead
is a handful of small scheduled jobs (measured at sf0.1: fixed ~0.5-2 s
per call — the documented small-scale trade).

Caller contract: ``order_cols`` must define a STRICT total order (add a
unique tie-break column — every call site here appends the entity key).
``repartitionByRange`` samples its child with a separate job before the
shuffle, so PERSIST an expensive input (an aggregate of a fact table)
before calling — otherwise the aggregate runs twice.
With ties, ``row_number`` within a partition would be nondeterministic in
both forms; the single-partition window has the same contract.

The correctness twin of each caller is a DuckDB ``ROW_NUMBER()/NTILE()
OVER (ORDER BY ...)`` — ranks are integers, so downstream integer
arithmetic hashes bit-for-bit (memory: engine-parity toolbox).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.caching import scoped_persist

_PID = "_gr_pid"
_CNT = "_gr_c"
_OFF = "_gr_off"
_TOT = "_gr_m"


def _as_cols(order_cols) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def _range_partitioned(
    df: DataFrame, cols: list[Column], num_partitions: int | None
) -> DataFrame:
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    # explicit partition count: AQE never coalesces user-specified counts,
    # and empty partitions simply don't appear in the counts relation
    return scoped_persist(
        df.repartitionByRange(n, *cols).withColumn(_PID, F.spark_partition_id())
    )


def _prefix_offsets(
    per_pid: DataFrame,
    agg_col: str,
    fn=F.sum,
    coalesce_zero: bool = True,
) -> DataFrame:
    """Exclusive prefix aggregates of ``agg_col`` over the ≤n-row per-pid
    relation, via the broadcast triangular join (NOT a window — a window
    would re-introduce the single-partition sort this module removes).
    ``coalesce_zero=False`` keeps the empty prefix NULL (cummax's
    empty-preceding-frame semantics); the default 0 is the rank/cumsum
    identity."""
    a, b = per_pid.alias("_gra"), per_pid.alias("_grb")
    agg = fn(f"_grb.{agg_col}")
    if coalesce_zero:
        agg = F.coalesce(agg, F.lit(0))
    return (
        a.join(
            F.broadcast(b),
            F.col(f"_grb.{_PID}") < F.col(f"_gra.{_PID}"),
            "left",
        )
        .groupBy(F.col(f"_gra.{_PID}").alias(_PID))
        .agg(agg.alias(_OFF))
    )


def _ranked(
    df: DataFrame, order_cols, num_partitions: int | None
) -> tuple[DataFrame, DataFrame]:
    """(rows with _gr_pid/_gr_off/_gr_loc attached, per-pid counts).

    The local position within each range partition comes from
    ``monotonically_increasing_id`` over the partition-sorted rows —
    Spark's id is ``(partitionId << 33) + rowIndexInPartition``, assigned
    in physical row order, so after ``sortWithinPartitions`` the low bits
    ARE the 0-based local rank and the high bits ARE the partition id.
    This replaces a ``Window.partitionBy(pid)`` over the same rows, which
    would re-shuffle the whole relation by pid (Catalyst cannot know the
    rows are already pid-co-located) — one materialization, zero extra
    exchanges. The nondeterministic id is pinned by the persist and is
    deterministic on recompute anyway (same partitioning, same sort).
    """
    cols = _as_cols(order_cols)
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    mid = "_gr_mid"
    part = scoped_persist(
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn(mid, F.monotonically_increasing_id())
        .withColumn(_PID, F.shiftright(F.col(mid), 33))
        .withColumn(
            "_gr_loc",
            F.col(mid).bitwiseAND(F.lit((1 << 33) - 1)).cast("long"),
        )
        .drop(mid)
    )
    counts = part.groupBy(_PID).agg(F.count(F.lit(1)).alias(_CNT))
    offs = _prefix_offsets(counts, _CNT).withColumn(
        _OFF, F.col(_OFF).cast("long")
    )
    return part.join(F.broadcast(offs), _PID), counts


def with_global_rank(
    df: DataFrame,
    order_cols,
    rank_col: str = "grank",
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` + an exact global ROW_NUMBER column over ``order_cols``
    (which must be a strict total order — see the module contract)."""
    joined, _counts = _ranked(df, order_cols, num_partitions)
    return joined.withColumn(
        rank_col, (F.col("_gr_loc") + F.col(_OFF) + 1).cast("long")
    ).drop(_PID, _OFF, "_gr_loc")


def _ntile_expr(rank: Column, total: Column, n_tiles: int) -> Column:
    """SQL-standard NTILE from an exact global rank: the first ``m % n``
    tiles take ``m div n + 1`` rows, the rest ``m div n``. Pure integer
    arithmetic (floor-division via exact double division of sub-2^53
    counts), identical in Spark and DuckDB."""
    base = F.floor((total - total % n_tiles) / n_tiles).cast("long")
    rem = (total % n_tiles).cast("long")
    cut = rem * (base + F.lit(1))
    return (
        F.when(rank <= cut, F.floor((rank - 1) / (base + 1)))
        .otherwise(rem + F.floor((rank - cut - 1) / base))
        .cast("long")
        + F.lit(1)
    ).cast("int")


def with_global_ntile(
    df: DataFrame,
    order_cols,
    n_tiles: int,
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` + an exact NTILE(n_tiles) column over ``order_cols`` (strict
    total order required). The row total comes from summing the per-pid
    counts relation — no extra pass over the data."""
    joined, counts = _ranked(df, order_cols, num_partitions)
    tot = counts.agg(F.sum(_CNT).cast("long").alias(_TOT))
    rank = (F.col("_gr_loc") + F.col(_OFF) + 1).cast("long")
    return (
        joined.crossJoin(F.broadcast(tot))
        .withColumn(tile_col, _ntile_expr(rank, F.col(_TOT), n_tiles))
        .drop(_PID, _OFF, _TOT, "_gr_loc")
    )


def with_global_ntile_sliced(
    df: DataFrame,
    slice_col: str,
    order_cols,
    n_tiles: int,
    tile_col: str = "tile",
    n_slices: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact per-slice NTILE over a union of EQUAL-SIZED slices — N
    independent global tilings for the price of ONE distributed rank pass.

    ``df`` must hold ``n_slices`` slices tagged ``slice_col`` ∈
    0..n_slices−1, each with exactly ``total/n_slices`` rows (the caller
    explodes one row per entity per metric — customer_rfm's three RFM
    orderings are the motivating case). One range-partition shuffle over
    (slice, *order_cols) ranks every slice at once; because slices are
    equal-sized, slice s occupies exactly the global ranks
    (s·m, s·m+1, …], so the slice-local rank is ``grank − s·m`` — no
    per-slice counts needed. NTILE values are identical to running
    :func:`with_global_ntile` once per slice (same ordering, same
    arithmetic), at one shuffle + one persist instead of N of each.

    ``order_cols`` + the entity key must be a strict total order within
    each slice (module contract). Encode descending metrics by negating
    the key column (exact for integer keys).
    """
    if n_slices is None:
        raise ValueError("n_slices is required (equal-sized-slice contract)")
    cols = [F.col(slice_col).asc(), *_as_cols(order_cols)]
    joined, counts = _ranked(df, cols, num_partitions)
    tot = counts.agg(F.sum(_CNT).cast("long").alias(_TOT))
    grank = (F.col("_gr_loc") + F.col(_OFF) + 1).cast("long")
    m = F.expr(f"{_TOT} div {n_slices}").cast("long")
    rank_in = grank - F.col(slice_col).cast("long") * m
    return (
        joined.crossJoin(F.broadcast(tot))
        .withColumn(tile_col, _ntile_expr(rank_in, m, n_tiles))
        .drop(_PID, _OFF, _TOT, "_gr_loc")
    )


def with_global_cumsum(
    df: DataFrame,
    order_cols,
    value_col: str,
    out_col: str = "cumsum",
    include_current: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` + the exact running sum of ``value_col`` over the global
    ``order_cols`` order (strict total order required), distributed the
    same way as :func:`with_global_rank`: per-partition value totals give
    exclusive prefix offsets, a partition-local running-sum window does
    the rest. ``include_current=False`` gives the EXCLUSIVE prefix sum
    (#/Σ of strictly-preceding rows — the building block for rank-of-
    value-class midranks).

    Exactness: the sum runs in ``value_col``'s own type, grouped by
    partition — identical accumulation class as a no-partition window
    (use integer/decimal values for cross-engine hashes; the module
    contract's ordered-fold caveat for doubles applies to BOTH forms).
    """
    return _cumagg(
        df, order_cols, value_col, out_col, "sum", include_current, num_partitions
    )


def with_global_cummax(
    df: DataFrame,
    order_cols,
    value_col: str,
    out_col: str = "cummax",
    include_current: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact running MAX over the global order, same machinery as
    :func:`with_global_cumsum` (max is associative, so per-partition
    maxima combine with prefix maxima). With ``include_current=False``
    the first row's prefix is NULL — matching a window frame with an
    empty preceding range (the skyline/dominance convention)."""
    return _cumagg(
        df, order_cols, value_col, out_col, "max", include_current, num_partitions
    )


def _cumagg(
    df: DataFrame,
    order_cols,
    value_col: str,
    out_col: str,
    agg: str,
    include_current: bool,
    num_partitions: int | None,
) -> DataFrame:
    cols = _as_cols(order_cols)
    part = _range_partitioned(df, cols, num_partitions)
    fn = F.sum if agg == "sum" else F.max
    sums = part.groupBy(_PID).agg(fn(value_col).alias(_CNT))
    # empty prefix stays NULL here: cumsum coalesces below (sum identity 0
    # would also work, but the value column's own type must be preserved),
    # cummax NEEDS the NULL (empty-preceding-frame semantics)
    offs = _prefix_offsets(sums, _CNT, fn=fn, coalesce_zero=False)
    lo = Window.unboundedPreceding
    hi = 0 if include_current else -1
    wloc = Window.partitionBy(_PID).orderBy(*cols).rowsBetween(lo, hi)
    running = fn(value_col).over(wloc)
    if agg == "sum":
        zero = F.lit(0)
        combined = F.coalesce(running, zero) + F.coalesce(F.col(_OFF), zero)
    else:
        # greatest skips NULLs (empty local frame / empty prefix) and is
        # NULL only when BOTH are — exactly the empty-preceding-frame
        # semantics of the window form
        combined = F.greatest(running, F.col(_OFF))
    return (
        part.join(F.broadcast(offs), _PID)
        .withColumn(out_col, combined)
        .drop(_PID, _OFF)
    )


__all__ = [
    "with_global_rank",
    "with_global_ntile",
    "with_global_ntile_sliced",
    "with_global_cumsum",
    "with_global_cummax",
]
