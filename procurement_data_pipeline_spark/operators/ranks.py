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
4. local ``row_number`` within each partition + the partition's offset =
   the EXACT global rank. Values are independent of where the sampled
   range boundaries fall — boundaries only move work between partitions,
   never reorder keys — so results are deterministic and hash-stable
   even though ``repartitionByRange`` samples.

NTILE is then pure arithmetic on (rank, total): the SQL-standard tiling
puts ``m % n`` groups of size ``m div n + 1`` first — no second sort.

Precedent: queries/tsadvanced.py's two-stage bucket selection (round 6)
removed the same bottleneck for order-statistic SELECTION; this module
generalizes it to full rank ASSIGNMENT.

Cost model: two distributed shuffles of the relation (range + the
pid-hash exchange the local window needs) and one bounded broadcast —
versus one shuffle of everything into a single task. At any scale where
the relation exceeds one executor's sort budget, this wins; below that,
AQE-sized partitions make the overhead a few empty tasks.

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


def _ranked(
    df: DataFrame, order_cols, num_partitions: int | None
) -> tuple[DataFrame, DataFrame]:
    """(rows with _gr_pid/_gr_off attached, per-pid counts relation)."""
    cols = _as_cols(order_cols)
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    # explicit partition count: AQE never coalesces user-specified counts,
    # and empty partitions simply don't appear in the counts relation
    part = scoped_persist(
        df.repartitionByRange(n, *cols).withColumn(_PID, F.spark_partition_id())
    )
    counts = part.groupBy(_PID).agg(F.count(F.lit(1)).alias(_CNT))
    a, b = counts.alias("_gra"), counts.alias("_grb")
    offs = (
        a.join(
            F.broadcast(b),
            F.col(f"_grb.{_PID}") < F.col(f"_gra.{_PID}"),
            "left",
        )
        .groupBy(F.col(f"_gra.{_PID}").alias(_PID))
        .agg(
            F.coalesce(F.sum(f"_grb.{_CNT}"), F.lit(0)).cast("long").alias(_OFF)
        )
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
    cols = _as_cols(order_cols)
    joined, _counts = _ranked(df, order_cols, num_partitions)
    wloc = Window.partitionBy(_PID).orderBy(*cols)
    return (
        joined.withColumn(
            rank_col, (F.row_number().over(wloc) + F.col(_OFF)).cast("long")
        )
        .drop(_PID, _OFF)
    )


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
    cols = _as_cols(order_cols)
    joined, counts = _ranked(df, order_cols, num_partitions)
    tot = counts.agg(F.sum(_CNT).cast("long").alias(_TOT))
    wloc = Window.partitionBy(_PID).orderBy(*cols)
    rank = (F.row_number().over(wloc) + F.col(_OFF)).cast("long")
    return (
        joined.crossJoin(F.broadcast(tot))
        .withColumn(tile_col, _ntile_expr(rank, F.col(_TOT), n_tiles))
        .drop(_PID, _OFF, _TOT)
    )


__all__ = ["with_global_rank", "with_global_ntile"]
