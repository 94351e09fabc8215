"""operators/ranks.py — distributed exact global rank / NTILE / cumsum /
cummax must agree bit-for-bit with the single-partition Window forms they
replace, for every partition count, and must never plan a
single-partition sort themselves."""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from procurement_data_pipeline_spark.operators.ranks import (
    with_global_cummax,
    with_global_cumsum,
    with_global_ntile,
    with_global_rank,
)

ORDER = lambda: [F.col("v").desc(), F.col("k").asc()]  # noqa: E731


@pytest.fixture(scope="module")
def data(spark):
    random.seed(73)
    rows = [(i, random.randint(0, 40), random.randint(-9, 99)) for i in range(1, 1901)]
    return spark.createDataFrame(rows, "k long, v long, x long")


def _mismatches(a, b, col):
    return (
        a.alias("a")
        .join(b.alias("b"), "k")
        .filter(F.col(f"a.{col}") != F.col(f"b.{col}"))
        .count()
    )


@pytest.mark.parametrize("n_parts", [1, 4, 32])
def test_rank_matches_window_row_number(spark, data, n_parts):
    ref = data.select(
        "k", F.row_number().over(Window.orderBy(*ORDER())).alias("r")
    )
    got = with_global_rank(data, ORDER(), "r", num_partitions=n_parts).select(
        "k", "r"
    )
    assert _mismatches(ref, got, "r") == 0


@pytest.mark.parametrize("n_tiles", [3, 5, 10, 5000])
def test_ntile_matches_window_ntile(spark, data, n_tiles):
    """Covers both tiling regimes (uneven tiles, and m < n where every
    row is its own tile)."""
    ref = data.select(
        "k", F.ntile(n_tiles).over(Window.orderBy(*ORDER())).alias("t")
    )
    got = with_global_ntile(data, ORDER(), n_tiles, "t", num_partitions=8).select(
        "k", "t"
    )
    assert _mismatches(ref, got, "t") == 0


@pytest.mark.parametrize("include_current", [True, False])
def test_cumsum_matches_window_running_sum(spark, data, include_current):
    hi = 0 if include_current else -1
    w = Window.orderBy(*ORDER()).rowsBetween(Window.unboundedPreceding, hi)
    ref = data.select(
        "k", F.coalesce(F.sum("x").over(w), F.lit(0)).alias("c")
    )
    got = with_global_cumsum(
        data, ORDER(), "x", "c", include_current=include_current, num_partitions=8
    ).select("k", "c")
    assert _mismatches(ref, got, "c") == 0


def test_cummax_matches_window_running_max_with_null_prefix(spark, data):
    """Exclusive prefix max: the first row's empty frame must be NULL in
    both forms (the skyline dominance convention)."""
    w = Window.orderBy(*ORDER()).rowsBetween(Window.unboundedPreceding, -1)
    ref = data.select("k", F.max("x").over(w).alias("c"))
    got = with_global_cummax(
        data, ORDER(), "x", "c", include_current=False, num_partitions=8
    ).select("k", "c")
    diff = (
        ref.alias("a")
        .join(got.alias("b"), "k")
        .filter(
            ~(
                (F.col("a.c") == F.col("b.c"))
                | (F.col("a.c").isNull() & F.col("b.c").isNull())
            )
        )
        .count()
    )
    assert diff == 0
    assert got.filter(F.col("c").isNull()).count() == 1  # exactly the global max-order head


def test_decimal_sums_keep_their_type(spark, data):
    d = data.select("k", "v", F.col("x").cast("decimal(38,0)").alias("x"))
    got = with_global_cumsum(d, ORDER(), "x", "c", num_partitions=4)
    assert dict(got.dtypes)["c"] == "decimal(38,0)"


def test_empty_input(spark):
    e = spark.createDataFrame([], "k long, v long, x long")
    assert with_global_rank(e, ORDER(), "r").count() == 0
    assert with_global_ntile(e, ORDER(), 5, "t").count() == 0
    assert with_global_cumsum(e, ORDER(), "x", "c").count() == 0


def test_plans_have_no_single_partition_sort(spark, data):
    """The whole point: none of the utility's outputs may compile to the
    Exchange SinglePartition + Sort shape it exists to remove."""
    from plan_audit import plan_stats

    for df in (
        with_global_rank(data, ORDER(), "r"),
        with_global_ntile(data, ORDER(), 5, "t"),
        with_global_cumsum(data, ORDER(), "x", "c"),
        with_global_cummax(data, ORDER(), "x", "c", include_current=False),
    ):
        s = plan_stats(df)
        assert s["single_partition_sorts"] == 0
        assert s["cartesian"] == 0


@pytest.mark.parametrize("n_tiles", [5, 7])
def test_ntile_sliced_matches_per_slice_ntile(spark, data, n_tiles):
    """One sliced pass over 3 equal slices (asc, desc-by-negation, and a
    second key) must reproduce three independent with_global_ntile runs
    bit-for-bit — the customer_rfm fusion contract."""
    from procurement_data_pipeline_spark.operators.ranks import (
        with_global_ntile_sliced,
    )

    m3 = data.select(
        "k",
        F.posexplode(
            F.array(F.col("v"), -F.col("v"), F.col("x"))
        ).alias("_m", "_kk"),
    )
    sliced = with_global_ntile_sliced(
        m3,
        "_m",
        [F.col("_kk").asc(), F.col("k").asc()],
        n_tiles,
        "tile",
        n_slices=3,
    )
    got = {
        (r["k"], r["_m"]): r["tile"] for r in sliced.collect()
    }
    for m, order in enumerate(
        (
            [F.col("v").asc(), F.col("k").asc()],
            [F.col("v").desc(), F.col("k").asc()],
            [F.col("x").asc(), F.col("k").asc()],
        )
    ):
        want = with_global_ntile(data.select("k", "v", "x"), order, n_tiles)
        for r in want.collect():
            assert got[(r["k"], m)] == r["tile"], (r["k"], m)
