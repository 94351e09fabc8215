"""Oracle-backed declared queries over the versioned table format.

Every other capability tier earns driver-hash evidence (Spark vs DuckDB
value hash at sf0.01); until round 6 the table-format layer
(operators/versioning.py — time travel, MERGE INTO, CDF) was pytest-only.
These queries close that gap: each builder constructs a DETERMINISTIC
versioned fixture from the round's `orders` table —

    v1  append   orders with o_orderkey % 10 < 5
    v2  append   the remaining orders           (v2 == all of orders)
    v3  merge    DELETE WHERE o_orderkey % 97 == 0  (copy-on-write)
    v4  optimize ZORDER (o_orderkey, price_cents)   (content-identical)

— then reads it back through the format's own read paths (time travel,
latest-after-merge, change feed, manifest-stats pruned range scan) and
aggregates. The DuckDB oracle
reproduces the SAME final relation straight from `orders`, so a hash match
verifies the whole write→manifest→read roundtrip, not just the agg.

Exactness contract (memory: engine-parity toolbox): money is quantized to
cents with FLOOR(x*100) AT BUILD TIME and stored as BIGINT in the fixture,
so every downstream sum is integer-exact in both engines.

The fixture lives under the system temp dir, keyed by the sf_dir, and is
rebuilt at most once per process per sf_dir (the three queries share it).
Rebuilds are idempotent: the table directory is removed first.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.operators.cdf import table_changes
from procurement_data_pipeline_spark.operators.versioning import (
    merge_into,
    optimize_table,
    read_table,
    scan_table,
    versioned_write,
)
from procurement_data_pipeline_spark.registry import register
from procurement_data_pipeline_spark.sources.tables import load_table

_BUILT: dict[str, str] = {}  # abs(sf_dir) -> fixture path (per process)


def _fixture(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process per sf_dir) the 3-version orders fixture."""
    key = os.path.abspath(sf_dir)
    if key in _BUILT:
        return _BUILT[key]
    tag = re.sub(r"[^A-Za-z0-9_.-]", "_", key).strip("_")
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_versioned_orders_{tag}"
    )
    shutil.rmtree(path, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        F.to_date("o_orderdate").alias("o_orderdate"),
    )
    versioned_write(
        spark,
        orders.filter(F.col("o_orderkey") % 10 < 5),
        path,
        mode="append",
        # sticky: later writes maintain stats. One column per stats type
        # class — numeric envelope (ulp-widened), date (ISO-encoded), and
        # string — so the graded scans certify all three prune paths
        stats_cols=["o_orderkey", "price_cents", "o_orderdate", "o_orderpriority"],
    )
    versioned_write(
        spark, orders.filter(F.col("o_orderkey") % 10 >= 5), path, mode="append"
    )
    merge_into(
        spark,
        path,
        orders.filter(F.col("o_orderkey") % 97 == 0).select("o_orderkey"),
        key_col="o_orderkey",
        when_matched="delete",
    )
    # v4: OPTIMIZE ZORDER — content-identical by contract; stats recompute
    # for the re-clustered files, so the pruned scan below (and the hash
    # of every latest-reading query) certifies compaction + Z-order +
    # stats maintenance end-to-end, not just pytest-level identity
    # 8 z-ordered files at every sf: enough files that the range scan has
    # something to prune, few enough that the layout is a real compaction
    optimize_table(
        spark,
        path,
        zorder_cols=["o_orderkey", "price_cents"],
        target_files=8,
    )
    _BUILT[key] = path
    return path


def _priority_rollup(df: DataFrame) -> DataFrame:
    return (
        df.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
        .orderBy("o_orderpriority")
    )


_ROLLUP_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
{where}
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "versioned_time_travel",
    oracle=_ROLLUP_SQL.format(where=""),
    tags=("versioning", "time-travel"),
)
def versioned_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read version 2 AFTER a later destructive merge: time travel must see
    every order, byte-exactly, even though latest (v3) deleted rows.
    A hash match certifies manifest-pinned reads + append isolation."""
    path = _fixture(spark, sf_dir)
    return _priority_rollup(read_table(spark, path, version=2))


@register(
    "versioned_merge_current",
    oracle=_ROLLUP_SQL.format(where="WHERE o_orderkey % 97 <> 0"),
    tags=("versioning", "merge"),
)
def versioned_merge_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read latest after the copy-on-write DELETE merge AND the OPTIMIZE
    ZORDER rewrite — the footer-pruned merge must drop exactly the matched
    keys, and compaction must be content-identical (hash-certified)."""
    path = _fixture(spark, sf_dir)
    return _priority_rollup(read_table(spark, path))


@register(
    "versioned_cdf_inserts",
    oracle="""
SELECT 'insert' AS change_type, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderkey % 10 >= 5
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("versioning", "cdf"),
)
def versioned_cdf_inserts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change feed for the pure-append range v1→v2 must present exactly
    the appended rows as inserts — the join-free fast path that makes CDC
    O(new rows) instead of O(table) at 100 TB."""
    path = _fixture(spark, sf_dir)
    feed = table_changes(spark, path, from_version=1, to_version=2)
    return (
        feed.groupBy("change_type", F.col("new_o_orderpriority").alias("o_orderpriority"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("new_price_cents").cast("long").alias("total_cents"),
        )
        .orderBy("o_orderpriority")
    )


_SCAN_LO, _SCAN_HI = 10_000, 40_000


@register(
    "versioned_pruned_scan",
    oracle=f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderkey BETWEEN {_SCAN_LO} AND {_SCAN_HI}
  AND o_orderkey % 97 <> 0
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("versioning", "data-skipping"),
)
def versioned_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range scan through the manifest's per-file stats (scan_table): the
    plan opens only files whose [min, max] envelope intersects the key
    range — Delta-style data skipping, planned from one JSON. The residual
    filter keeps the result exact regardless of pruning, and the oracle
    hash certifies that pruning lost nothing."""
    path = _fixture(spark, sf_dir)
    return _priority_rollup(
        scan_table(spark, path, "o_orderkey", lo=_SCAN_LO, hi=_SCAN_HI)
    )


_CS_DATE_LO, _CS_DATE_HI = "1996-01-01", "1999-12-31"
_CS_KEY_HI = 7_000
_CS_PRICE_HI = 20_000_000  # cents


@register(
    "versioned_compound_scan",
    oracle=f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE CAST(o_orderdate AS DATE) >= DATE '{_CS_DATE_LO}'
  AND CAST(o_orderdate AS DATE) <= DATE '{_CS_DATE_HI}'
  AND o_orderkey <= {_CS_KEY_HI}
  AND CAST(FLOOR(o_totalprice * 100) AS BIGINT) <= {_CS_PRICE_HI}
  AND o_orderkey % 97 <> 0
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("versioning", "data-skipping"),
)
def versioned_compound_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound-predicate data skipping: a DATE range (the reference's own
    partition-pruning key shape — sql/net_demand.sql filters orders by
    date) AND-ed with a key bound and a price bound, planned in ONE
    manifest pass. The key and price predicates each prune z-ordered
    files the other keeps (the fixture's ZORDER clusters both), the date
    predicate exercises the ISO-string stats path, and the residual
    filter keeps the result exact — the oracle hash certifies no prune
    path lost anything."""
    path = _fixture(spark, sf_dir)
    return _priority_rollup(
        scan_table(
            spark,
            path,
            predicates={
                "o_orderdate": (_CS_DATE_LO, _CS_DATE_HI),
                "o_orderkey": (None, _CS_KEY_HI),
                "price_cents": (None, _CS_PRICE_HI),
            },
        )
    )


_CLUSTERED: dict[str, str] = {}


def _clustered_fixture(spark: SparkSession, sf_dir: str) -> str:
    """One cluster_by=['o_orderpriority'] write of orders: every file's
    priority envelope covers ~one value, so the equality scan below gets
    hive-partition pruning from plain manifest stats (no k=v dirs)."""
    key = os.path.abspath(sf_dir)
    if key in _CLUSTERED:
        return _CLUSTERED[key]
    tag = re.sub(r"[^A-Za-z0-9_.-]", "_", key).strip("_")
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_clustered_orders_{tag}"
    )
    shutil.rmtree(path, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    versioned_write(
        spark,
        orders,
        path,
        stats_cols=["o_orderkey"],
        cluster_by=["o_orderpriority"],
        cluster_files=16,
    )
    _CLUSTERED[key] = path
    return path


@register(
    "versioned_clustered_scan",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("versioning", "clustering", "data-skipping"),
)
def versioned_clustered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruning semantics WITHOUT hive directories: cluster_by
    hash-routes each priority into its own file(s), the manifest's string
    stats make the equality predicate prune every other file, and the
    residual filter keeps the result exact (the oracle hash certifies
    it). This is the Iceberg hidden-partitioning argument re-expressed on
    the repo's own table format."""
    path = _clustered_fixture(spark, sf_dir)
    return _priority_rollup(
        scan_table(spark, path, "o_orderpriority", lo="1-URGENT", hi="1-URGENT")
    )
