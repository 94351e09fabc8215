"""Readers for the driver-provided parquet tables.

The benchmark corpus (TESTDATA.md) is one parquet file per table under an
``sf*`` directory. Reads go through ``spark.read.parquet`` so Catalyst gets
native column pruning / filter pushdown; no schema is imposed on read (the
files carry their own), but ``configure_runtime`` pins the session timezone
first so timestamp→date casts are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from procurement_data_pipeline_spark.session import configure_runtime

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Timestamp-bearing columns per table. The corpus has shipped `events.ts`
# under three encodings across driver regenerations — TIMESTAMP(NANOS)
# (the vectorized reader rejects it outright → read nanos as long),
# timestamp[us] with no timezone (read as TIMESTAMP_NTZ), and plain
# TIMESTAMP_LTZ — so the load boundary defends every listed column:
#
# * bigint (nanos-as-long) → truncate to micros and build a TIMESTAMP_LTZ
#   (DuckDB's reader truncates nanos identically, so oracles agree).
# * events.ts NTZ → LTZ via cast("timestamp"): the cast interprets the
#   naive value in the session timezone, which configure_runtime pins to
#   UTC — matching DuckDB's naive-as-UTC read, so epoch-based oracles stay
#   hash-identical. unix_micros/window-range expressions need LTZ.
# * orders/lineitem date columns stay NTZ when they arrive NTZ: every
#   consumer only date-casts or compares them to literals (NTZ-legal), and
#   leaving the bare attribute un-wrapped keeps the date filters pushed
#   down to the parquet scan (a cast would block PushedFilters).
_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}
_NTZ_TO_LTZ: dict[str, tuple[str, ...]] = {"events": ("ts",)}


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _footer_has_nanos(path: str) -> bool:
    """Cheap local footer probe: does any column carry timestamp[ns]?
    Falls back to False on non-local / unreadable paths (the tolerant read
    below then handles it via its exception arm)."""
    try:
        import pyarrow.parquet as pq

        return any("timestamp[ns" in str(f.type) for f in pq.read_schema(path))
    except Exception:  # noqa: BLE001 — probe is best-effort
        return False


def _read_nanos_tolerant(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet, enabling nanos-as-long ONLY if the footer demands it —
    and only for the duration of the read call. The conf is consulted at
    analysis time (verified: a DataFrame read under the conf collects fine
    after reset), so scoping it here means a nanos column appearing on any
    table OUTSIDE the _TS_COLS allowlist still fails loudly with
    PARQUET_TYPE_ILLEGAL instead of silently arriving as bigint.

    The pyarrow footer probe decides the common case without a throwaway
    failed analysis; the exception arm remains for paths pyarrow cannot
    probe. CAVEAT: Spark confs are session-global, so during the brief
    nanos-read window a CONCURRENT read in another thread would also see
    the conf — the loader assumes single-threaded table loading (true for
    bench/check_oracle/driver); don't call load_table from parallel threads
    while loading a nanos-encoded table."""

    def _read_with_conf() -> DataFrame:
        prev = spark.conf.get(_NANOS_CONF, None)
        spark.conf.set(_NANOS_CONF, "true")
        try:
            return spark.read.parquet(path)
        finally:
            if prev is None:
                spark.conf.unset(_NANOS_CONF)
            else:
                spark.conf.set(_NANOS_CONF, prev)

    if _footer_has_nanos(path):
        return _read_with_conf()
    try:
        return spark.read.parquet(path)
    except Exception as e:  # noqa: BLE001 — dispatch on the parquet error
        msg = str(e)
        if "PARQUET_TYPE_ILLEGAL" not in msg and "TIMESTAMP(NANOS" not in msg:
            raise
        return _read_with_conf()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_runtime(spark)
    ts_cols = _TS_COLS.get(name)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = _read_nanos_tolerant(spark, path) if ts_cols else spark.read.parquet(path)
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)
    for col in ts_cols or ():
        if dtypes.get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        elif dtypes.get(col) == "timestamp_ntz" and col in _NTZ_TO_LTZ.get(name, ()):
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    if name == "embeddings" and dtypes.get("embedding") == "array<double>":
        # Same drift defense as the timestamp columns: the similarity/PQ
        # operators assume float vectors (4 B/dim — the storage contract).
        df = df.withColumn("embedding", F.col("embedding").cast("array<float>"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)
