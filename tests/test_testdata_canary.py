"""Testdata-drift canary.

The driver regenerates /root/testdata between rounds and has already shipped
`events.ts` under three different parquet encodings (TIMESTAMP(NANOS),
timestamp[us]-NTZ, LTZ). Round 3 lost its entire bench to that silent drift:
every downstream `unix_micros(ts)` became an AnalysisException. This test
pins the dtype contract each query family relies on, PER TABLE, so the next
upstream encoding change fails here — in seconds, with a named expectation —
instead of surfacing as dozens of unrelated red tests.

The contract is on the POST-LOAD frame (`sources.tables.load_table`), which
is exactly the surface queries consume: the loader is allowed to normalize
encodings, the queries are allowed to assume it did.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.sources.tables import TABLES, load_table

# Columns each query family actually depends on, with the dtype it assumes.
# A set value means "any of these is fine" (e.g. raw date-like columns work
# as either timestamp flavor under the UTC session pin — queries only cast
# them to date or compare against literals).
EXPECTED: dict[str, dict[str, str | set[str]]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        "o_orderdate": {"timestamp", "timestamp_ntz", "date"},
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_shipdate": {"timestamp", "timestamp_ntz", "date"},
    },
    "events": {
        "event_id": "bigint",
        # The loader MUST deliver LTZ regardless of the file encoding:
        # unix_micros / window ranges / CAST AS DOUBLE all require it.
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("table", TABLES)
def test_table_dtype_contract(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    dtypes = dict(df.dtypes)
    expected = EXPECTED[table]
    for col, want in expected.items():
        assert col in dtypes, f"{table}.{col} missing (drift: column removed/renamed)"
        got = dtypes[col]
        allowed = want if isinstance(want, set) else {want}
        assert got in allowed, (
            f"{table}.{col} drifted: got {got}, queries assume {sorted(allowed)}"
        )


def test_events_ts_supports_epoch_functions(spark, sf_dir):
    """The round-3 failure mode, directly: unix_micros must resolve on the
    post-load ts column (it rejects TIMESTAMP_NTZ), and the epoch values
    must be in a sane modern range (catches an accidental naive-shift or a
    seconds/micros unit mix-up, not just the type)."""
    ev = load_table(spark, sf_dir, "events")
    row = (
        ev.select(F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi"))
        .collect()[0]
    )
    # 2020-01-01 .. 2035-01-01 in epoch micros.
    assert 1_577_836_800_000_000 < row["lo"] <= row["hi"] < 2_051_222_400_000_000, (
        f"events.ts epoch range implausible: {row['lo']}..{row['hi']}"
    )


def test_loader_survives_nanos_encoding_drift(spark, tmp_path):
    """Simulate the round-3 drift on the OTHER timestamp tables: write
    orders/lineitem/events files whose timestamp column is TIMESTAMP(NANOS)
    (which Spark's vectorized reader rejects outright) and assert the loader
    still delivers a usable timestamp column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cases = {
        "orders": ("o_orderdate", {"o_orderkey": [1, 2]}),
        "lineitem": ("l_shipdate", {"l_orderkey": [1, 2]}),
        "events": ("ts", {"event_id": [1, 2]}),
    }
    base_ns = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00Z in nanos
    for table, (ts_col, extra) in cases.items():
        cols = dict(extra)
        cols[ts_col] = pa.array(
            [base_ns, base_ns + 86_400_000_000_000],
            type=pa.timestamp("ns"),
        )
        pq.write_table(pa.table(cols), str(tmp_path / f"{table}.parquet"))

    for table, (ts_col, _) in cases.items():
        df = load_table(spark, str(tmp_path), table)
        assert dict(df.dtypes)[ts_col] == "timestamp", (
            f"{table}.{ts_col} not normalized from nanos"
        )
        days = sorted(
            r[0]
            for r in df.select(F.col(ts_col).cast("date").cast("string")).collect()
        )
        assert days == ["2024-01-01", "2024-01-02"]


def test_loader_normalizes_double_embeddings(spark, tmp_path):
    """Embedding dtype drift: an array<double> embeddings file must load as
    array<float> (the similarity/PQ storage contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "vec_id": pa.array([1, 2], type=pa.int64()),
            "embedding": pa.array(
                [[0.1, 0.2], [0.3, 0.4]], type=pa.list_(pa.float64())
            ),
            "label": pa.array([0, 1], type=pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    df = load_table(spark, str(tmp_path), "embeddings")
    assert dict(df.dtypes)["embedding"] == "array<float>"
    assert df.count() == 2


def test_nanos_conf_stays_scoped_to_the_read(spark, tmp_path):
    """The legacy nanosAsLong conf must not leak session-globally: after
    loading a nanos-encoded allowlisted table, (a) the session conf is back
    to unset, and (b) a nanos column on a table OUTSIDE the _TS_COLS
    allowlist fails loudly instead of silently arriving as bigint."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_ns = 1_704_067_200_000_000_000
    ns_arr = pa.array([base_ns, base_ns + 1_000_000_000], type=pa.timestamp("ns"))
    pq.write_table(
        pa.table({"event_id": [1, 2], "ts": ns_arr}),
        str(tmp_path / "events.parquet"),
    )
    pq.write_table(
        pa.table({"doc_id": [1, 2], "created": ns_arr, "text": ["a", "b"]}),
        str(tmp_path / "documents.parquet"),
    )

    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() == 2
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) is None
    ), "nanosAsLong leaked into the session"

    with pytest.raises(Exception, match="PARQUET_TYPE_ILLEGAL|TIMESTAMP\\(NANOS"):
        load_table(spark, str(tmp_path), "documents").collect()
