"""Multi-format warehouse IO: the engine's tables round-trip through ORC,
JSON-lines, and CSV with values intact — the staging/interchange formats a
warehouse meets beyond its parquet core. (Parquet round-trips are exercised
everywhere else.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    # Micros-quantized projection so float round-trips compare exactly in
    # text formats too.
    return load_table(spark, SF_DIR, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 1000000).cast("long").alias("vm"),
    )


def _assert_same(a, b):
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_orc_roundtrip(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "orc")
    ev.write.orc(path)
    back = spark.read.orc(path)
    assert dict(back.dtypes) == dict(ev.dtypes)
    _assert_same(ev, back)


def test_jsonlines_roundtrip_with_schema(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "json")
    ev.write.json(path)
    # Schema-on-read: supply the schema instead of paying inference's extra
    # pass (and its long-vs-double ambiguity) — the production pattern.
    back = spark.read.schema(
        "event_id long, user_id long, event_type string, ts_us long, vm long"
    ).json(path)
    _assert_same(ev, back)


def test_csv_roundtrip_with_header(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "csv")
    ev.write.option("header", True).csv(path)
    back = spark.read.option("header", True).schema(
        "event_id long, user_id long, event_type string, ts_us long, vm long"
    ).csv(path)
    _assert_same(ev, back)
