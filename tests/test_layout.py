"""Z-order layout: per-file min/max envelopes must be narrow in EVERY
z-ordered dimension, where a linear sort is narrow in one and spans the
full domain in the rest. The per-file envelope is exactly what parquet
footer stats expose to the scanner, so this is a direct measurement of
prunability at 100 TB — no flaky IO counters involved."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.catalog import (
    write_sorted_layout,
    z_order_write,
)


def _mean_file_ranges(spark, path, dims):
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    aggs = []
    for c in dims:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    per_file = df.groupBy("_f").agg(*aggs).collect()
    assert len(per_file) > 1, "layout collapsed to a single file"
    out = {}
    for c in dims:
        spans = [r[f"max_{c}"] - r[f"min_{c}"] for r in per_file]
        out[c] = sum(spans) / len(spans) / 63.0  # domain is [0, 63]
    return out, len(per_file)


def test_z_order_files_are_narrow_in_both_dims(spark, tmp_path):
    rng = random.Random(7)
    pts = [(i, i % 64, i // 64) for i in range(64 * 64)]
    rng.shuffle(pts)
    df = spark.createDataFrame(pts, ["row_id", "x", "y"]).repartition(8)

    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    write_sorted_layout(df, linear, "x", num_files=16)
    z_order_write(df, zord, ["x", "y"], num_files=16)

    lin_ranges, lin_files = _mean_file_ranges(spark, linear, ["x", "y"])
    z_ranges, z_files = _mean_file_ranges(spark, zord, ["x", "y"])

    # Linear layout: razor-thin on the sort column, full-domain on the other.
    assert lin_ranges["x"] < 0.15
    assert lin_ranges["y"] > 0.9
    # Z-order: both dims simultaneously narrow — ~sqrt(1/16)=1/4 of the
    # domain per file for 16 files over 2 dims (0.5 leaves headroom for
    # range-boundary sampling slack).
    assert z_ranges["x"] < 0.5, z_ranges
    assert z_ranges["y"] < 0.5, z_ranges
    # A point/range filter on y alone: count files whose [min,max] envelope
    # (what footer stats expose) admits y=10. Linear cannot skip any file.
    def files_admitting(path, col, val):
        df2 = spark.read.parquet(path).withColumn("_f", F.input_file_name())
        per = (
            df2.groupBy("_f")
            .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
            .collect()
        )
        return sum(1 for r in per if r["lo"] <= val <= r["hi"]), len(per)

    lin_hit, lin_total = files_admitting(linear, "y", 10)
    z_hit, z_total = files_admitting(zord, "y", 10)
    assert lin_hit == lin_total  # linear prunes nothing on y
    assert z_hit <= z_total // 2, (z_hit, z_total)  # z-order skips most files


def test_z_order_roundtrip_preserves_rows(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, float(i % 10), float(i % 7)) for i in range(1000)],
        ["row_id", "a", "b"],
    )
    path = str(tmp_path / "z")
    z_order_write(df, path, ["a", "b"], num_files=4)
    back = spark.read.parquet(path)
    assert back.columns == ["row_id", "a", "b"]
    assert sorted(r["row_id"] for r in back.collect()) == list(range(1000))


def test_z_order_handles_nulls_and_constant_columns(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, None if i % 5 == 0 else i, 1.0) for i in range(100)],
        ["row_id", "a", "b"],
    )
    path = str(tmp_path / "z")
    z_order_write(df, path, ["a", "b"], num_files=2)
    assert spark.read.parquet(path).count() == 100


# ------------------------------------------------------------- file index


def test_footer_stats_prune_and_correctness(spark, tmp_path):
    """Sorted layout + footer index: a narrow range scan opens a strict
    subset of files and still returns exactly the full scan's rows."""
    from procurement_data_pipeline_spark.operators.fileindex import (
        footer_stats,
        prune_files,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10_000)], ["row_id", "v"]
    )
    path = str(tmp_path / "facts")
    write_sorted_layout(df, path, "v", num_files=10)

    stats = footer_stats(spark, path, ["v"])
    got = stats.collect()
    assert sum(r["n_rows"] for r in got) == 10_000
    all_files = [r["file"] for r in got]
    assert len(all_files) == 10

    kept = prune_files(stats, "v", lo=2000.0, hi=2999.0)
    assert 0 < len(kept) <= 3, kept  # ~1/10 of the value domain

    pruned_rows = (
        spark.read.parquet(*kept)
        .filter((F.col("v") >= 2000.0) & (F.col("v") <= 2999.0))
        .count()
    )
    full_rows = (
        spark.read.parquet(path)
        .filter((F.col("v") >= 2000.0) & (F.col("v") <= 2999.0))
        .count()
    )
    assert pruned_rows == full_rows == 1000


def test_prune_files_keeps_null_stat_files(spark):
    """NULL envelopes mean 'cannot prune' — the file must survive."""
    from procurement_data_pipeline_spark.operators.fileindex import prune_files

    stats = spark.createDataFrame(
        [
            ("a", 10, 0.0, 5.0),
            ("b", 10, None, None),
            ("c", 10, 100.0, 200.0),
        ],
        "file string, n_rows long, min_v double, max_v double",
    )
    kept = prune_files(stats, "v", lo=50.0, hi=60.0)
    assert kept == ["b"]  # 'a' and 'c' provably miss; 'b' unknown -> kept


def test_z_order_quantile_mode_handles_skew(spark, tmp_path):
    """Log-normal-ish skew: uniform-width bucketing collapses ~all rows of
    the skewed column into a couple of buckets (the z-curve degenerates),
    while quantile bucketing keeps per-file envelopes narrow in the
    POPULATED region. Measured as the mean per-file row-coverage: with
    equi-depth buckets, a single-dim point filter on the skewed column
    must admit far fewer ROWS than under width bucketing."""
    import random

    rng = random.Random(11)
    # x uniform; y heavily skewed (99% of mass in [0, 1), tail to 10_000)
    pts = [
        (
            i,
            rng.random() * 64.0,
            rng.random() if i % 100 else rng.random() * 10_000.0,
        )
        for i in range(20_000)
    ]
    df = spark.createDataFrame(pts, ["row_id", "x", "y"]).repartition(8)

    w_path = str(tmp_path / "width")
    q_path = str(tmp_path / "quantile")
    z_order_write(df, w_path, ["x", "y"], num_files=16, bucket_mode="width")
    z_order_write(df, q_path, ["x", "y"], num_files=16, bucket_mode="quantile")

    def rows_admitted(path, col, val):
        """Rows living in files whose [min,max] envelope admits val."""
        d = spark.read.parquet(path).withColumn("_f", F.input_file_name())
        per = (
            d.groupBy("_f")
            .agg(
                F.min(col).alias("lo"),
                F.max(col).alias("hi"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        return sum(r["n"] for r in per if r["lo"] <= val <= r["hi"])

    # Point lookup in the dense region of the skewed column.
    w_rows = rows_admitted(w_path, "y", 0.5)
    q_rows = rows_admitted(q_path, "y", 0.5)
    assert q_rows < w_rows * 0.6, (q_rows, w_rows)
    # And the uniform column still prunes under quantile mode.
    qx = rows_admitted(q_path, "x", 10.0)
    assert qx < 20_000 * 0.8, qx
    # Same data either way.
    assert spark.read.parquet(q_path).count() == 20_000


def test_quarantine_corrupt_files_restores_scannability(spark, tmp_path):
    """A truncated parquet file kills directory scans; quarantining it
    restores the directory and accounts for the loss explicitly."""
    import glob
    import os

    from procurement_data_pipeline_spark.operators.fileindex import (
        quarantine_corrupt_files,
    )

    path = str(tmp_path / "facts")
    spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], ["row_id", "v"]
    ).repartition(4).write.parquet(path)
    victim = sorted(glob.glob(os.path.join(path, "*.parquet")))[0]
    with open(victim, "r+b") as f:
        f.truncate(40)  # destroy the footer

    moved = quarantine_corrupt_files(spark, path, str(tmp_path / "quarantine"))
    assert len(moved) == 1 and moved[0].endswith(os.path.basename(victim))
    assert not os.path.exists(victim)
    assert os.path.exists(
        os.path.join(str(tmp_path / "quarantine"), os.path.basename(victim))
    )
    # The directory scans again; surviving rows are intact.
    n = spark.read.parquet(path).count()
    assert 0 < n < 1000

    # Clean directory: nothing moves.
    assert quarantine_corrupt_files(spark, path, str(tmp_path / "q2")) == []


def test_schema_evolution_merge_read(spark, tmp_path):
    """Appends with a widened schema stay readable: mergeSchema unions the
    columns and back-fills NULL for pre-evolution files."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, s string, score double"
    ).write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert set(merged.columns) == {"id", "s", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_z_order_width_mode_nulls_bucket_low(spark, tmp_path):
    """NULLs must co-locate with the LOW end in width mode (regression:
    F.least skips nulls, which silently sent them to the top bucket)."""
    # Constant second column: the z-value then depends only on 'a', so the
    # bucket placement of NULLs is directly observable via file grouping
    # (with a varying second dim, the z-curve can legitimately interleave
    # NULL-a/high-b rows near top-a/low-b rows).
    df = spark.createDataFrame(
        [(i, None if i < 50 else float(i), 1.0) for i in range(1000)],
        "row_id long, a double, b double",
    )
    path = str(tmp_path / "z")
    z_order_write(df, path, ["a", "b"], num_files=4, bucket_mode="width")
    back = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    null_files = {
        r["_f"] for r in back.filter(F.col("a").isNull()).select("_f").collect()
    }
    top_files = {
        r["_f"] for r in back.filter(F.col("a") > 900).select("_f").collect()
    }
    low_files = {
        r["_f"] for r in back.filter(F.col("a") < 200).select("_f").collect()
    }
    assert null_files.isdisjoint(top_files), "NULLs co-located with max values"
    assert null_files <= low_files  # bucket-0 placement: NULLs ride the low end
