"""Code-review r8 regression tests: NULL-key and type-coercion semantics
of the join/sketch/catalog operator tier. Each test pins a behavior that
used to diverge from exact SQL semantics (NULL never equals NULL; an
equi-join coerces mismatched numeric types)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_range_join_left_with_null_interval_columns(spark):
    """A matched interval carrying a NULL non-key column must appear
    exactly once — the all-columns anti-join re-emitted it as a spurious
    unmatched row (NULL != NULL)."""
    from procurement_data_pipeline_spark.operators.rangejoin import range_join

    intervals = spark.createDataFrame(
        [("a", 0, 10, None), ("a", 20, 30, "note")],
        "k string, start long, end long, note string",
    )
    points = spark.createDataFrame(
        [("a", 5, 100)], "k string, ts long, v long"
    )
    out = range_join(
        intervals, points, on=["k"], start_col="start", end_col="end",
        ts_col="ts", bucket_seconds=10, how="left",
    ).collect()
    assert len(out) == 2  # one match + one genuinely unmatched interval
    matched = [r for r in out if r["v"] is not None]
    assert len(matched) == 1 and matched[0]["start"] == 0
    unmatched = [r for r in out if r["v"] is None]
    assert len(unmatched) == 1 and unmatched[0]["start"] == 20


def test_range_join_left_preserves_duplicate_intervals(spark):
    """Duplicate interval rows are distinct rows under left-join
    semantics; the all-columns anti-join used to collapse them."""
    from procurement_data_pipeline_spark.operators.rangejoin import range_join

    intervals = spark.createDataFrame(
        [("a", 50, 60), ("a", 50, 60)], "k string, start long, end long"
    )
    points = spark.createDataFrame([("a", 55)], "k string, ts long")
    out = range_join(
        intervals, points, on=["k"], start_col="start", end_col="end",
        ts_col="ts", bucket_seconds=10, how="left",
    )
    assert out.count() == 2  # both copies matched, both kept


def test_asof_join_null_keys_never_match(spark):
    """SQL semantics: a NULL-keyed left row must NOT take the payload of a
    NULL-keyed right row (the shared window partition used to hand it
    over)."""
    from procurement_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(None, 10), (1, 10)], "uid int, ts long"
    )
    right = spark.createDataFrame(
        [(None, 5, 111), (1, 5, 222)], "uid int, ts long, val long"
    )
    out = {
        (r["uid"], r["val_asof"])
        for r in asof_join(left, right, on="uid", ts_col="ts",
                           value_cols=["val"]).collect()
    }
    assert out == {(None, None), (1, 222)}


def test_asof_tolerance_on_timestamp_ntz(spark):
    """The tolerance path must accept TIMESTAMP_NTZ (it used to crash on
    the straight double cast that range_join's axis helper guards)."""
    from procurement_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00")], "uid int, ts string"
    ).select("uid", F.col("ts").cast("timestamp_ntz").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 7)], "uid int, ts string, val long"
    ).select(
        "uid", F.col("ts").cast("timestamp_ntz").alias("ts"), "val"
    )
    fresh = asof_join(
        left, right, on="uid", ts_col="ts", value_cols=["val"],
        tolerance_seconds=120,
    ).collect()
    assert fresh[0]["val_asof"] == 7
    stale = asof_join(
        left, right, on="uid", ts_col="ts", value_cols=["val"],
        tolerance_seconds=30,
    ).collect()
    assert stale[0]["val_asof"] is None


def test_bloom_prune_coerces_mismatched_integral_key_types(spark):
    """INT build keys vs BIGINT probe keys hash differently in xxhash64;
    without coercion genuinely matching rows were pruned (false
    negatives — the one failure the superset contract forbids)."""
    from procurement_data_pipeline_spark.operators.bloomjoin import bloom_prune

    build = spark.createDataFrame([(5,), (7,)], "k int")
    probe = spark.createDataFrame(
        [(5, "hit"), (6, "maybe"), (7, "hit")], "k long, tag string"
    )
    kept = {r["k"] for r in bloom_prune(probe, "k", build, "k").collect()}
    assert {5, 7} <= kept  # no false negatives

    with pytest.raises(ValueError, match="not numerically coercible"):
        bloom_prune(
            probe.select(F.col("k").cast("string").alias("k"), "tag"),
            "k",
            build,
            "k",
        )


def test_bloom_prune_drops_null_probe_keys(spark):
    """NULL keys cannot equi-join; they are pruned explicitly (xxhash64
    skips NULL children, so the membership bits alone never drop them)."""
    from procurement_data_pipeline_spark.operators.bloomjoin import bloom_prune

    build = spark.createDataFrame([(None,), (5,)], "k int")
    probe = spark.createDataFrame([(None, "x"), (5, "y")], "k int, tag string")
    out = bloom_prune(probe, "k", build, "k").collect()
    assert [r["tag"] for r in out] == ["y"]


def test_merge_upsert_null_key_is_idempotent(spark, tmp_path):
    """Re-merging a batch containing a NULL-key row must not append
    another copy each time (null-unsafe anti-join did exactly that)."""
    from procurement_data_pipeline_spark.catalog import merge_upsert

    path = str(tmp_path / "tbl")
    batch = spark.createDataFrame(
        [(None, "n"), (1, "a")], "id int, s string"
    )
    merge_upsert(spark, path, batch, key_cols=["id"])
    merge_upsert(spark, path, batch, key_cols=["id"])
    got = spark.read.parquet(path).collect()
    assert len(got) == 2
    assert sorted(((r["id"], r["s"]) for r in got), key=str) == sorted(
        [(None, "n"), (1, "a")], key=str
    )


def test_minhash_signature_expr_null_for_short_docs(spark):
    """Docs with fewer than n words have no shingles: the row-wise
    signature is NULL (matching the batch path, which drops them), not an
    array of NULLs that collapses every short doc into one LSH bucket."""
    from procurement_data_pipeline_spark.llm_ops.dedup import (
        band_hashes,
        minhash_signature_expr,
    )

    df = spark.createDataFrame(
        [("one",), ("two",), ("three words here",)], "text string"
    ).select(
        "text", minhash_signature_expr("text", n=2, num_hashes=8).alias("sig")
    )
    rows = {r["text"]: r["sig"] for r in df.collect()}
    assert rows["one"] is None and rows["two"] is None
    assert rows["three words here"] is not None
    assert all(v is not None for v in rows["three words here"])
    # banding a NULL signature yields NULL, not a shared hash-of-empty
    banded = df.select(band_hashes(F.col("sig"), 4).alias("b")).collect()
    assert sum(1 for r in banded if r["b"] is None) == 2


def test_stratified_sample_n_deterministic_under_key_ties(spark):
    """Repeated key_col values within a stratum must not make the
    reservoir pick partition-order-dependent rows at the boundary."""
    from procurement_data_pipeline_spark.llm_ops.sampling import (
        stratified_sample_n,
    )

    rows = [("s", "dup", f"payload{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "stratum string, key string, p string")
    a = stratified_sample_n(
        df.repartition(1), "stratum", "key", n_per_stratum=3
    )
    b = stratified_sample_n(
        df.repartition(8), "stratum", "key", n_per_stratum=3
    )
    assert sorted(r["p"] for r in a.collect()) == sorted(
        r["p"] for r in b.collect()
    )


def test_countmin_build_query_share_addressing(spark):
    """The factored (row, bucket) helper keeps build and query aligned —
    exact counts on a small domain stay exact."""
    from procurement_data_pipeline_spark.llm_ops.sketch import (
        countmin_build,
        countmin_query,
    )

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3, "w string"
    )
    sk = countmin_build(df, "w", width=64, depth=4)
    items = spark.createDataFrame([("a",), ("b",), ("zzz",)], "w string")
    est = {r["item"]: r["est"] for r in countmin_query(
        sk, items, "w", width=64, depth=4
    ).collect()}
    assert est["a"] >= 5 and est["b"] >= 3 and est["zzz"] >= 0
    assert est["a"] <= 8 and est["b"] <= 8  # one-sided, tiny overcount max


# ---- review cycle 4: streaming drain / expectations / CALL kwargs ------


def test_expectation_null_predicate_quarantines(spark):
    """A user predicate that evaluates to NULL (three-valued logic) must
    quarantine the row, not silently pass it as clean."""
    from procurement_data_pipeline_spark.operators.expectations import (
        Expectation,
        check,
    )

    df = spark.createDataFrame([(1,), (None,), (-2,)], "x int")
    clean, quarantine, summary = check(
        df, [Expectation("positive", lambda: F.col("x") > 0)]
    )
    assert [r["x"] for r in clean.collect()] == [1]
    assert sorted(r["x"] for r in quarantine.collect() if r["x"] is not None) == [-2]
    assert quarantine.count() == 2  # the NULL row is quarantined too
    assert summary.collect()[0]["n_violations"] == 2


def test_expectation_unique_ignores_null_keys(spark):
    """SQL unique-constraint semantics: NULL keys never duplicate each
    other — only not_null flags them."""
    from procurement_data_pipeline_spark.operators.expectations import (
        check,
        unique,
    )

    df = spark.createDataFrame(
        [(None,), (None,), (1,), (1,), (2,)], "k int"
    )
    clean, quarantine, _ = check(df, [unique("k")])
    assert sorted(
        (r["k"] for r in quarantine.collect()), key=lambda v: (v is None, v)
    ) == [1, 1]
    assert clean.filter(F.col("k").isNull()).count() == 2


def test_call_rejects_unknown_kwargs(spark, tmp_path):
    """A typo'd CALL option must fail loudly, not silently run a
    materially different command (keep => vs keep_last =>)."""
    import pytest as _pytest

    from procurement_data_pipeline_spark.operators.versioned_sql import sql
    from procurement_data_pipeline_spark.operators.versioning import (
        versioned_write,
    )

    t = str(tmp_path / "tbl")
    versioned_write(
        spark, spark.createDataFrame([(1,)], "id long"), t
    )
    with _pytest.raises(ValueError, match="unknown argument.*keep"):
        sql(spark, f"CALL versioned.vacuum('{t}', keep => 1)")
    with _pytest.raises(ValueError, match="unknown argument.*zorder_cols"):
        sql(spark, f"CALL versioned.optimize('{t}', zorder_cols => 'id')")


def test_incremental_refresh_empty_rollup_reads_empty(spark, tmp_path):
    """A refresh whose only partition vanished leaves an EMPTY rollup —
    the helper must return an empty frame, not crash schema inference."""
    from procurement_data_pipeline_spark.operators.incremental import (
        incremental_refresh,
    )

    facts = spark.createDataFrame(
        [("2024-01-01", 5)], "day string, v long"
    )
    rollup_dir = str(tmp_path / "rollup")

    def fn(df):
        return df.groupBy("day").agg(F.sum("v").alias("total"))

    out = incremental_refresh(
        spark, facts, fn, rollup_dir, "day", ["2024-01-01"]
    )
    assert out.count() == 1
    # the date's facts vanish; refreshing it must EMPTY the rollup cleanly
    gone = facts.filter(F.lit(False))
    out2 = incremental_refresh(
        spark, gone, fn, rollup_dir, "day", ["2024-01-01"]
    )
    assert out2.count() == 0
    assert out2.columns == ["day", "total"]


def test_pq_codebook_k_over_int16_refused(spark):
    from procurement_data_pipeline_spark.llm_ops.pq import train_pq_codebooks
    import pytest as _pytest

    emb = spark.createDataFrame(
        [(i, [float(i), 0.0, 1.0, 2.0]) for i in range(40000)],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="int16"):
        train_pq_codebooks(emb, "embedding", m=2, k=40000, sample_size=40000)
