"""Streaming near-dup LSH and streaming count-min: both must reproduce
their batch counterparts exactly (bucket membership / merged counts)."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.dedup import (
    band_hashes,
    minhash_signature_expr,
    minhash_signatures,
)
from procurement_data_pipeline_spark.llm_ops.sketch import countmin_build
from procurement_data_pipeline_spark.sources.tables import load_table
from procurement_data_pipeline_spark.streaming.neardup import (
    streaming_neardup_candidates,
)
from procurement_data_pipeline_spark.streaming.pipeline import (
    read_countmin_store,
    run_to_completion,
    stream_countmin,
)

SF_DIR = "/root/testdata/sf0.001"


def test_rowwise_signature_equals_batch(spark):
    docs = load_table(spark, SF_DIR, "documents")
    batch = {r["doc_id"]: tuple(r["sig"]) for r in minhash_signatures(docs).collect()}
    row = {
        r["doc_id"]: tuple(r["sig"])
        for r in docs.select(
            "doc_id", minhash_signature_expr("text").alias("sig")
        ).collect()
    }
    assert row == batch


def test_streaming_neardup_matches_batch_buckets(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_src")
    docs.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    got = run_to_completion(
        streaming_neardup_candidates(stream),
        str(tmp_path / "ckpt"),
        query_name="neardup",
    )

    # Batch truth: bucket membership per (band_idx, band_hash).
    batch_buckets: dict[tuple, set] = defaultdict(set)
    banded = (
        minhash_signatures(docs)
        .select(
            "doc_id",
            F.posexplode(band_hashes(F.col("sig"), 8)).alias("band_idx", "band_hash"),
        )
        .collect()
    )
    for r in banded:
        batch_buckets[(r["band_idx"], r["band_hash"])].add(r["doc_id"])

    stream_buckets: dict[tuple, set] = defaultdict(set)
    for r in got:
        key = (r["band_idx"], r["band_hash"])
        stream_buckets[key].add(r["doc_id"])
        stream_buckets[key].add(r["anchor_id"])
        # every emitted pair truly collides in this batch band bucket
        assert r["doc_id"] in batch_buckets[key], (key, r["doc_id"])
        assert r["anchor_id"] in batch_buckets[key], (key, r["anchor_id"])

    multi = {k: v for k, v in batch_buckets.items() if len(v) > 1}
    assert multi, "fixture must contain band collisions"
    # Streamed membership == batch membership for every colliding bucket,
    # and the pair count per bucket is exactly (size - 1).
    assert stream_buckets == multi
    per_bucket_pairs: dict[tuple, int] = defaultdict(int)
    for r in got:
        per_bucket_pairs[(r["band_idx"], r["band_hash"])] += 1
    assert all(per_bucket_pairs[k] == len(v) - 1 for k, v in multi.items())


def test_stream_countmin_equals_direct_build(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "ev_src")
    ev.repartition(3).write.parquet(src)

    store = str(tmp_path / "cms_store")
    stream_countmin(
        spark,
        src,
        "event_type",
        store,
        str(tmp_path / "ckpt_cms"),
        width=32,
        depth=3,
    )
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in read_countmin_store(spark, store).collect()
    }
    direct = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in countmin_build(
            spark.read.parquet(src), "event_type", width=32, depth=3
        ).collect()
    }
    assert merged == direct

    # Replay safety: re-running the fold for an already-seen batch id must
    # leave the store byte-identical (partition overwrite, not append).
    stream_countmin(
        spark,
        src,
        "event_type",
        store,
        str(tmp_path / "ckpt_cms"),  # same checkpoint: nothing new to do
        width=32,
        depth=3,
    )
    again = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in read_countmin_store(spark, store).collect()
    }
    assert again == direct


def test_stream_static_dim_join_matches_batch(spark, tmp_path):
    """Stream-static broadcast enrichment — the third streaming join shape
    next to stream-stream (click_attribution_join) and stream-state
    (neardup): a static dimension joined onto a stream is stateless (the
    dim is re-broadcast per microbatch, no state store), so the streamed
    result must equal the batch join row-for-row."""
    ev = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "ev_src2")
    ev.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema

    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn("segment", (F.col("user_id") % 3).cast("int"))
    )

    def enrich(df):
        return df.join(F.broadcast(dim), "user_id").select(
            "event_id", "user_id", "segment"
        )

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    got = run_to_completion(
        enrich(stream), str(tmp_path / "ckpt_dim"), query_name="dim_join"
    )
    batch = enrich(spark.read.parquet(src)).collect()
    assert {tuple(r) for r in got} == {tuple(r) for r in batch}
    assert len(got) == len(batch) == ev.count()
