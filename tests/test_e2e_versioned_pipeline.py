"""End-to-end: corpus ingestion → CDF consumer → incrementally maintained
rollup, every link crash-safe and the rollup equal to a from-scratch
recompute after every step."""

from __future__ import annotations

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.operators.cdf_consumer import (
    consume_changes,
)
from procurement_data_pipeline_spark.operators.versioning import (
    history,
    latest_version,
    merge_into,
    read_table,
    versioned_write,
)
from procurement_data_pipeline_spark.plans.ingestion import (
    ingest_corpus_batch,
    read_corpus,
)


def _batch(spark, rows):
    return spark.createDataFrame(
        [(i, t, s, len(t)) for i, t, s in rows],
        "doc_id long, text string, source string, n_chars long",
    )


def _apply_rollup(spark, rollup_path):
    """Handler: fold the insert feed into per-source (docs, chars) via a
    keyed merge — idempotent per range because merge replaces by key."""

    def handler(feed, from_v, to_v):
        delta = feed.groupBy(F.col("new_source").alias("source")).agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("new_n_chars").cast("long").alias("chars"),
        )
        if latest_version(spark, rollup_path) is None:
            versioned_write(spark, delta, rollup_path)
            return
        cur = read_table(spark, rollup_path)
        merged = (
            cur.alias("c")
            .join(delta.alias("d"), "source", "full_outer")
            .select(
                "source",
                (
                    F.coalesce(F.col("c.docs"), F.lit(0))
                    + F.coalesce(F.col("d.docs"), F.lit(0))
                ).alias("docs"),
                (
                    F.coalesce(F.col("c.chars"), F.lit(0))
                    + F.coalesce(F.col("d.chars"), F.lit(0))
                ).alias("chars"),
            )
        )
        merge_into(spark, rollup_path, merged, key_col="source")

    return handler


def _expected_rollup(corpus_df):
    return {
        r["source"]: (r["docs"], r["chars"])
        for r in corpus_df.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
        .collect()
    }


def test_ingest_consume_rollup_loop(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    rollup = str(tmp_path / "rollup")
    cursor = str(tmp_path / "cursor.json")
    handler = _apply_rollup(spark, rollup)

    b1 = _batch(spark, [(1, "alpha", "web"), (2, "beta", "web"), (3, "alpha", "book")])
    b2 = _batch(spark, [(10, "beta", "book"), (11, "gamma", "book")])

    ingest_corpus_batch(spark, b1, corpus)
    consume_changes(spark, corpus, cursor, handler)
    got1 = {
        r["source"]: (r["docs"], r["chars"])
        for r in read_table(spark, rollup).collect()
    }
    assert got1 == _expected_rollup(read_corpus(spark, corpus))

    # second batch: doc 10 ("beta") and doc 3's dup ("alpha") were seen —
    # only the truly novel rows flow through the feed into the rollup
    ingest_corpus_batch(spark, b2, corpus)
    consume_changes(spark, corpus, cursor, handler)
    got2 = {
        r["source"]: (r["docs"], r["chars"])
        for r in read_table(spark, rollup).collect()
    }
    assert got2 == _expected_rollup(read_corpus(spark, corpus))
    assert got2["book"][0] == got1.get("book", (0, 0))[0] + 1  # gamma only

    # idle poll: nothing changes anywhere
    v_before = latest_version(spark, rollup)
    consume_changes(spark, corpus, cursor, handler)
    assert latest_version(spark, rollup) == v_before

    # both tables carry full audit history
    assert [h["op"] for h in history(spark, corpus)] == ["append", "append"]
    assert history(spark, rollup)[-1]["op"] == "merge"
