"""Continuous corpus ingestion: gate → dedup → atomic versioned accept.

The batch curation DAG (plans/training_data.py) assumes the corpus fits
one run. Production ingestion is the other regime: batches arrive
forever, and each must be (a) quality-gated, (b) deduplicated against
EVERYTHING accepted so far, and (c) admitted atomically, without ever
rescanning the accumulated corpus.

The key design decision here is ONE table, not two. A separate
fingerprint index (llm_ops/incremental_dedup.py) plus a data sink has an
unclosable window: whichever of the two commits first can land while the
other's crash loses it — duplicates or ghost fingerprints follow. This
plan stores the fingerprint AS A COLUMN of the versioned corpus table, so

* the dedup anti-join reads only the fingerprint column of prior
  versions (parquet column pruning — the "index" is free),
* data + fingerprints become visible in ONE manifest publish: a crashed
  ingest is invisible and the re-run's anti-join re-derives the same
  accepts — exactly-once with no coordination,
* each ingest is a version: ``table_changes(corpus, v-1, v)`` replays
  any batch's accepted rows from the manifest file diff alone (the
  pure-append CDF fast path), and time travel reproduces the corpus any
  training run saw.

Per-batch cost at 100 TB corpus: one batch scan (gate + fingerprint +
intra-batch min-id dedup), one anti-join of batch fingerprints against a
single-column scan of the corpus (broadcast the batch side — it is the
small one), one append. The corpus data pages are never read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.caching import scoped_persist
from procurement_data_pipeline_spark.llm_ops.text import fingerprint
from procurement_data_pipeline_spark.operators.expectations import (
    check,
    in_range,
    not_null,
)
from procurement_data_pipeline_spark.operators.versioning import (
    latest_version,
    read_table,
    versioned_write,
)

FINGERPRINT_COL = "_fingerprint"


def ingest_corpus_batch(
    spark: SparkSession,
    batch: DataFrame,
    corpus_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_chars: int = 1_000_000,
) -> tuple[DataFrame, DataFrame, dict]:
    """Gate, dedup, and atomically admit one batch into the corpus table.

    Returns ``(accepted, quarantined, audit)``. ``accepted`` rows carry
    the batch's original columns; ``quarantined`` adds ``_violations``.
    The audit records every count a pipeline monitor wants, and the same
    numbers ride the published manifest (``history(corpus_path)`` is the
    ingestion log). Safe to re-run on crash: admission is a single
    manifest publish, so a half-finished ingest is invisible and the
    replayed anti-join rejects exactly what an earlier success admitted.
    """
    # the documents contract (TESTDATA.md): doc_id, text, n_chars, …
    clean, quarantined, _summary = check(
        batch,
        [
            not_null(text_col),
            not_null(id_col),
            in_range("n_chars", 1, max_chars),
        ],
    )
    fp = clean.select(fingerprint(text_col).alias(FINGERPRINT_COL), "*")
    keep = fp.groupBy(FINGERPRINT_COL).agg(F.min(id_col).alias(id_col))
    batch_unique = fp.join(keep, [FINGERPRINT_COL, id_col], "left_semi")
    if latest_version(spark, corpus_path) is None:
        known = None
    else:
        # column-pruned scan: only the fingerprint column's pages are read
        known = read_table(spark, corpus_path).select(FINGERPRINT_COL)
    novel = batch_unique if known is None else batch_unique.join(
        known, FINGERPRINT_COL, "left_anti"
    )
    accepted_full = scoped_persist(novel)
    n_batch = batch.count()
    n_quarantined = quarantined.count()
    n_unique = batch_unique.count()
    n_accepted = accepted_full.count()
    man = versioned_write(
        spark,
        accepted_full,
        corpus_path,
        mode="append",
        extra={
            "ingest": {
                "rows_in_batch": n_batch,
                "quarantined": n_quarantined,
                "intra_batch_unique": n_unique,
                "accepted": n_accepted,
                "rejected_known": n_unique - n_accepted,
            }
        },
    )
    audit = dict(man["ingest"], corpus_version=man["version"])
    return accepted_full.drop(FINGERPRINT_COL), quarantined, audit


def read_corpus(
    spark: SparkSession, corpus_path: str, version: int | None = None
) -> DataFrame:
    """The corpus without its internal fingerprint column."""
    return read_table(spark, corpus_path, version=version).drop(FINGERPRINT_COL)


__all__ = ["ingest_corpus_batch", "read_corpus", "FINGERPRINT_COL"]
