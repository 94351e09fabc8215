"""Incremental exact dedup: new batches against a persistent corpus index.

``dedup_exact``/``drop_exact_duplicates`` (llm_ops/dedup.py) dedupe a
corpus in one pass — the right tool once, the wrong one forever after: a
production ingestion never re-reads 100 TB of accepted documents to admit
tonight's 100 GB. The standard shape is a FINGERPRINT INDEX: a table of
content hashes already in the corpus, consulted by anti-join and extended
by exactly the batch's novel hashes.

This module keeps that index in the versioned table format
(operators/versioning.py), which buys the properties ingestion actually
needs for free:

* **atomic accept**: the batch's new fingerprints become visible in ONE
  manifest publish — a crashed ingest leaves the index exactly as before
  (orphan commit invisible), so the batch can simply re-run;
* **auditable history**: each ingest is a version (op metadata records
  batch counts) — "when did this document family enter the corpus?" is a
  time-travel read;
* **single-writer safety**: a concurrent ingest racing the publish loses
  with :class:`~...versioning.ConcurrentWriteError` and retries against
  the NEW index — the double-accept race (both batches admit the same
  novel document) cannot happen.

Cost per batch at 100 TB: one scan of the BATCH (fingerprint + intra-batch
min-id dedup, one hash shuffle bounded by batch size), one anti-join of
batch fingerprints against the index (broadcast the batch side — it is the
small one by construction), one append of novel fingerprints. Nothing ever
rescans the corpus. The same identity the one-shot dedup guarantees holds
cumulatively: accepted(b1..bn) == drop_exact_duplicates(b1 ∪ … ∪ bn) with
first-batch-first-id precedence (asserted by the equivalence test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.text import fingerprint
from procurement_data_pipeline_spark.operators.versioning import (
    latest_version,
    read_table,
    versioned_write,
)

_INDEX_SCHEMA_COLS = ("fingerprint", "first_doc_id")


def read_index(spark: SparkSession, index_path: str) -> DataFrame:
    """The fingerprint index's current contents (empty-shaped if absent)."""
    if latest_version(spark, index_path) is None:
        return spark.createDataFrame(
            [], "fingerprint string, first_doc_id bigint"
        )
    return read_table(spark, index_path)


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, dict]:
    """Admit ``batch``'s novel documents against the corpus index.

    Returns ``(accepted, audit)``: the accepted rows (one per content
    never seen before — intra-batch duplicates keep the min id, matching
    drop_exact_duplicates' precedence) and an audit dict.

    Crash contract, stated precisely: the INDEX is exactly-once (one
    atomic publish), but index and data sink are two commits, so a crash
    between them leaves one ahead of the other. A replay re-accepts rows
    the index missed — the data sink must therefore be idempotent per
    batch (keyed overwrite, or the batch-id-skipping
    streaming/versioned_sink). When the data sink is itself a versioned
    table, prefer plans/ingestion.py's single-table design (fingerprint
    as a corpus column), which closes the window entirely with ONE
    publish.

    The anti-join pins the index's file list at call time (read_table
    resolves the manifest eagerly) and the append never deletes files, so
    the returned plan is stable even after the index advances; it is also
    scope-persisted since the audit counts materialize it anyway.
    """
    from procurement_data_pipeline_spark.caching import scoped_persist

    fp = batch.select(fingerprint(text_col).alias("fingerprint"), "*")
    # intra-batch: min-id per fingerprint (drop_exact_duplicates precedence)
    keep = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    batch_unique = fp.join(keep, ["fingerprint", id_col], "left_semi")
    idx = read_index(spark, index_path).select("fingerprint")
    novel = scoped_persist(batch_unique.join(idx, "fingerprint", "left_anti"))
    accepted = novel.drop("fingerprint")
    n_batch = batch.count()
    n_unique = batch_unique.count()
    n_accepted = accepted.count()
    new_fps = novel.select(
        "fingerprint", F.col(id_col).cast("bigint").alias("first_doc_id")
    )
    man = versioned_write(
        spark,
        new_fps,
        index_path,
        mode="append",
        extra={
            "ingest": {
                "rows_in_batch": n_batch,
                "intra_batch_unique": n_unique,
                "accepted": n_accepted,
                "rejected_known": n_unique - n_accepted,
            }
        },
    )
    audit = dict(man["ingest"], index_version=man["version"])
    return accepted, audit


__all__ = ["ingest_batch", "read_index"]
