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
* **single-writer safety**: the publish is PINNED to the snapshot the
  anti-join read (``expected_base``), so an ingest that advanced the
  index anywhere between our read and our commit makes the publish lose
  with :class:`~...versioning.ConcurrentWriteError`; the loser retries
  against the NEW index — the double-accept race (both batches admit the
  same novel document) cannot happen.

Cost per batch at 100 TB: one scan of the BATCH (fingerprint + intra-batch
min-id dedup, one hash shuffle bounded by batch size), one broadcast-probe
scan of the index (the batch's fingerprints broadcast INTO a semi-join
over the index — ``known`` is bounded by the batch, and the batch then
anti-joins against broadcast ``known``; the index is scanned once and
shuffled never), one append of novel fingerprints. Nothing ever
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

    # pin the snapshot FIRST: the publish below targets exactly this
    # version + 1, so an ingest that raced past us between this read and
    # our commit makes the publish lose with ConcurrentWriteError — the
    # double-accept race genuinely cannot happen (code-review r8: the old
    # unpinned write re-read latest at commit time and would commit
    # cleanly against the NEWER index, silently double-accepting).
    idx_version = latest_version(spark, index_path)
    fp = batch.select(fingerprint(text_col).alias("fingerprint"), "*")
    # intra-batch: min-id per fingerprint (drop_exact_duplicates precedence)
    keep = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    # persisted: feeds the broadcast fingerprint probe, the anti-join AND
    # the audit count — one fingerprint+shuffle pass, not three
    batch_unique = scoped_persist(
        fp.join(keep, ["fingerprint", id_col], "left_semi")
    )
    idx = (
        read_table(spark, index_path, version=idx_version)
        if idx_version is not None
        else spark.createDataFrame([], "fingerprint string, first_doc_id bigint")
    ).select("fingerprint")
    # "broadcast the batch side": Spark cannot build the LEFT side of a
    # left_anti broadcast join, so the literal batch⟕idx anti-join would
    # shuffle the ENTIRE index every ingest (code-review r8). Probe the
    # index with the broadcast batch fingerprints instead — `known` is
    # bounded by the batch — then anti-join the batch against broadcast
    # known. The index is scanned once, shuffled never.
    known = idx.join(
        F.broadcast(batch_unique.select("fingerprint")),
        "fingerprint",
        "left_semi",
    )
    novel = scoped_persist(
        batch_unique.join(F.broadcast(known), "fingerprint", "left_anti")
    )
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
        expected_base=idx_version,
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
