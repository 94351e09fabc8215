"""Incremental exact dedup against the versioned fingerprint index."""

from __future__ import annotations

from procurement_data_pipeline_spark.llm_ops.dedup import (
    drop_exact_duplicates,
)
from procurement_data_pipeline_spark.llm_ops.incremental_dedup import (
    ingest_batch,
    read_index,
)
from procurement_data_pipeline_spark.operators.versioning import history


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_cumulative_equals_one_shot(spark, tmp_path):
    """accepted(b1..b3) must equal drop_exact_duplicates(b1 ∪ b2 ∪ b3)
    with min-id precedence — the incremental path changes WHEN dedup
    happens, never WHAT survives."""
    idx = str(tmp_path / "fpindex")
    b1 = _batch(spark, [(1, "alpha beta"), (2, "gamma"), (3, "alpha beta")])
    b2 = _batch(spark, [(10, "gamma"), (11, "delta"), (12, "delta")])
    b3 = _batch(spark, [(20, "alpha  BETA"), (21, "epsilon")])
    a1, audit1 = ingest_batch(spark, b1, idx)
    a2, audit2 = ingest_batch(spark, b2, idx)
    a3, audit3 = ingest_batch(spark, b3, idx)
    got = _ids(a1) + _ids(a2) + _ids(a3)
    oneshot = drop_exact_duplicates(b1.unionAll(b2).unionAll(b3))
    assert sorted(got) == _ids(oneshot)
    assert audit1 == {
        "rows_in_batch": 3,
        "intra_batch_unique": 2,
        "accepted": 2,
        "rejected_known": 0,
        "index_version": 1,
    }
    assert audit2["rejected_known"] == 1 and audit2["accepted"] == 1
    # normalization: "alpha  BETA" is the same content as "alpha beta"
    # only if the fingerprint normalizes — either way both paths agree
    assert audit3["index_version"] == 3
    # the index is the union of accepted fingerprints, first ids recorded
    assert read_index(spark, idx).count() == len(sorted(got))


def test_crash_replay_is_idempotent(spark, tmp_path):
    """A batch re-run after a crash BETWEEN data-sink write and index
    publish accepts the same rows once the index commit finally lands;
    a re-run AFTER the publish accepts nothing."""
    idx = str(tmp_path / "fpindex")
    b = _batch(spark, [(1, "x"), (2, "y")])
    a1, audit1 = ingest_batch(spark, b, idx)
    assert audit1["accepted"] == 2
    # replay of the SAME batch: everything already indexed
    a2, audit2 = ingest_batch(spark, b, idx)
    assert audit2["accepted"] == 0 and audit2["rejected_known"] == 2
    assert _ids(a2) == []
    # history shows both ingests (the empty one too — auditable no-op)
    assert [h["op"] for h in history(spark, idx)] == ["append", "append"]


def test_cross_batch_precedence_keeps_first_arrival(spark, tmp_path):
    idx = str(tmp_path / "fpindex")
    ingest_batch(spark, _batch(spark, [(5, "same content")]), idx)
    accepted, _ = ingest_batch(spark, _batch(spark, [(1, "same content")]), idx)
    # the CORPUS keeps doc 5 (first arrival), even though 1 < 5 — the
    # one-shot equivalence only holds for ids arriving in batch order
    assert _ids(accepted) == []
    first = read_index(spark, idx).collect()
    assert len(first) == 1 and first[0]["first_doc_id"] == 5
