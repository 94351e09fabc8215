"""Continuous corpus ingestion plan: gate → dedup → atomic accept → CDF."""

from __future__ import annotations

from procurement_data_pipeline_spark.llm_ops.dedup import (
    drop_exact_duplicates,
)
from procurement_data_pipeline_spark.operators.cdf import table_changes
from procurement_data_pipeline_spark.operators.versioning import history
from procurement_data_pipeline_spark.plans.ingestion import (
    ingest_corpus_batch,
    read_corpus,
)


def _batch(spark, rows):
    return spark.createDataFrame(
        [(i, t, len(t) if t is not None else None) for i, t in rows],
        "doc_id long, text string, n_chars long",
    )


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_ingestion_accumulates_like_one_shot(spark, tmp_path):
    c = str(tmp_path / "corpus")
    b1 = _batch(spark, [(1, "alpha beta"), (2, "gamma"), (3, "alpha beta")])
    b2 = _batch(spark, [(10, "gamma"), (11, "delta")])
    a1, q1, audit1 = ingest_corpus_batch(spark, b1, c)
    a2, q2, audit2 = ingest_corpus_batch(spark, b2, c)
    assert audit1 == {
        "rows_in_batch": 3,
        "quarantined": 0,
        "intra_batch_unique": 2,
        "accepted": 2,
        "rejected_known": 0,
        "corpus_version": 1,
    }
    assert audit2["rejected_known"] == 1 and audit2["accepted"] == 1
    # the corpus equals the one-shot dedup of all gated rows
    oneshot = drop_exact_duplicates(b1.unionAll(b2))
    assert _ids(read_corpus(spark, c)) == _ids(oneshot)
    assert set(read_corpus(spark, c).columns) == {"doc_id", "text", "n_chars"}


def test_gate_quarantines_and_audit_rides_manifest(spark, tmp_path):
    c = str(tmp_path / "corpus")
    bad = _batch(spark, [(1, "ok"), (2, None), (None, "no id")])
    accepted, quarantined, audit = ingest_corpus_batch(spark, bad, c)
    assert _ids(accepted) == [1]
    assert quarantined.count() == 2
    assert audit["quarantined"] == 2 and audit["accepted"] == 1
    # the manifest IS the ingestion log
    assert history(spark, c)[-1]["op"] == "append"


def test_each_ingest_is_a_cdf_replayable_version(spark, tmp_path):
    c = str(tmp_path / "corpus")
    ingest_corpus_batch(spark, _batch(spark, [(1, "x"), (2, "y")]), c)
    accepted, _, audit = ingest_corpus_batch(
        spark, _batch(spark, [(3, "z"), (4, "y")]), c
    )
    v = audit["corpus_version"]
    feed = table_changes(spark, c, from_version=v - 1, to_version=v)
    assert sorted(r["new_doc_id"] for r in feed.collect()) == _ids(accepted) == [3]
    assert {r["change_type"] for r in feed.collect()} == {"insert"}
    # time travel reproduces what any earlier training run saw
    assert _ids(read_corpus(spark, c, version=1)) == [1, 2]


def test_replay_after_success_is_a_noop(spark, tmp_path):
    c = str(tmp_path / "corpus")
    b = _batch(spark, [(1, "a"), (2, "b")])
    ingest_corpus_batch(spark, b, c)
    accepted, _, audit = ingest_corpus_batch(spark, b, c)
    assert audit["accepted"] == 0 and audit["rejected_known"] == 2
    assert _ids(read_corpus(spark, c)) == [1, 2]
