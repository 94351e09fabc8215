"""Tests for the confidence batch: abstention routing consistency with the
base classifier, and planted-duplicate embedding dedup."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.text import lang_id
from procurement_data_pipeline_spark.queries.confidence import (
    q_docs_langid_confidence,
    q_emb_dedup_exact,
)
from procurement_data_pipeline_spark.sources.tables import load_table


def test_langid_confidence_consistent_with_classifier(spark, sf_dir):
    rows = q_docs_langid_confidence(spark, sf_dir).collect()
    assert rows
    base = {
        r.doc_id: r.lang
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", lang_id("text").alias("lang"))
        .collect()
    }
    for r in rows:
        # The prediction must equal the base lang_id classifier exactly.
        assert r.predicted == base[r.doc_id]
        assert r.margin == abs(r.en_hits - r.de_hits)
        expected_abstain = 1 if (r.en_hits == 0 and r.de_hits == 0) or r.margin < 2 else 0
        assert r.abstain == expected_abstain


def test_emb_dedup_collapses_planted_duplicates(spark, tmp_path):
    import pandas as pd

    rng = np.random.default_rng(3)
    base = rng.standard_normal((20, 8)).astype(np.float32)
    # Plant: vectors 20..24 are exact copies of 0..4.
    X = np.vstack([base, base[:5]])
    pd.DataFrame(
        {
            "vec_id": np.arange(len(X)),
            "embedding": list(X),
            "label": np.zeros(len(X), dtype=np.int32),
        }
    ).to_parquet(str(tmp_path / "embeddings.parquet"))
    rows = q_emb_dedup_exact(spark, str(tmp_path)).collect()
    assert len(rows) == 20  # 25 vectors, 5 duplicates collapsed
    dups = [r for r in rows if r.n_vecs == 2]
    assert len(dups) == 5
    assert {r.keep_vec_id for r in dups} == {0, 1, 2, 3, 4}


def test_emb_dedup_testdata_all_unique(spark, sf_dir):
    n = load_table(spark, sf_dir, "embeddings").count()
    got = q_emb_dedup_exact(spark, sf_dir)
    assert got.count() == n
    assert got.agg(F.max("n_vecs")).collect()[0][0] == 1
