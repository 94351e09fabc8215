"""Model-based tests for the text-mining queries: chi-square keyness against
a hand-computed contingency, collocation lift consistency, and the kNN
classifier's vote contract."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.text import EN_STOPWORDS
from procurement_data_pipeline_spark.queries.textmining import (
    q_docs_collocations,
    q_docs_keyness_chi2,
    q_emb_knn_classify,
)


def _chi2(a: int, t_n: int, s_n: int, big_n: int) -> float:
    b = t_n - a
    c = s_n - a
    d = big_n - s_n - b
    cross = float(a) * float(d) - float(b) * float(c)
    return (
        float(big_n)
        * cross
        * cross
        / (float(t_n) * float(big_n - t_n) * float(s_n) * float(big_n - s_n))
    )


def test_keyness_matches_hand_computed_contingency(spark, sf_dir):
    rows = q_docs_keyness_chi2(spark, sf_dir).collect()
    assert rows
    # Recompute the contingency for every reported (source, term) from the
    # raw corpus with plain Python and compare chi2 exactly.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    sw = set(EN_STOPWORDS)
    toks: list[tuple[str, str]] = []
    for d in docs:
        norm = " ".join(d.text.lower().strip().split())
        toks += [(d.source, w) for w in norm.split(" ") if w not in sw]
    big_n = len(toks)
    src_tot = Counter(s for s, _ in toks)
    term_tot = Counter(w for _, w in toks)
    cell = Counter(toks)
    for r in rows:
        a = cell[(r.source, r.term)]
        assert a == r.term_count >= 5
        expected = _chi2(a, term_tot[r.term], src_tot[r.source], big_n)
        assert r.chi2 == expected, (r.source, r.term)
    # Per-source ranks are 1..k contiguous.
    by_src: dict[str, list[int]] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.rank)
    for ranks in by_src.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_collocations_lift_consistency(spark, sf_dir):
    rows = q_docs_collocations(spark, sf_dir).collect()
    assert rows
    sw = set(EN_STOPWORDS)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    uni: Counter = Counter()
    pair: Counter = Counter()
    for d in docs:
        cw = [
            w
            for w in " ".join(d.text.lower().strip().split()).split(" ")
            if w not in sw
        ]
        uni.update(cw)
        pair.update(zip(cw, cw[1:]))
    n_tokens = sum(uni.values())
    for r in rows:
        assert r.pair_n == pair[(r.w1, r.w2)] >= 5
        expected = (
            float(n_tokens) * float(r.pair_n) / (float(uni[r.w1]) * float(uni[r.w2]))
        )
        assert r.lift == expected
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_knn_classify_contract(spark, sf_dir):
    rows = q_emb_knn_classify(spark, sf_dir).collect()
    assert rows
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_queries = emb.where(F.col("vec_id") % 50 == 0).count()
    assert len(rows) == n_queries
    labels = set(
        r.label for r in emb.select("label").distinct().collect()
    )
    for r in rows:
        assert r.pred_label in labels
        assert 1 <= r.votes <= 5
        assert r.correct == (1 if r.pred_label == r.true_label else 0)
