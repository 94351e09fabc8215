"""Model-based tests for the deeper curation operators: substring probes
against Python `in`, repeat-factor cap/budget arithmetic, containment vs
Jaccard asymmetry, and dup-coverage recomputation."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.text import EN_STOPWORDS  # noqa: F401
from procurement_data_pipeline_spark.queries.contamination import (
    _BUDGET_EPOCHS,
    _N_PROBES,
    _PROBE_LEN,
    _PROBE_START,
    _REPEAT_CAP_MICRO,
    q_docs_containment_pairs,
    q_docs_dup_ngram_coverage,
    q_docs_repeat_factors,
    q_docs_substring_contamination,
)
from procurement_data_pipeline_spark.sources.tables import load_table


def _norm(t: str) -> str:
    return " ".join(t.lower().strip().split())


def _tris(t: str) -> list[str]:
    ws = _norm(t).split(" ")
    return [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]


def test_substring_contamination_matches_python_in(spark, sf_dir):
    rows = q_docs_substring_contamination(spark, sf_dir).collect()
    docs = {d.doc_id: _norm(d.text) for d in load_table(spark, sf_dir, "documents").collect()}
    probes = {
        i: docs[i][_PROBE_START - 1 : _PROBE_START - 1 + _PROBE_LEN]
        for i in range(_N_PROBES)
        if i in docs and len(docs[i]) >= _PROBE_START - 1 + _PROBE_LEN
    }
    got = {r.probe_doc_id: r for r in rows}
    assert set(got) == set(probes)
    for pid, probe in probes.items():
        hits = sum(1 for d, t in docs.items() if d != pid and probe in t)
        assert got[pid].probe == probe
        assert got[pid].n_hits == hits
        assert got[pid].contaminated == (1 if hits else 0)


def test_repeat_factors_budget_and_cap(spark, sf_dir):
    rows = q_docs_repeat_factors(spark, sf_dir).collect()
    assert rows
    total_tokens = sum(r.tokens for r in rows)
    budget = total_tokens * _BUDGET_EPOCHS
    share = budget // len(rows)
    for r in rows:
        expected = min(_REPEAT_CAP_MICRO, share * 1000000 // r.tokens)
        assert r.repeat_micro == expected
        assert r.effective_tokens == r.tokens * r.repeat_micro // 1000000
        # Effective tokens never exceed the per-source share (except via
        # the floor granularity) nor 4 epochs of the source.
        assert r.effective_tokens <= max(share, r.tokens * 4)


def test_containment_catches_supersets_jaccard_misses(spark, sf_dir):
    rows = q_docs_containment_pairs(spark, sf_dir).collect()
    docs = {d.doc_id: set(_tris(d.text)) for d in load_table(spark, sf_dir, "documents").collect()}
    for r in rows:
        a, b = docs[r.doc_a], docs[r.doc_b]
        inter = len(a & b)
        assert r.n_shared == inter
        assert r.containment == inter / min(len(a), len(b))
        assert r.containment >= 0.9
    # Exhaustiveness: every qualifying pair is reported.
    ids = sorted(docs)
    expected = 0
    by_tri = defaultdict(set)
    for d, s in docs.items():
        for w in s:
            by_tri[w].add(d)
    cand = set()
    for ds in by_tri.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand.add((ds[i], ds[j]))
    for x, y in cand:
        inter = len(docs[x] & docs[y])
        if inter and inter / min(len(docs[x]), len(docs[y])) >= 0.9:
            expected += 1
    assert len(rows) == expected


def test_dup_ngram_coverage_recomputed(spark, sf_dir):
    rows = q_docs_dup_ngram_coverage(spark, sf_dir).collect()
    docs = {d.doc_id: _tris(d.text) for d in load_table(spark, sf_dir, "documents").collect()}
    df: Counter = Counter()
    for d, ts in docs.items():
        for w in set(ts):
            df[w] += 1
    got = {r.doc_id: r for r in rows}
    for d, ts in docs.items():
        if not ts:
            assert d not in got
            continue
        dup = sum(1 for w in ts if df[w] > 1)
        assert got[d].n_grams == len(ts)
        assert got[d].n_dup_grams == dup
        assert got[d].dup_fraction == dup / len(ts)
