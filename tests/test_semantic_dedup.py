"""SemDeDup (kmeans-bucketed near-dup) contract tests.

The recall contract of llm_ops.similarity.semantic_dedup is checked
against ground truth built from the same module's exact primitives:
within a cluster the scan is exact (no false positives, no co-clustered
misses); only cross-cluster pairs can be missed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.similarity import (
    cosine_neardup_pairs,
    kmeans_assign,
    semantic_dedup,
)
from procurement_data_pipeline_spark.sources.tables import load_table

THRESHOLD = 0.35


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def result(emb):
    return semantic_dedup(emb, threshold=THRESHOLD).collect()


@pytest.fixture(scope="module")
def truth(emb):
    """(exact near-dup pairs, cluster assignment) — ground truth from the
    module's own exact primitives under identical parameters."""
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_neardup_pairs(emb, threshold=THRESHOLD).collect()
    }
    clusters = {
        r["vec_id"]: r["cluster"] for r in kmeans_assign(emb).collect()
    }
    return pairs, clusters


def test_corpus_shaped_output(result, emb):
    assert len(result) == emb.count()
    assert len({r["vec_id"] for r in result}) == len(result)


def test_exactly_the_coclustered_pairs(result, truth):
    """n_dup_smaller is EXACTLY the number of smaller-id co-clustered
    exact near-dup partners: no false positives (pairs invented), no
    co-clustered misses — both directions in one equality."""
    pairs, clusters = truth
    expect = {r_id: 0 for r_id in clusters}
    for a, b in pairs:  # a < b by cosine_neardup_pairs contract
        if clusters[a] == clusters[b]:
            expect[b] += 1
    got = {r["vec_id"]: r["n_dup_smaller"] for r in result}
    assert got == expect


def test_flag_consistent_with_count(result):
    for r in result:
        assert r["is_dup"] == (1 if r["n_dup_smaller"] > 0 else 0)
        assert r["n_dup_smaller"] >= 0


def test_cluster_matches_kmeans(result, truth):
    _, clusters = truth
    for r in result:
        assert r["cluster"] == clusters[r["vec_id"]]


def test_integer_schema(emb):
    df = semantic_dedup(emb, threshold=THRESHOLD)
    kinds = dict(df.dtypes)
    assert kinds == {
        "vec_id": "bigint",
        "cluster": "int",
        "n_dup_smaller": "bigint",
        "is_dup": "int",
    }


def test_kept_set_covers_every_dup_group(result, truth):
    """Keep-first semantics: for every flagged duplicate there is a kept
    (is_dup=0) smaller-id point reachable in its cluster's dup graph —
    i.e. dedup never deletes an entire near-dup group."""
    pairs, clusters = truth
    flagged = {r["vec_id"] for r in result if r["is_dup"] == 1}
    kept = {r["vec_id"] for r in result if r["is_dup"] == 0}
    for v in flagged:
        partners = {
            a for (a, b) in pairs if b == v and clusters[a] == clusters[v]
        }
        assert partners, v
        assert min(partners) < v
        # the minimum-id member of any group is never flagged by smaller
        # partners outside its own group only if the chain bottoms out in
        # a kept point; walk down the smallest-partner chain
        cur = v
        seen = set()
        while cur in flagged and cur not in seen:
            seen.add(cur)
            smaller = {
                a
                for (a, b) in pairs
                if b == cur and clusters[a] == clusters[cur]
            }
            if not smaller:
                break
            cur = min(smaller)
        assert cur in kept, (v, cur)


def test_multiprobe_improves_low_threshold_recall(emb, truth):
    """VERDICT r8 item 6 — multi-probe SemDeDup: assigning each point to
    its top-2 nearest cells and comparing pairs that share ANY co-probed
    cell must (a) keep probe-0 bit-identical to the single-probe
    assignment, (b) keep counts EXACT over the co-probed candidate set
    (distinct partners — a pair sharing two cells counts once), and
    (c) materially cut the cross-cluster miss rate at the low τ=0.35
    (measured 0.32 → 0.77 at sf0.001)."""
    pairs, clusters = truth
    asg2 = kmeans_assign(emb, probes=2).collect()
    cells: dict[int, set[int]] = {}
    primary = {}
    for r in asg2:
        cells.setdefault(r["vec_id"], set()).add(r["cluster"])
        if r["probe"] == 0:
            primary[r["vec_id"]] = r["cluster"]
    assert primary == clusters  # training trajectory untouched
    assert all(len(c) == 2 for c in cells.values())

    res2 = {
        r["vec_id"]: r
        for r in semantic_dedup(emb, threshold=THRESHOLD, probes=2).collect()
    }
    expect = {v: 0 for v in clusters}
    for a, b in pairs:  # a < b
        if cells[a] & cells[b]:
            expect[b] += 1
    assert {v: r["n_dup_smaller"] for v, r in res2.items()} == expect
    # the corpus shape is unchanged: cluster = the argmin assignment
    assert all(res2[v]["cluster"] == primary[v] for v in res2)

    rec1 = sum(1 for a, b in pairs if clusters[a] == clusters[b]) / len(pairs)
    rec2 = sum(1 for a, b in pairs if cells[a] & cells[b]) / len(pairs)
    assert rec2 >= rec1 + 0.2, (rec1, rec2)  # materially, not marginally


def test_probes_must_be_positive(emb):
    """ADVICE r10: probes=0/negative used to surface deep in the pair scan
    as an unresolved-column error (kmeans_assign emits the probe column
    only for probes>1, semantic_dedup normalizes only probes==1) — both
    entry points must refuse up front instead."""
    for bad in (0, -1):
        with pytest.raises(ValueError, match="probes must be >= 1"):
            kmeans_assign(emb, probes=bad)
        with pytest.raises(ValueError, match="probes must be >= 1"):
            semantic_dedup(emb, threshold=THRESHOLD, probes=bad)
