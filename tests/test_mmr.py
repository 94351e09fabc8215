"""MMR rerank: equality with an independent reference implementation and
the diversity property on planted near-duplicate clusters."""

from __future__ import annotations

import numpy as np
import pytest

from procurement_data_pipeline_spark.llm_ops.similarity import mmr_rerank


def _reference_mmr(ids, vecs, q, k, lam):
    """Straight-from-the-paper greedy, no shared code with the operator."""
    q = np.asarray(q, float)
    vecs = np.asarray(vecs, float)
    rel = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(ids)), key=lambda i: (-rel[i], ids[i]))
    ids = [ids[i] for i in order]
    rel = rel[order]
    unit = vecs[order] / np.linalg.norm(vecs[order], axis=1)[:, None]
    sims = unit @ unit.T
    chosen = []
    for _ in range(k):
        best, best_score = None, None
        for i in range(len(ids)):
            if i in chosen:
                continue
            penalty = max((sims[i][j] for j in chosen), default=0.0)
            s = rel[i] if not chosen else lam * rel[i] - (1 - lam) * penalty
            if best is None or s > best_score:
                best, best_score = i, s
        chosen.append(best)
    return [ids[i] for i in chosen]


@pytest.fixture()
def clustered(spark):
    """Three tight clusters at decreasing relevance to the query [1,0,0]."""
    rng = np.random.default_rng(3)
    rows = []
    centers = {0: [1.0, 0.0, 0.0], 1: [0.7, 0.7, 0.0], 2: [0.0, 0.0, 1.0]}
    for cid, c in centers.items():
        for j in range(5):
            v = np.asarray(c) + rng.normal(0, 0.01, 3)
            rows.append((cid * 10 + j, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_mmr_matches_reference(clustered):
    # λ=0.5 with unit-tight clusters puts every candidate's score at a
    # knife-edge tie (λ·1 − (1−λ)·1 == λ·s − (1−λ)·s == 0), where the
    # Spark fold's vs numpy's low-bit dot differences could flip picks;
    # λ=0.3 gives ≥0.1 margins between clusters, so both implementations
    # must make the same greedy choices.
    rows = mmr_rerank(
        clustered, [1.0, 0.0, 0.0], k=6, pool=15, lam=0.3
    ).collect()
    got = [r["id"] for r in sorted(rows, key=lambda r: r["rank"])]
    data = clustered.collect()
    want = _reference_mmr(
        [r["vec_id"] for r in data],
        [list(map(float, r["embedding"])) for r in data],
        [1.0, 0.0, 0.0],
        6,
        0.3,
    )
    assert got == want


def test_mmr_is_more_diverse_than_topk(clustered):
    """Plain top-3 stays inside the most relevant cluster; MMR's top-3
    must span all three planted clusters."""
    plain = mmr_rerank(clustered, [1.0, 0.0, 0.0], k=3, pool=15, lam=1.0)
    mmr = mmr_rerank(clustered, [1.0, 0.0, 0.0], k=3, pool=15, lam=0.3)
    plain_clusters = {r["id"] // 10 for r in plain.collect()}
    mmr_clusters = {r["id"] // 10 for r in mmr.collect()}
    assert plain_clusters == {0}  # λ=1 → pure relevance → one cluster
    assert mmr_clusters == {0, 1, 2}


def test_mmr_ranked_output_contract(clustered):
    rows = mmr_rerank(clustered, [1.0, 0.0, 0.0], k=4, pool=10, lam=0.7).collect()
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3, 4]
    assert len({r["id"] for r in rows}) == 4  # no repeats
    top = sorted(rows, key=lambda r: r["rank"])[0]
    assert top["mmr_score"] == top["relevance"]  # first pick is pure relevance


def test_mmr_rejects_bad_params(clustered):
    with pytest.raises(ValueError):
        mmr_rerank(clustered, [1.0, 0.0, 0.0], k=20, pool=10)
    with pytest.raises(ValueError):
        mmr_rerank(clustered, [1.0, 0.0, 0.0], lam=1.5)
    with pytest.raises(ValueError):
        mmr_rerank(clustered, [0.0, 0.0, 0.0])


def test_mmr_excludes_zero_norm_vectors(spark, clustered):
    """A zero embedding has no direction: it must be excluded from the
    candidate pool, not crash the numpy stage with a NULL relevance."""
    withzero = clustered.union(
        spark.createDataFrame([(99, [0.0, 0.0, 0.0])], clustered.schema)
    )
    rows = mmr_rerank(withzero, [1.0, 0.0, 0.0], k=15, pool=20, lam=0.5).collect()
    assert 99 not in {r["id"] for r in rows}
    assert len(rows) == 15  # the 15 real vectors all rank
