"""Tests for the round-5 analytics additions: TF-IDF, SCD Type-2 interval
compaction, distributed k-means, and HLL distinct-count sketches."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.similarity import kmeans_assign
from procurement_data_pipeline_spark.llm_ops.text import tfidf_log_idf
from procurement_data_pipeline_spark.registry import load_all
from procurement_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- TF-IDF


def test_tfidf_topterms_hand_fixture(spark):
    """Three tiny docs with a known characteristic term each: the term
    unique to a document must outrank the corpus-wide filler words."""
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the rug"),
            (3, "the fox ran past the barn quickly"),
        ],
        ["doc_id", "text"],
    )
    # The registered builder reads the documents table, so recompute inline
    # with the same contract: tf * N / df, ties by word.
    from procurement_data_pipeline_spark.llm_ops.text import words

    tf = (
        docs.select("doc_id", F.explode(words("text")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = docs.count()
    scored = tf.join(df, "word").withColumn(
        "tfidf", (F.col("tf") * F.lit(n)).cast("double") / F.col("df")
    )
    rows = {
        (r["doc_id"], r["word"]): r["tfidf"] for r in scored.collect()
    }
    # "cat" appears once in doc 1 only: tfidf = 1*3/1 = 3.0
    assert rows[(1, "cat")] == 3.0
    # "the" appears in every doc (df=3): per-occurrence weight 1.0; doc 3 has
    # it twice -> 2.0, still below its unique terms at 3.0
    assert rows[(3, "the")] == 2.0
    assert rows[(3, "fox")] == 3.0
    # unique terms strictly outrank corpus-wide filler within each doc
    assert rows[(1, "cat")] > rows[(1, "the")]


def test_tfidf_log_idf_monotone(spark):
    """The production log-idf weight strictly increases in tf and strictly
    decreases in df (the contract that replaces cross-engine hashability)."""
    grid = spark.createDataFrame(
        [(tf, df) for tf in (1, 2, 5, 10) for df in (1, 2, 10, 100)],
        ["tf", "df"],
    ).withColumn(
        "w", tfidf_log_idf(F.col("tf"), F.col("df"), F.lit(1000))
    )
    rows = {(r["tf"], r["df"]): r["w"] for r in grid.collect()}
    for df in (1, 2, 10, 100):
        assert rows[(1, df)] < rows[(2, df)] < rows[(5, df)] < rows[(10, df)]
    for tf in (1, 2, 5, 10):
        assert rows[(tf, 1)] > rows[(tf, 2)] > rows[(tf, 10)] > rows[(tf, 100)]
    # spot value: tf=1, df=1, N=1000 -> ln(1001/2) + 1
    assert math.isclose(rows[(1, 1)], math.log(1001 / 2) + 1, rel_tol=1e-12)


# ---------------------------------------------------------------- SCD2


def _scd2(spark):
    return load_all()["events_user_state_scd2"].builder(spark, SF_DIR)


def test_scd2_intervals_partition_history(spark):
    """Per user: versions are 1..n_runs dense, intervals chain exactly
    (valid_to == next valid_from), exactly one open current row, and no
    two consecutive runs carry the same event_type (maximal compaction)."""
    out = _scd2(spark).collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user, "no SCD2 output"
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r["version"])
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        currents = [r for r in rows if r["is_current"] == 1]
        assert len(currents) == 1 and currents[0] is rows[-1]
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to_us"] == b["valid_from_us"], "interval gap"
            assert a["event_type"] != b["event_type"], "uncompacted run"
        assert rows[-1]["valid_to_us"] is None


def test_scd2_event_counts_cover_stream(spark):
    """The n_events across a user's runs sum to their event count — no
    event lost or double-assigned by the run compaction."""
    ev = load_table(spark, SF_DIR, "events")
    expected = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got: dict[int, int] = {}
    for r in _scd2(spark).collect():
        got[r["user_id"]] = got.get(r["user_id"], 0) + r["n_events"]
    assert got == expected


# ---------------------------------------------------------------- k-means


def test_kmeans_assignment_is_nearest_seeded_centroid(spark):
    """iters=1 degenerates to nearest-seed assignment — verify against an
    independent numpy recomputation of the quantized distances."""
    import numpy as np

    emb = load_table(spark, SF_DIR, "embeddings")
    out = {r["vec_id"]: r["cluster"] for r in kmeans_assign(emb, k=4, iters=1).collect()}
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.floor(np.array(r["embedding"], dtype=np.float64) * 1e6) for r in rows}
    seed_ids = sorted(vecs)[:4]
    seeds = [vecs[i] for i in seed_ids]
    for vid, p in vecs.items():
        dists = [int(((p - c) ** 2).sum()) for c in seeds]
        best = min(range(4), key=lambda j: (dists[j], j))
        assert out[vid] == best, f"vec {vid}: {out[vid]} != {best}"


def test_kmeans_deterministic_and_total(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    a = kmeans_assign(emb, k=8, iters=2).collect()
    b = kmeans_assign(emb, k=8, iters=2).collect()
    assert sorted((r["vec_id"], r["cluster"]) for r in a) == sorted(
        (r["vec_id"], r["cluster"]) for r in b
    )
    assert len(a) == emb.count()
    assert {r["cluster"] for r in a} <= set(range(8))


def test_kmeans_iterations_do_not_increase_inertia(spark):
    """Lloyd's update never increases total squared distance to the
    assigned (floor-quantized) centroids — checked via numpy replay."""
    import numpy as np

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: np.floor(np.array(r["embedding"], dtype=np.float64) * 1e6) for r in rows}

    def inertia(assign: dict[int, int]) -> float:
        groups: dict[int, list] = {}
        for vid, c in assign.items():
            groups.setdefault(c, []).append(vecs[vid])
        cents = {c: np.floor(np.mean(np.vstack(g), axis=0)) for c, g in groups.items()}
        return sum(float(((vecs[v] - cents[c]) ** 2).sum()) for v, c in assign.items())

    a1 = {r["vec_id"]: r["cluster"] for r in kmeans_assign(emb, k=8, iters=1).collect()}
    a2 = {r["vec_id"]: r["cluster"] for r in kmeans_assign(emb, k=8, iters=2).collect()}
    assert inertia(a2) <= inertia(a1) + 1e-6


# ---------------------------------------------------------------- HLL


def test_hll_estimate_within_error_bound(spark):
    """lgConfigK=12 gives ~1.6% RSE; assert the per-type estimate is within
    5% (≈3 sigma) of the exact distinct count."""
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_users"]
        for r in load_all()["events_distinct_users_hll"].builder(spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact)
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(0.05 * n, 2), (t, approx[t], n)


def test_hll_merge_equals_direct(spark):
    """Union of daily partial sketches estimates EXACTLY what one direct
    pass estimates — the mergeability property that makes HLL the right
    incremental-rollup form (partials can be stored and re-unioned)."""
    direct = {
        r["event_type"]: r["approx_users"]
        for r in load_all()["events_distinct_users_hll"].builder(spark, SF_DIR).collect()
    }
    merged = {
        r["event_type"]: r["approx_users"]
        for r in load_all()["events_distinct_users_hll_rollup"]
        .builder(spark, SF_DIR)
        .collect()
    }
    assert merged == direct


# ------------------------------------------------------------ profiling


def test_zscore_outliers_match_numpy(spark):
    """Independent numpy recomputation of population z-scores: the query
    must flag exactly the |z| > 3 rows."""
    import numpy as np

    ev = load_table(spark, SF_DIR, "events")
    rows = ev.select("event_id", "event_type", "value").collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    expected = set()
    for t, rs in by_type.items():
        vm = np.floor(np.array([r["value"] for r in rs]) * 1e6)
        mean, std = vm.mean(), vm.std()  # population std, ddof=0
        if std <= 0:
            continue
        for r, v in zip(rs, vm):
            if abs((v - mean) / std) > 3:
                expected.add(r["event_id"])
    got = {
        r["event_id"]
        for r in load_all()["events_value_zscore_outliers"]
        .builder(spark, SF_DIR)
        .collect()
    }
    # numpy's mean/std take different float paths than the exact integer
    # moments, so only rows within 1e-6 of the cut could diverge — assert
    # exact equality, which holds because no |z| sits that close to 3 here.
    assert got == expected


def test_histogram_partitions_all_rows(spark):
    ev = load_table(spark, SF_DIR, "events")
    hist = load_all()["events_value_histogram"].builder(spark, SF_DIR).collect()
    assert sum(r["n"] for r in hist) == ev.count()
    for r in hist:
        assert 50.0 * r["bucket"] <= r["min_value"] <= r["max_value"] < 50.0 * (r["bucket"] + 1)


def test_unpivot_inverts_pivot(spark):
    long = load_all()["events_daily_unpivot"].builder(spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events")
    direct = (
        ev.filter(F.col("event_type").isin("click", "view", "purchase"))
        .groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            F.concat(F.col("event_type"), F.lit("s")).alias("metric"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # long form == direct long-form aggregation wherever counts are nonzero
    got = {(r["day"], r["metric"]): r["n"] for r in long.collect() if r["n"] > 0}
    want = {(r["day"], r["metric"]): r["n"] for r in direct.collect()}
    assert got == want


def test_temperature_mix_flattens_toward_uniform(spark):
    """Square-root sampling: output proportions sit between the natural
    skew and uniform, and the scarcest source is kept in full."""
    docs = load_table(spark, SF_DIR, "documents")
    from procurement_data_pipeline_spark.llm_ops.curation import (
        corpus_mix,
        temperature_weights,
    )

    before = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    out = corpus_mix(docs, temperature_weights(docs, alpha=0.5))
    after = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    scarcest = min(before, key=lambda s: before[s])
    assert after[scarcest] == before[scarcest]  # kept whole
    # expected kept count per source: n * min(sqrt)/sqrt(n) = sqrt(n*n_min)
    import math

    n_min = before[scarcest]
    for s, n in before.items():
        expect = math.sqrt(n * n_min)
        # binomial-ish tolerance on the hash filter
        assert abs(after[s] - expect) <= 4 * math.sqrt(expect) + 2, (
            s,
            after[s],
            expect,
        )


def test_rolling_distinct_hll_tracks_exact(spark):
    """The sliding-window sketch union must track the exact trailing-7-day
    distinct counts within HLL error (lgK=12 → assert 5%)."""
    exact = {
        r["day"]: r["n_users_7d"]
        for r in load_all()["events_rolling_distinct_users"]
        .builder(spark, SF_DIR)
        .collect()
    }
    approx = {
        r["day"]: r["n_users_7d_approx"]
        for r in load_all()["events_rolling_distinct_users_hll"]
        .builder(spark, SF_DIR)
        .collect()
    }
    assert set(approx) == set(exact)
    for d, n in exact.items():
        assert abs(approx[d] - n) <= max(0.05 * n, 2), (d, approx[d], n)


def test_quality_weighted_sample_tier_rates(spark):
    """Each tier's kept fraction sits near its declared rate, and the
    top tier is kept in full."""
    from procurement_data_pipeline_spark.llm_ops.curation import (
        quality_weighted_sample,
    )
    from procurement_data_pipeline_spark.llm_ops.text import quality_score

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", quality_score("text").alias("quality_score")
    )
    kept = quality_weighted_sample(docs)
    import math

    def tier(df, lo, hi):
        return df.filter(
            (F.col("quality_score") >= lo) & (F.col("quality_score") < hi)
        ).count()

    for lo, hi, rate in ((0.8, 10.0, 1.0), (0.5, 0.8, 0.5), (-1.0, 0.5, 0.125)):
        n, k = tier(docs, lo, hi), tier(kept, lo, hi)
        if n == 0:
            continue
        expect = n * rate
        assert abs(k - expect) <= 4 * math.sqrt(max(expect, 1)) + 2, (
            lo,
            k,
            expect,
        )
    # top tier exactly whole
    assert tier(kept, 0.8, 10.0) == tier(docs, 0.8, 10.0)


def test_dedup_keep_best_beats_min_id_quality(spark):
    """keep-best must select, per multi-member cluster, a member whose
    quality is >= the min-id member's — and exactly one survivor per
    cluster."""
    best = load_all()["docs_dedup_keep_best"].builder(spark, SF_DIR).collect()
    clusters = load_all()["docs_dedup_clusters"].builder(spark, SF_DIR)
    qual = {
        r["doc_id"]: r["quality_score"]
        for r in load_all()["docs_quality_score"].builder(spark, SF_DIR).collect()
    }
    members: dict[int, list[int]] = {}
    for r in clusters.collect():
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    by_cluster = {r["cluster_id"]: r["doc_id"] for r in best}
    assert set(by_cluster) == set(members)  # one survivor per cluster
    for cid, ms in members.items():
        min_id = min(ms)
        assert qual[by_cluster[cid]] >= qual[min_id] - 1e-12


def test_daily_dense_zero_fills_gaps(spark):
    dense = load_all()["events_daily_dense"].builder(spark, SF_DIR)
    rows = dense.collect()
    days = sorted({r["day"] for r in rows})
    types = {r["event_type"] for r in rows}
    # full grid: every (day, type) cell present exactly once
    assert len(rows) == len(days) * len(types)
    assert (days[-1] - days[0]).days + 1 == len(days)  # calendar-dense
    ev = load_table(spark, SF_DIR, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()


def test_semantic_decontaminate_empty_eval_set_flags_nothing(spark):
    """An empty eval set must mark every corpus row clean (max NULL,
    contaminated 0) — not silently drop the corpus (regression: the bare
    cross join did exactly that)."""
    from procurement_data_pipeline_spark.llm_ops.similarity import (
        semantic_decontaminate,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    out = semantic_decontaminate(emb, emb.filter(F.col("vec_id") < 0)).collect()
    assert len(out) == emb.count()
    assert all(r["contaminated"] == 0 and r["max_eval_cos"] is None for r in out)


def test_chunking_covers_every_word_with_declared_overlap(spark):
    """Chunk layout invariants: spans start at 1+80k, the final chunk ends
    exactly at the doc's word count, consecutive chunks overlap by 20
    words (when full), and every word index is covered."""
    from procurement_data_pipeline_spark.llm_ops.text import word_count

    chunks = load_all()["docs_chunking"].builder(spark, SF_DIR).collect()
    n_words = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", word_count("text").alias("n"))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_words)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in rs] == list(range(len(rs)))
        covered_end = 0
        for r in rs:
            assert r["start_word"] == 1 + 80 * r["chunk_idx"]
            assert r["start_word"] <= covered_end + 1  # no gap
            covered_end = max(covered_end, r["start_word"] + r["n_words"] - 1)
        assert covered_end == n_words[doc], doc  # full coverage, exact end


def test_int8_quantization_reconstruction_bound(spark):
    """Dequantized codes sit within one quantization step of the original
    micro component: |v - (mn + (q+128)*span/255)| <= span/255 + 1."""
    q_rows = load_all()["emb_int8_quantize"].builder(spark, SF_DIR).collect()
    emb = load_table(spark, SF_DIR, "embeddings").collect()
    import math

    micro = {
        r["vec_id"]: [math.floor(x * 1e6) for x in r["embedding"]] for r in emb
    }
    dims = len(next(iter(micro.values())))
    mn = [min(v[p] for v in micro.values()) for p in range(dims)]
    mx = [max(v[p] for v in micro.values()) for p in range(dims)]
    assert len(q_rows) == len(micro) * dims
    for r in q_rows:
        v = micro[r["vec_id"]][r["pos"]]
        span = mx[r["pos"]] - mn[r["pos"]]
        assert -128 <= r["q"] <= 127
        if span == 0:
            assert r["q"] == 0
            continue
        deq = mn[r["pos"]] + (r["q"] + 128) * span / 255.0
        assert abs(v - deq) <= span / 255.0 + 1, (r, v, deq)


def test_quality_weighted_sample_null_scores_take_last_tier(spark):
    """NULL scores fall into the final catch-all tier (the oracle's ELSE
    arm) instead of being silently dropped — regression for the review
    fix; a rate-1.0 catch-all must keep every NULL-score row."""
    from procurement_data_pipeline_spark.llm_ops.curation import (
        quality_weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 0.9), (2, 0.6), (3, None), (4, 0.1)],
        "doc_id long, quality_score double",
    )
    kept_all = quality_weighted_sample(
        df, tiers=[(0.8, 1.0), (0.0, 1.0)]
    ).collect()
    assert {r["doc_id"] for r in kept_all} == {1, 2, 3, 4}  # NULL row kept
    kept_none = quality_weighted_sample(
        df, tiers=[(0.8, 1.0), (0.0, 0.0)]
    ).collect()
    assert {r["doc_id"] for r in kept_none} == {1}  # catch-all rate 0 drops


def test_chunking_matches_python_model(spark):
    """Model property: the chunk layout equals a direct Python computation
    of the stride-80/window-100 scheme for every document."""
    chunks = load_all()["docs_chunking"].builder(spark, SF_DIR).collect()
    from procurement_data_pipeline_spark.llm_ops.text import word_count

    n_words = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", word_count("text").alias("n"))
        .collect()
    }
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["start_word"], r["n_words"])
        for r in chunks
    }
    import math

    want = {}
    for doc, n in n_words.items():
        k = 1 if n <= 100 else 1 + math.ceil((n - 100) / 80)
        for i in range(k):
            start = 1 + 80 * i
            want[(doc, i)] = (start, min(n, 80 * i + 100) - 80 * i)
    assert got == want
