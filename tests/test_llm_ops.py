"""Tests for dedup / similarity / text-analysis operators (llm_ops)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from procurement_data_pipeline_spark.llm_ops.dedup import (
    dedup_exact,
    drop_exact_duplicates,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from procurement_data_pipeline_spark.llm_ops.similarity import (
    knn_bruteforce,
    label_centroids,
    lsh_ann,
)
from procurement_data_pipeline_spark.llm_ops.text import (
    fingerprint,
    lang_id,
    token_count,
    word_count,
)
from procurement_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "The  quick  Brown fox jumps over the lazy dog "),  # dup modulo norm
        (4, "the quick brown fox jumps over the sleepy dog"),  # near-dup
        (5, "completely different words appear here tonight"),
        (6, "der hund und die katze ist ein tier zu hause"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_groups_normalized_duplicates(spark, docs):
    out = {r.keep_doc_id: r.n_docs for r in dedup_exact(docs).collect()}
    assert out[1] == 3  # docs 1,2,3 collapse
    assert out[4] == 1 and out[5] == 1 and out[6] == 1


def test_drop_exact_duplicates_keeps_min_id(spark, docs):
    kept = {r.doc_id for r in drop_exact_duplicates(docs).collect()}
    assert kept == {1, 4, 5, 6}


def test_ngram_jaccard_near_dup(spark, docs):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, n=1, threshold=0.5).collect()
    }
    # 1,2,3 identical word sets → jaccard 1.0; 4 differs by one word of 8
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 3)] == 1.0
    assert math.isclose(pairs[(1, 4)], 7 / 9)
    assert (1, 5) not in pairs


def test_ppjoin_filters_lose_no_pairs_vs_bruteforce(spark):
    """Zero-miss gate for the PPJoin prefix + length + POSITION filters:
    on a seeded corpus dense with near-dups of varying lengths (including
    pairs whose Jaccard sits exactly at θ and pairs whose only shared
    prefix token is the LAST prefix slot — the position-filter boundary),
    the filtered candidate pipeline must return exactly the brute-force
    all-pairs result, values included."""
    import itertools
    import random

    rng = random.Random(7)
    vocab = [f"w{i:03d}" for i in range(120)]
    rows = []
    base = vocab[:40]
    for i in range(30):
        # overlapping mutations of a common base: many qualifying pairs
        words_i = list(base)
        for _ in range(rng.randrange(0, 12)):
            words_i[rng.randrange(len(words_i))] = rng.choice(vocab)
        rng.shuffle(words_i)
        rows.append((i, " ".join(words_i)))
    for i in range(30, 45):
        # disjoint tail of varying sizes: length-filter fodder
        k = rng.randrange(3, 60)
        rows.append((i, " ".join(rng.sample(vocab, k))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    theta = 0.5
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(df, n=1, threshold=theta).collect()
    }
    sets = {i: set(t.split()) for i, t in rows}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        j = inter / (len(sets[a]) + len(sets[b]) - inter)
        if j >= theta:
            want[(a, b)] = j
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=0, abs_tol=0), k


def test_ppjoin_filter_arithmetic_is_64bit_for_large_docs(spark):
    """Regression: the PPJoin length/position ppm filters multiplied int32
    sizes by ~1e6-2e6 literals, which under ANSI mode (default in Spark 4)
    raised ARITHMETIC_OVERFLOW for docs with ≳1,431 distinct shingles at
    θ=0.5 (≳2,147 for the length filter). Pin the arithmetic at 64-bit:
    a near-duplicate pair of ~2,500-distinct-word docs and a disjoint
    >4,300-word doc must produce exactly the expected pair, no error."""
    big = [f"tok{i:05d}" for i in range(2500)]
    near = big[:2400] + [f"alt{i:05d}" for i in range(100)]
    huge = [f"other{i:05d}" for i in range(4400)]
    rows = [(1, " ".join(big)), (2, " ".join(near)), (3, " ".join(huge))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(df, n=1, threshold=0.5).collect()
    }
    inter = 2400
    want = inter / (2500 + 2500 - inter)
    assert set(got) == {(1, 2)}
    assert math.isclose(got[(1, 2)], want, rel_tol=0, abs_tol=0)


def test_minhash_finds_planted_near_dups(spark, docs):
    got = {(r.doc_a, r.doc_b) for r in minhash_dedup_pairs(docs, n=1, threshold=0.7).collect()}
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert all(5 not in p and 6 not in p for p in got)


def test_short_docs_survive_ngram_ops(spark):
    """Regression: docs with fewer than n words used to crash the shingle
    build (sequence(0, size-n) steps DOWN to [0,-1] and slice throws).
    Short docs must contribute zero n-grams, matching the DuckDB oracle."""
    from procurement_data_pipeline_spark.llm_ops.text import word_ngrams

    rows = [
        (1, "word"),
        (2, ""),
        (3, "two words"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "the quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    grams = {
        r.doc_id: r.g
        for r in df.select("doc_id", word_ngrams("text", 3).alias("g")).collect()
    }
    assert grams[1] == [] and grams[2] == []
    assert grams[3] == []
    assert grams[4][0] == "the quick brown"

    # Default bigram minhash + trigram jaccard run end-to-end on the corpus.
    sigs = minhash_signatures(df, n=2, num_hashes=8).collect()
    assert {r.doc_id for r in sigs} == {3, 4, 5}  # <2-word docs: no shingles
    pairs = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(df, n=3, threshold=0.8).collect()
    }
    assert pairs == {(4, 5)}
    assert minhash_dedup_pairs(df, n=2, threshold=0.5).count() == 1


def test_minhash_signature_shape_and_determinism(spark, docs):
    s1 = minhash_signatures(docs, num_hashes=16).collect()
    s2 = minhash_signatures(docs, num_hashes=16).collect()
    assert {r.doc_id: r.sig for r in s1} == {r.doc_id: r.sig for r in s2}
    assert all(len(r.sig) == 16 for r in s1)
    sig = {r.doc_id: r.sig for r in s1}
    assert sig[1] == sig[2]  # identical content → identical signature


def test_simhash_similar_docs_low_hamming(spark, docs):
    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert sh[1] == sh[2]
    assert ham(sh[1], sh[4]) < ham(sh[1], sh[5])


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.0, 1.0, 0.0], 1),
        (3, [0.0, 0.95, 0.05], 1),
        (4, [-1.0, 0.0, 0.0], 2),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_knn_bruteforce_exact_neighbors(spark, vecs):
    out = knn_bruteforce(vecs, vecs.filter("vec_id = 0"), k=2)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.vec_id for r in rows] == [1, 2]  # cos: 0.994, 0.0, …, -1
    assert rows[0].score > 0.99
    assert rows[1].score == 0.0


def test_label_centroids_exact_mean(spark, vecs):
    got = {
        (r.label, r.pos): r.centroid for r in label_centroids(vecs).collect()
    }
    assert math.isclose(got[(0, 0)], 0.95, abs_tol=1e-5)
    assert math.isclose(got[(1, 1)], 0.975, abs_tol=1e-5)
    assert got[(2, 0)] == -1.0


def test_lsh_ann_recall_on_real_embeddings(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.vec_id)
        for r in knn_bruteforce(emb, queries, k=10, quantized=False).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in lsh_ann(emb, queries, k=10, nbits=6, tables=32).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"LSH recall collapsed: {recall}"
    # every approx hit must be a true corpus vector, ranked deterministically
    assert all(q != v for q, v in approx)


def test_text_functions(spark):
    df = spark.createDataFrame(
        [(1, "The cat and the dog! Sat."), (2, "der hund und die katze")],
        "id int, text string",
    )
    row = df.select(
        word_count("text").alias("wc"),
        token_count("text").alias("tc"),
        lang_id("text").alias("lang"),
        fingerprint("text").alias("fp"),
    ).collect()
    assert row[0].wc == 6
    assert row[0].tc == 8  # 6 words + '!' + '.'
    assert row[0].lang == "en"
    assert row[1].lang == "de"
    assert len(row[0].fp) == 32
    # fingerprint is normalization-invariant
    fp2 = df.select(fingerprint(F.lit("  the CAT and the dog!  sat. ")).alias("fp")).collect()
    assert fp2[0].fp == row[0].fp


def test_cosine_neardup_lsh_recall_vs_exact(spark, sf_dir):
    from procurement_data_pipeline_spark.llm_ops.similarity import (
        cosine_neardup_lsh,
        cosine_neardup_pairs,
    )
    from procurement_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.vec_a, r.vec_b) for r in cosine_neardup_pairs(emb, 0.3).collect()
    }
    approx = {
        (r.vec_a, r.vec_b) for r in cosine_neardup_lsh(emb, 0.3).collect()
    }
    assert exact, "fixture should contain near-dup pairs at θ=0.3"
    assert approx <= exact, "LSH variant must not emit false positives"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH near-dup recall collapsed: {recall}"


def test_ivf_ann_recall_vs_bruteforce(spark, sf_dir):
    from procurement_data_pipeline_spark.llm_ops.similarity import (
        ivf_ann,
        knn_bruteforce,
    )
    from procurement_data_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.vec_id)
        for r in knn_bruteforce(emb, queries, k=10, quantized=False).collect()
    }
    approx = {
        (r.query_id, r.vec_id) for r in ivf_ann(emb, queries, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"IVF recall collapsed: {recall}"


def test_connected_components_chain_and_clique(spark):
    from procurement_data_pipeline_spark.llm_ops.dedup import (
        connected_components,
    )

    # chain 1-2-3-4 (diameter 3, forces >1 propagation round),
    # triangle 10-11-12, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {
        r.id: r.component for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_clusters_singletons_are_canonical(spark):
    from procurement_data_pipeline_spark.llm_ops.dedup import dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (5, 6)], "doc_a long, doc_b long")
    rows = {r.doc_id: r for r in dedup_clusters(docs, pairs).collect()}
    assert rows[2].cluster_id == 1 and not rows[2].is_canonical
    assert rows[1].is_canonical
    assert rows[6].cluster_id == 5 and not rows[6].is_canonical
    # untouched docs are their own canonical cluster
    for d in (3, 4, 7):
        assert rows[d].cluster_id == d and rows[d].is_canonical


def test_profile_table_nulls_and_distincts(spark):
    from procurement_data_pipeline_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], "k int, v string"
    )
    got = {r.column: r for r in profile_table(df).collect()}
    assert got["k"].n_rows == 4
    assert got["k"].n_nulls == 1
    assert got["k"].n_distinct == 3
    assert (got["k"].min_value, got["k"].max_value) == ("1", "3")
    assert got["v"].n_nulls == 1
    assert got["v"].n_distinct == 2
    assert (got["v"].min_value, got["v"].max_value) == ("a", "b")


def test_pii_scrub_redacts_and_counts(spark):
    from procurement_data_pipeline_spark.llm_ops.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "contact john.doe+x@corp.example.com or +1 (555) 123-4567 now"),
            (2, "ssn-ish 123456789 twice 987654321111"),
            (3, "clean text with no identifiers"),
        ],
        "doc_id int, text string",
    )
    scrubbed, counts = pii_scrub("text")
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            scrubbed.alias("scrubbed"),
            *[c.alias(f"n_{k}") for k, c in counts.items()],
        ).collect()
    }
    assert "[EMAIL]" in rows[1].scrubbed and "@" not in rows[1].scrubbed
    assert "[PHONE]" in rows[1].scrubbed
    assert rows[1].n_email == 1 and rows[1].n_phone == 1
    # pattern precedence: the phone class absorbs bare digit runs, and the
    # already-redacted text must not double-count them as id_numbers
    assert rows[2].n_phone == 2 and rows[2].n_id_number == 0
    assert rows[2].scrubbed == "ssn-ish [PHONE] twice [PHONE]"
    assert rows[3].scrubbed == "clean text with no identifiers"
    assert rows[3].n_email == rows[3].n_phone == rows[3].n_id_number == 0

    # a patterns dict without the phone class classifies the same runs as ids
    scrub_ids, id_counts = pii_scrub(
        "text", {"id_number": r"[0-9]{9,}"}
    )
    only_ids = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            scrub_ids.alias("scrubbed"),
            id_counts["id_number"].alias("n_ids"),
        ).collect()
    }
    assert only_ids[2].n_ids == 2
    assert only_ids[2].scrubbed == "ssn-ish [ID_NUMBER] twice [ID_NUMBER]"


def test_simhash_neardup_finds_true_neardups(spark, sf_dir):
    from procurement_data_pipeline_spark.llm_ops.dedup import (
        ngram_jaccard_pairs,
        simhash_neardup_pairs,
    )
    from procurement_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    truth = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    }
    got = {
        (r.doc_a, r.doc_b) for r in simhash_neardup_pairs(docs).collect()
    }
    assert truth, "fixture must contain true near-dup pairs"
    # SimHash is a different similarity notion (token multiset, not
    # 3-gram sets); require substantial agreement, not identity.
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"simhash missed too many true near-dups: {recall}"
    # every reported pair is within the Hamming threshold by construction
    assert all(
        r.hamming <= 3 for r in simhash_neardup_pairs(docs).collect()
    )


def test_pq_ann_recall_and_compression(spark, sf_dir):
    """PQ-ADC top-k must substantially agree with brute force on the real
    embeddings, and codes must be M small ints (the 32x compression)."""
    from procurement_data_pipeline_spark.llm_ops.pq import (
        pq_ann,
        pq_encode,
        train_pq_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cb = train_pq_codebooks(emb, m=8, k=64, sample_size=1024)
    assert cb.shape == (8, 64, 8)  # dim 64 → 8 subspaces of 8

    enc = pq_encode(emb, cb)
    first = enc.first()
    assert len(first.code) == 8 and all(0 <= c < 64 for c in first.code)
    # deterministic encode
    assert enc.first().code == first.code

    exact = {
        (r.query_id, r.vec_id)
        for r in knn_bruteforce(emb, queries, k=10, quantized=False).collect()
    }
    approx_rows = pq_ann(enc, queries, cb, k=10).collect()
    approx = {(r.query_id, r.vec_id) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"PQ recall collapsed: {recall}"
    # ranks are 1..k per query, deterministic tie-break
    per_q = {}
    for r in approx_rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, 11)) for v in per_q.values())


def test_pq_reconstruction_quality(spark, sf_dir):
    from procurement_data_pipeline_spark.llm_ops.pq import (
        pq_reconstruction_cosine,
        train_pq_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = train_pq_codebooks(emb, m=8, k=64, sample_size=1024)
    stats = (
        pq_reconstruction_cosine(emb, cb)
        .agg(
            F.avg("recon_cosine").alias("mean"),
            F.min("recon_cosine").alias("lo"),
        )
        .first()
    )
    # 8×64 codebooks on 64-dim data should reconstruct well on average
    assert stats["mean"] > 0.8, stats
    assert stats["lo"] > 0.0, stats


def test_ivf_pq_recall_vs_bruteforce(spark, sf_dir):
    from procurement_data_pipeline_spark.llm_ops.pq import ivf_pq_ann

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.vec_id)
        for r in knn_bruteforce(emb, queries, k=10, quantized=False).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in ivf_pq_ann(
            emb, queries, k=10, nlist=16, nprobe=8, m=8, codebook_k=64
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF-PQ recall collapsed: {recall}"
    assert all(q != v for q, v in approx)


def test_ivf_pq_persisted_index_roundtrip(spark, sf_dir, tmp_path):
    """Build the index ONCE, persist to parquet, serve the search from the
    loaded index — results must match the in-memory build exactly (same
    seeds → same centroids/codebooks → same codes → same ADC scores)."""
    from procurement_data_pipeline_spark.llm_ops.pq import (
        build_ivf_pq_index,
        ivf_pq_search,
        load_ivf_pq_index,
        save_ivf_pq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    index, encoded = build_ivf_pq_index(emb, nlist=16, m=8, codebook_k=64)
    fresh = {
        (r.query_id, r.vec_id, r.rank)
        for r in ivf_pq_search(index, encoded, queries, k=10, nprobe=8).collect()
    }

    path = str(tmp_path / "ivfpq_index")
    save_ivf_pq_index(index, encoded, path)
    index2, encoded2 = load_ivf_pq_index(spark, path)
    assert np.allclose(index.centroids, index2.centroids)
    assert np.allclose(index.codebooks, index2.codebooks)
    served = {
        (r.query_id, r.vec_id, r.rank)
        for r in ivf_pq_search(index2, encoded2, queries, k=10, nprobe=8).collect()
    }
    assert served == fresh
    # The persisted layout is cell-partitioned so probes prune at the
    # storage layer — assert the partition dirs exist.
    assert any(p.name.startswith("_cell=") for p in (tmp_path / "ivfpq_index" / "codes").iterdir())


def test_ivf_pq_index_append_without_retrain(spark, sf_dir, tmp_path):
    """Incremental maintenance: build+persist on half the corpus, append
    the other half under the FROZEN codebooks — the loaded index then
    contains every code, the appended codes equal a fresh encode under
    the same codebooks, and an appended vector retrieves itself top-1."""
    from procurement_data_pipeline_spark.llm_ops.pq import (
        append_to_ivf_pq_index,
        build_ivf_pq_index,
        ivf_pq_search,
        load_ivf_pq_index,
        pq_encode,
        save_ivf_pq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    index, encoded = build_ivf_pq_index(first, nlist=16, m=8, codebook_k=64)
    path = str(tmp_path / "idx")
    save_ivf_pq_index(index, encoded, path)

    n_appended = append_to_ivf_pq_index(spark, path, second)
    assert n_appended == second.count()

    index2, encoded2 = load_ivf_pq_index(spark, path)
    assert encoded2.count() == emb.count()
    # Appended codes == a fresh encode of the second half under the SAME
    # (frozen) codebooks — no retraining happened.
    fresh = {
        (r.vec_id, tuple(r.code))
        for r in pq_encode(second, index.codebooks).collect()
    }
    stored = {
        (r.vec_id, tuple(r.code))
        for r in encoded2.join(
            second.select("vec_id"), "vec_id"
        ).select("vec_id", "code").collect()
    }
    assert stored == fresh
    # Appended vectors are immediately retrievable (the search excludes
    # the query's own id, so the check is membership in OTHER queries'
    # result sets): with half the corpus appended, first-half queries
    # must surface appended (odd-id) neighbors.
    probe = first.filter(F.col("vec_id") < 40)
    got = ivf_pq_search(index2, encoded2, probe, k=10, nprobe=16).collect()
    assert got
    returned_ids = {r.vec_id for r in got}
    assert any(v % 2 == 1 for v in returned_ids)
    # And appended vectors work as queries against the served index.
    got2 = ivf_pq_search(
        index2, encoded2, second.filter(F.col("vec_id") < 20), k=5, nprobe=16
    ).collect()
    assert len({r.query_id for r in got2}) == 10


def test_scoped_persist_releases_all_blocks(spark, sf_dir):
    """Shared-session hygiene: after a persist-heavy query materializes and
    the caller invokes release_cached(), the pinned-RDD count returns to its
    pre-query baseline (baseline-relative, because OTHER components in a
    shared session legitimately hold blocks — e.g. localCheckpoint RDDs from
    earlier tests awaiting ContextCleaner GC)."""
    from procurement_data_pipeline_spark.caching import release_cached
    from procurement_data_pipeline_spark.llm_ops.dedup import ngram_jaccard_pairs

    release_cached(blocking=True)  # drain any untracked leftovers of ours
    jsc = spark.sparkContext._jsc.sc()
    baseline = jsc.getPersistentRDDs().size()
    docs = load_table(spark, sf_dir, "documents")
    ngram_jaccard_pairs(docs, threshold=0.6).count()
    assert jsc.getPersistentRDDs().size() > baseline, "query should pin blocks"
    released = release_cached(blocking=True)
    assert released >= 2  # shingles + packed per-doc (df, w) arrays
    assert jsc.getPersistentRDDs().size() == baseline, (
        "blocks still pinned after release"
    )


def test_winnow_fingerprints_guarantee_and_edit_locality(spark):
    from procurement_data_pipeline_spark.llm_ops.dedup import winnow_neardup_pairs
    from procurement_data_pipeline_spark.llm_ops.text import winnow_fingerprints

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base),
        (2, "PREFIX INSERTED HERE " + base),       # shifted copy
        (3, base.replace("lazy", "hazy")),          # one local edit
        (4, "completely different content with no overlap whatsoever x"),
        (5, "tiny"),                                # shorter than k
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {
        r.doc_id: set(r.f)
        for r in df.select(
            "doc_id", winnow_fingerprints("text", k=8, w=4).alias("f")
        ).collect()
    }
    assert fps[5] == set()  # sub-k doc → empty
    # position robustness: a shifted copy keeps (almost) all fingerprints
    assert len(fps[1] & fps[2]) >= len(fps[1]) - 1 and len(fps[1]) > 3
    # edit locality: one word edit leaves most fingerprints shared
    assert len(fps[1] & fps[3]) >= len(fps[1]) // 2
    # unrelated docs share nothing
    assert not (fps[1] & fps[4])

    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_neardup_pairs(df, k=8, w=4, min_shared=2).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(4 in p or 5 in p for p in pairs)

    # determinism
    again = {
        r.doc_id: set(r.f)
        for r in df.select(
            "doc_id", winnow_fingerprints("text", k=8, w=4).alias("f")
        ).collect()
    }
    assert again == fps


def test_random_projection_preserves_geometry(spark, sf_dir):
    """JL contract: seed-determinism, unit outputs, and pairwise cosine
    preserved within the 1/sqrt(out_dim) regime on real embeddings."""
    from procurement_data_pipeline_spark.llm_ops.similarity import (
        cosine,
        random_projection,
    )

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 40)

    def pair_cosines(df):
        a = df.selectExpr("vec_id as ida", "embedding as va")
        b = df.selectExpr("vec_id as idb", "embedding as vb")
        return {
            (r["ida"], r["idb"]): r["cos"]
            for r in a.join(b, F.col("ida") < F.col("idb"))
            .select("ida", "idb", cosine(F.col("va"), F.col("vb")).alias("cos"))
            .collect()
        }

    proj = random_projection(emb, out_dim=16)
    again = random_projection(emb, out_dim=16)
    assert sorted(map(tuple, proj.collect())) == sorted(map(tuple, again.collect()))

    orig = pair_cosines(emb)
    low = pair_cosines(proj)
    assert set(orig) == set(low)
    # JL distortion at out_dim=16: cosine errors concentrate well inside
    # ~2/sqrt(16)=0.5; use mean + max guards rather than a per-pair bound.
    errs = sorted(abs(orig[k] - low[k]) for k in orig)
    assert sum(errs) / len(errs) < 0.2, sum(errs) / len(errs)
    p95 = errs[int(0.95 * len(errs))]
    assert p95 < 0.5, p95  # JL tail: bound the distribution, not the max
