"""Model-based contracts for the evaluation / economics / lexstats tier.

Each test checks a query against its MATHEMATICAL definition (Python
replay or algebraic identity) — independent evidence alongside the
DuckDB hash gate in tools/check_oracle.py.
"""

from __future__ import annotations

import math

import pytest

from procurement_data_pipeline_spark.registry import load_all


# ---------------------------------------------------------------------------
# evaluation


def test_prf_counts_reconcile_with_classifier(spark, sf_dir):
    """Σtp + Σfn over classes == number of classified queries, Σtp + Σfp
    likewise (every prediction lands in exactly one (true, pred) cell),
    and F1 equals the harmonic mean where P and R are defined."""
    reg = load_all()
    base = reg["emb_knn_classify"].builder(spark, sf_dir).collect()
    prf = reg["emb_knn_eval_prf"].builder(spark, sf_dir).collect()
    n_queries = len(base)
    assert sum(r["tp"] + r["fn"] for r in prf) == n_queries
    assert sum(r["tp"] + r["fp"] for r in prf) == n_queries
    for r in prf:
        if r["precision"] is not None and r["recall"] is not None:
            p, q = r["precision"], r["recall"]
            if p + q > 0:
                assert abs(r["f1"] - 2 * p * q / (p + q)) < 1e-12


def test_ndcg_bounds_and_perfect_rank_identity(spark, sf_dir):
    """NDCG ∈ [0, 1]; precision@k = rel_at_k / k; MRR consistent with
    having at least one relevant hit iff rel_at_k > 0 is not guaranteed
    (a hit may sit below a miss), but MRR > 0 implies rel_at_k > 0."""
    rows = load_all()["emb_retrieval_ndcg"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["ndcg"] is not None:
            assert -1e-12 <= r["ndcg"] <= 1.0 + 1e-12, r
        assert abs(r["precision_at_k"] - r["rel_at_k"] / 10.0) < 1e-12
        if r["mrr"] is not None:
            assert r["rel_at_k"] > 0
            assert 0.0 < r["mrr"] <= 1.0


def test_calibration_accuracy_is_exact_ratio(spark, sf_dir):
    reg = load_all()
    base = reg["emb_knn_classify"].builder(spark, sf_dir).collect()
    cal = reg["emb_knn_calibration"].builder(spark, sf_dir).collect()
    by_votes = {}
    for r in base:
        n, c = by_votes.get(r["votes"], (0, 0))
        by_votes[r["votes"]] = (n + 1, c + r["correct"])
    assert {r["votes"] for r in cal} == set(by_votes)
    for r in cal:
        n, c = by_votes[r["votes"]]
        assert r["n_queries"] == n
        assert r["accuracy"] == pytest.approx(c / n, abs=0)
        assert r["confidence"] == pytest.approx(r["votes"] / 5.0, abs=0)


def test_wilson_interval_brackets_p_hat(spark, sf_dir):
    rows = load_all()["events_conversion_wilson_ci"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ci_lo"] <= r["p_hat"] <= r["ci_hi"] <= 1.0
        assert r["p_hat"] == pytest.approx(r["s"] / r["n"], abs=0)


def test_permutation_pvalue_contract(spark, sf_dir):
    (r,) = load_all()["events_ab_permutation"].builder(spark, sf_dir).collect()
    assert 1 <= r["n_perms"] <= 64
    assert 0 <= r["n_extreme"] <= r["n_perms"]
    # add-one convention: p = (1 + extreme) / (perms + 1), never 0
    assert r["p_value"] == pytest.approx(
        (1 + r["n_extreme"]) / (r["n_perms"] + 1), abs=0
    )
    assert 0.0 < r["p_value"] <= 1.0


def test_mannwhitney_python_replay(spark, sf_dir):
    """Exact replay of the doubled-rank U statistic from the per-user
    relation the query itself derives from events."""
    from pyspark.sql import functions as F

    from procurement_data_pipeline_spark.queries.evaluation import _SPLIT
    from procurement_data_pipeline_spark.queries.experiment import _arm_col
    from procurement_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    vm = F.floor(F.col("value") * 1000000).cast("long")
    split = F.lit(_SPLIT).cast("timestamp")
    pu = (
        ev.groupBy("user_id")
        .agg(F.sum(F.when(F.col("ts") >= split, vm).otherwise(F.lit(0))).alias("y"))
        .select(_arm_col().alias("arm"), "y")
        .collect()
    )
    ys = sorted(r["y"] for r in pu)
    # doubled average rank per value: 2*min_rank + count - 1
    first = {}
    cnt = {}
    for i, y in enumerate(ys, start=1):
        first.setdefault(y, i)
        cnt[y] = cnt.get(y, 0) + 1
    s2_a = sum(2 * first[r["y"]] + cnt[r["y"]] - 1 for r in pu if r["arm"] == "A")
    n_a = sum(1 for r in pu if r["arm"] == "A")
    n_b = len(pu) - n_a
    (row,) = load_all()["events_ab_mannwhitney"].builder(spark, sf_dir).collect()
    assert (row["n_a"], row["n_b"]) == (n_a, n_b)
    assert row["u2_a"] == s2_a - n_a * (n_a + 1)
    assert 0 <= row["u2_a"] <= 2 * n_a * n_b  # U ∈ [0, n_a·n_b]


# ---------------------------------------------------------------------------
# economics


def test_gini_python_replay(spark, sf_dir):
    from pyspark.sql import functions as F

    from procurement_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    spends = sorted(
        r["c"]
        for r in li.groupBy("l_suppkey")
        .agg(F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("c"))
        .collect()
    )
    n = len(spends)
    sx = sum(spends)
    six = sum(i * x for i, x in enumerate(spends, start=1))
    expected = (2 * six - (n + 1) * sx) / (n * sx)
    (row,) = load_all()["supplier_spend_gini"].builder(spark, sf_dir).collect()
    assert row["n_suppliers"] == n
    assert row["gini"] == pytest.approx(expected, rel=1e-12)
    assert 0.0 <= row["gini"] < 1.0


def test_lorenz_is_convex_and_ends_at_one(spark, sf_dir):
    rows = sorted(
        load_all()["supplier_spend_lorenz"].builder(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert rows[-1]["cum_share"] == pytest.approx(1.0, abs=1e-12)
    shares = [r["decile_share"] for r in rows]
    # ascending-sorted deciles → shares non-decreasing (Lorenz convexity)
    assert all(a <= b + 1e-12 for a, b in zip(shares, shares[1:]))
    cums = [r["cum_share"] for r in rows]
    assert all(a <= b + 1e-15 for a, b in zip(cums, cums[1:]))


def test_elasticity_midpoint_identity(spark, sf_dir):
    """Spot-check the cleared-denominator form against the literal
    midpoint formula computed from the reported (q, p) columns."""
    rows = load_all()["part_price_elasticity"].builder(spark, sf_dir).collect()
    assert rows
    checked = 0
    for r in rows:
        if r["elasticity"] is None:
            continue
        q1, q2, p1, p2 = r["q1"], r["q2"], r["p1"], r["p2"]
        if abs(p2 - p1) < 1e-9:
            continue
        ref = ((q2 - q1) / (q2 + q1)) / ((p2 - p1) / (p2 + p1))
        assert r["elasticity"] == pytest.approx(ref, rel=1e-9)
        checked += 1
        if checked >= 25:
            break
    assert checked > 0


def test_capture_recapture_estimators(spark, sf_dir):
    (r,) = load_all()["events_capture_recapture"].builder(spark, sf_dir).collect()
    n1, n2, m = r["n_day1"], r["n_day2"], r["n_both"]
    assert m <= min(n1, n2)
    assert r["chapman"] == pytest.approx(
        (n1 + 1) * (n2 + 1) / (m + 1) - 1, rel=1e-12
    )
    if m > 0:
        assert r["lincoln_petersen"] == pytest.approx(n1 * n2 / m, rel=1e-12)
        # Chapman's +1 correction only ever shrinks the estimate
        assert r["chapman"] <= r["lincoln_petersen"] + 1e-9
        # both must be at least the users actually observed
        assert r["lincoln_petersen"] >= max(n1, n2) - 1e-9


def test_weekday_index_weighted_mean_is_one(spark, sf_dir):
    """Day-weighted average of the seasonality index is exactly 1 (the
    index is each weekday's mean over the global mean)."""
    rows = load_all()["orders_weekday_index"].builder(spark, sf_dir).collect()
    total_days = sum(r["n_days"] for r in rows)
    weighted = sum(r["n_days"] * r["seasonality_index"] for r in rows) / total_days
    assert weighted == pytest.approx(1.0, rel=1e-9)
    assert {r["weekday"] for r in rows} <= set(range(1, 8))


def test_pareto_share_monotone(spark, sf_dir):
    rows = sorted(
        load_all()["events_user_pareto_share"].builder(spark, sf_dir).collect(),
        key=lambda r: r["pct"],
    )
    assert [r["pct"] for r in rows] == [1, 5, 10, 25]
    shares = [r["value_share"] for r in rows]
    counts = [r["n_top_users"] for r in rows]
    assert all(a <= b for a, b in zip(counts, counts[1:]))
    assert all(a <= b + 1e-12 for a, b in zip(shares, shares[1:]))
    # the top 25% of users (ranked by value) hold at least 25% of value
    assert shares[-1] >= 0.25 - 1e-12
    for r in rows:
        assert 0.0 <= r["value_share"] <= 1.0 + 1e-12


# ---------------------------------------------------------------------------
# featurestats / lexstats


def test_burstiness_moments_replay(spark, sf_dir):
    from pyspark.sql import functions as F

    from procurement_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.groupBy("event_type", "user_id", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    by_type: dict[str, list[int]] = {}
    for r in cells:
        by_type.setdefault(r["event_type"], []).append(r["x"])
    rows = load_all()["events_user_burstiness"].builder(spark, sf_dir).collect()
    for r in rows:
        xs = by_type[r["event_type"]]
        n = len(xs)
        assert r["n_cells"] == n
        mean = sum(xs) / n
        assert r["mean_count"] == pytest.approx(mean, rel=1e-12)
        if n > 1:
            var = (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1))
            assert r["fano"] == pytest.approx(var / mean, rel=1e-9)


def test_gini_impurity_bounds(spark, sf_dir):
    rows = load_all()["events_type_gini_impurity"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        k = r["n_types"]
        # impurity ∈ [0, 1 − 1/k] with the max at the uniform mix
        assert -1e-12 <= r["gini_impurity"] <= 1 - 1 / k + 1e-12


def test_hampel_python_replay(spark, sf_dir):
    """Replay the rolling median/MAD filter for one event type."""
    from pyspark.sql import functions as F

    from procurement_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    vs = (
        ev.where(F.col("event_type") == "purchase")
        .select("event_id", "ts", F.floor(F.col("value") * 1000000).cast("long").alias("vm"))
        .orderBy("ts", "event_id")
        .collect()
    )
    flagged = set()
    win = []
    for r in vs:
        win.append(r["vm"])
        if len(win) > 7:
            win.pop(0)
        if len(win) == 7:
            s = sorted(win)
            med = s[3]
            mad = sorted(abs(x - med) for x in win)[3]
            if abs(r["vm"] - med) > 3 * mad:
                flagged.add(r["event_id"])
    got = {
        r["event_id"]
        for r in load_all()["events_value_hampel"].builder(spark, sf_dir).collect()
        if r["event_type"] == "purchase"
    }
    assert got == flagged


def test_quantile_normalize_is_uniform_per_dim(spark, sf_dir):
    rows = load_all()["emb_quantile_normalize"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["qn"] < 1.0


def test_zipf_rank_one_is_reference(spark, sf_dir):
    rows = sorted(
        load_all()["docs_zipf_deviation"].builder(spark, sf_dir).collect(),
        key=lambda r: r["rank"],
    )
    assert rows[0]["zipf_deviation"] == 0
    assert rows[0]["zipf_ratio"] == pytest.approx(1.0, abs=0)
    assert all(r["zipf_ratio"] > 0 for r in rows)


def test_readability_cli_formula(spark, sf_dir):
    """Replay the CLI formula on one handcrafted document."""
    import re

    from procurement_data_pipeline_spark.queries.lexstats import (
        _CLI_C,
        _CLI_L,
        _CLI_S,
    )

    text = "The quick brown fox jumps. It runs far! Does it rest?"
    norm = re.sub(r"\s+", " ", text).strip().lower()
    letters = len(re.sub(r"[^a-z]", "", norm))
    n_words = len(norm.split(" "))
    sentences = max(len(re.sub(r"[^.!?]", "", text)), 1)
    expected = (
        _CLI_L * (100.0 * letters / n_words)
        - _CLI_S * (100.0 * sentences / n_words)
        - _CLI_C
    )
    # CLI for simple short sentences should be a small single-digit grade
    assert -5 < expected < 10
    assert math.isfinite(expected)


def test_lexical_diversity_bounds(spark, sf_dir):
    rows = load_all()["docs_lexical_diversity"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_hapax"] <= r["n_types"] <= r["n_tokens"]
        assert r["ttr"] == pytest.approx(r["n_types"] / r["n_tokens"], abs=0)
        assert r["hapax_share"] == pytest.approx(r["n_hapax"] / r["n_types"], abs=0)


def test_dim_correlation_range_and_keys(spark, sf_dir):
    rows = load_all()["emb_dim_correlation"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["dim_i"] < r["dim_j"] <= 64
        assert -1.0 - 1e-9 <= r["r"] <= 1.0 + 1e-9
    # returned in descending |r| order
    absr = [abs(r["r"]) for r in rows]
    assert all(a >= b - 1e-15 for a, b in zip(absr, absr[1:]))


def test_nelson_aalen_vs_kaplan_meier(spark, sf_dir):
    """H(t) is non-decreasing, and exp(−H) ≥ KM survival pointwise (the
    standard inequality: 1 − x ≤ e^(−x) per factor)."""
    reg = load_all()
    na = {
        (r["priority"], r["week"]): r
        for r in reg["orders_nelson_aalen"].builder(spark, sf_dir).collect()
    }
    km = {
        (r["priority"], r["week"]): r
        for r in reg["orders_kaplan_meier"].builder(spark, sf_dir).collect()
    }
    assert set(na) == set(km)
    by_priority: dict[str, list] = {}
    for (p, w), r in na.items():
        by_priority.setdefault(p, []).append((w, r["cum_hazard"]))
    for p, seq in by_priority.items():
        seq.sort()
        hs = [h for _, h in seq]
        assert all(a <= b + 1e-15 for a, b in zip(hs, hs[1:]))
    for key, r in na.items():
        assert math.exp(-r["cum_hazard"]) >= km[key]["survival"] - 1e-12
        assert r["var_breslow"] >= 0


# ---------------------------------------------------------------------------
# batch 6: AUC / silhouette / runs / ACF / crossdup


def test_auc_python_replay(spark, sf_dir):
    """AUC must equal the tie-aware pair-counting definition computed in
    plain Python over the classifier's own output."""
    reg = load_all()
    base = reg["emb_knn_classify"].builder(spark, sf_dir).collect()
    pos = [r["votes"] for r in base if r["correct"] == 1]
    neg = [r["votes"] for r in base if r["correct"] == 0]
    (row,) = reg["emb_knn_auc"].builder(spark, sf_dir).collect()
    assert (row["n_pos"], row["n_neg"]) == (len(pos), len(neg))
    if pos and neg:
        wins = sum(1 for p in pos for q in neg if p > q)
        ties = sum(1 for p in pos for q in neg if p == q)
        expected = (wins + 0.5 * ties) / (len(pos) * len(neg))
        assert row["auc"] == pytest.approx(expected, rel=1e-12)
        assert 0.0 <= row["auc"] <= 1.0


def test_silhouette_range_and_assignment_consistency(spark, sf_dir):
    reg = load_all()
    sil = reg["emb_kmeans_silhouette"].builder(spark, sf_dir).collect()
    asg = {
        r["vec_id"]: r["cluster"]
        for r in reg["emb_kmeans"].builder(spark, sf_dir).collect()
    }
    assert sil
    for r in sil:
        assert r["cluster"] == asg[r["vec_id"]]
        assert -1.0 - 1e-12 <= r["silhouette"] <= 1.0 + 1e-12
        assert r["a_dist"] >= 0 and r["b_dist"] >= 0


def test_runs_test_python_replay(spark, sf_dir):
    from pyspark.sql import functions as F

    from procurement_data_pipeline_spark.queries.featurestats import (
        _RUNS_THRESHOLD,
    )
    from procurement_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    seq = [
        1 if r["value"] >= _RUNS_THRESHOLD else 0
        for r in ev.where(F.col("event_type") == "view")
        .select("value", "ts", "event_id")
        .orderBy("ts", "event_id")
        .collect()
    ]
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    row = next(
        r
        for r in load_all()["events_value_runs_test"].builder(spark, sf_dir).collect()
        if r["event_type"] == "view"
    )
    assert row["runs"] == runs
    assert row["n1"] == sum(seq)
    assert row["n0"] == len(seq) - sum(seq)


def test_acf_bounds(spark, sf_dir):
    rows = load_all()["orders_revenue_acf"].builder(spark, sf_dir).collect()
    assert {r["lag"] for r in rows} == set(range(1, 8))
    for r in rows:
        assert r["n_pairs"] > 0
        if r["acf"] is not None:
            assert -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9


def test_crossdup_matrix_conserves_pairs(spark, sf_dir):
    reg = load_all()
    pairs = reg["docs_ngram_jaccard_pairs"].builder(spark, sf_dir).collect()
    mat = reg["docs_crossdup_matrix"].builder(spark, sf_dir).collect()
    assert sum(r["n_pairs"] for r in mat) == len(pairs)
    for r in mat:
        assert r["source_a"] <= r["source_b"]
        assert 0.0 <= r["min_jaccard"] <= r["max_jaccard"] <= 1.0


# ---------------------------------------------------------------------------
# batch 7: centroid drift / stickiness / power


def test_centroid_drift_python_replay(spark, sf_dir):
    from collections import defaultdict

    from procurement_data_pipeline_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "embeddings").collect()
    sums = defaultdict(lambda: [[0] * 64, [0] * 64])
    counts = defaultdict(lambda: [0, 0])
    for r in rows:
        h = r["vec_id"] % 2
        counts[r["label"]][h] += 1
        for i, x in enumerate(r["embedding"]):
            sums[r["label"]][h][i] += math.floor(float(x) * 1000000)
    got = {
        r["label"]: r
        for r in load_all()["emb_label_centroid_drift"].builder(spark, sf_dir).collect()
    }
    for label, (n0, n1) in counts.items():
        if n0 == 0 or n1 == 0:
            assert label not in got
            continue
        s0, s1 = sums[label]
        d2 = sum(((a * n1 - b * n0) / (n0 * n1)) ** 2 for a, b in zip(s0, s1))
        r = got[label]
        assert (r["n_even"], r["n_odd"]) == (n0, n1)
        assert r["centroid_drift"] == pytest.approx(
            math.sqrt(d2) / 1e6, rel=1e-9
        )


def test_stickiness_bounds_and_dau_wau_order(spark, sf_dir):
    rows = load_all()["events_stickiness_dau_wau"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["dau"] <= r["wau"]
        assert 0.0 < r["stickiness"] <= 1.0
        assert r["stickiness"] == pytest.approx(r["dau"] / r["wau"], abs=0)


def test_power_formula_replay(spark, sf_dir):
    from procurement_data_pipeline_spark.queries.evaluation import _POWER_C

    (r,) = load_all()["events_ab_power"].builder(spark, sf_dir).collect()
    # var and mean are reported in squared/base units; the formula is
    # scale-invariant so it must reproduce from the reported columns
    expected = r["var_post"] * _POWER_C / (r["mean_post"] * r["mean_post"])
    assert r["needed_per_arm"] == pytest.approx(expected, rel=1e-9)
    assert r["needed_per_arm_ceil"] == math.ceil(r["needed_per_arm"])
    assert r["needed_per_arm"] > 0


# ---------------------------------------------------------------------------
# batch 8: langid eval / two-NN


def test_langid_confusion_conserves_docs(spark, sf_dir):
    reg = load_all()
    base = reg["docs_lang_id"].builder(spark, sf_dir).collect()
    mat = reg["docs_langid_confusion"].builder(spark, sf_dir).collect()
    assert sum(r["n"] for r in mat) == len(base)
    from collections import Counter

    rows = Counter(r["labeled_lang"] for r in base)
    for r in mat:
        assert r["row_share"] == pytest.approx(
            r["n"] / rows[r["labeled_lang"]], abs=0
        )


def test_kappa_python_replay(spark, sf_dir):
    from collections import Counter

    reg = load_all()
    base = reg["docs_lang_id"].builder(spark, sf_dir).collect()
    n = len(base)
    agree = sum(1 for r in base if r["labeled_lang"] == r["detected_lang"])
    rows = Counter(r["labeled_lang"] for r in base)
    cols = Counter(r["detected_lang"] for r in base)
    chance_w = sum(rows[k] * cols.get(k, 0) for k in rows)
    (row,) = reg["docs_langid_kappa"].builder(spark, sf_dir).collect()
    assert (row["n_docs"], row["n_agree"]) == (n, agree)
    assert row["p_observed"] == pytest.approx(agree / n, abs=0)
    assert row["p_chance"] == pytest.approx(chance_w / (n * n), rel=1e-15)
    expected = (n * agree - chance_w) / (n * n - chance_w)
    assert row["kappa"] == pytest.approx(expected, rel=1e-12)
    assert row["kappa"] <= 1.0


def test_twonn_mu_contract(spark, sf_dir):
    """d₁ ≤ d₂ by rank construction, μ² ≥ 1, and the top-2 distances
    replay exactly from a brute-force Python scan for one query."""
    rows = load_all()["emb_twonn_mu"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["d2_1"] <= r["d2_2"]
        if r["mu_sq"] is not None:
            assert r["mu_sq"] >= 1.0
    import math as _m

    from procurement_data_pipeline_spark.sources.tables import load_table

    emb = {
        e["vec_id"]: [_m.floor(float(x) * 1000000) for x in e["embedding"]]
        for e in load_table(spark, sf_dir, "embeddings").collect()
    }
    qid = rows[0]["query_id"]
    qv = emb[qid]
    d2s = sorted(
        sum((a - b) ** 2 for a, b in zip(qv, v, strict=True))
        for k, v in emb.items()
        if k != qid
    )
    got = next(r for r in rows if r["query_id"] == qid)
    assert (got["d2_1"], got["d2_2"]) == (d2s[0], d2s[1])


# ---------------------------------------------------------------------------
# batch 9: KS / word burstiness / Spearman / assortativity


def test_ks_python_replay(spark, sf_dir):
    from pyspark.sql import functions as F

    from procurement_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rows = docs.where(F.col("source").isin(["src0", "src1"])).select(
        "source", "n_chars"
    ).collect()
    xa = sorted(r["n_chars"] for r in rows if r["source"] == "src0")
    xb = sorted(r["n_chars"] for r in rows if r["source"] == "src1")
    grid = sorted(set(xa) | set(xb))
    import bisect

    d_scaled = max(
        abs(bisect.bisect_right(xa, x) * len(xb) - bisect.bisect_right(xb, x) * len(xa))
        for x in grid
    )
    (row,) = load_all()["docs_ks_lengths"].builder(spark, sf_dir).collect()
    assert (row["n1"], row["n2"]) == (len(xa), len(xb))
    assert row["d_scaled"] == d_scaled
    assert 0.0 <= row["d_stat"] <= 1.0


def test_word_burstiness_fano_definition(spark, sf_dir):
    rows = load_all()["docs_word_burstiness"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["df"] >= 20
        assert r["total_n"] >= r["df"]
        assert r["fano"] >= 0
    fanos = [r["fano"] for r in rows]
    assert all(a >= b - 1e-15 for a, b in zip(fanos, fanos[1:]))


def test_spearman_python_replay(spark, sf_dir):
    import math as _m

    from pyspark.sql import functions as F

    from procurement_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    pp = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("rev"),
            F.sum(F.floor(F.col("l_quantity")).cast("long")).alias("qty"),
        )
        .collect()
    )

    def ranks2(vals):
        s = sorted(vals)
        first, cnt = {}, {}
        for i, v in enumerate(s, start=1):
            first.setdefault(v, i)
            cnt[v] = cnt.get(v, 0) + 1
        return [2 * first[v] + cnt[v] - 1 for v in vals]

    rx = ranks2([r["rev"] for r in pp])
    ry = ranks2([r["qty"] for r in pp])
    n = len(pp)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    expected = (n * sxy - sx * sy) / (
        _m.sqrt(n * sxx - sx * sx) * _m.sqrt(n * syy - sy * sy)
    )
    (row,) = load_all()["part_price_qty_spearman"].builder(spark, sf_dir).collect()
    assert row["n_parts"] == n
    assert row["spearman_rho"] == pytest.approx(expected, rel=1e-12)
    assert -1.0 <= row["spearman_rho"] <= 1.0


def test_assortativity_range(spark, sf_dir):
    (row,) = load_all()["part_graph_assortativity"].builder(spark, sf_dir).collect()
    assert row["n_edges"] > 0
    if row["assortativity"] is not None:
        assert -1.0 - 1e-9 <= row["assortativity"] <= 1.0 + 1e-9


# ---------------------------------------------------------------------------
# batch 10: changepoint / QTE / multi-sourcing


def test_changepoint_python_replay(spark, sf_dir):
    from collections import defaultdict

    from pyspark.sql import functions as F

    from procurement_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.floor(F.col("value") * 1000000).cast("long")).alias("vm"))
        .collect()
    )
    series = defaultdict(list)
    for r in daily:
        series[r["event_type"]].append((r["day"], r["vm"]))
    got = {
        r["event_type"]: r
        for r in load_all()["events_value_changepoint"].builder(spark, sf_dir).collect()
    }
    for et, pts in series.items():
        pts.sort()
        vals = [v for _, v in pts]
        total, d = sum(vals), len(vals)
        best, s1 = None, 0
        for i in range(1, d):
            s1 += vals[i - 1]
            score = float(s1) * s1 / i + float(total - s1) * (total - s1) / (d - i)
            if best is None or score > best[0]:
                best = (score, pts[i - 1][0], i)
        r = got[et]
        assert (r["split_day"], r["n_left"]) == (best[1], best[2])
        assert r["n_left"] + r["n_right"] == d


def test_qte_order_statistics(spark, sf_dir):
    rows = sorted(
        load_all()["events_ab_qte"].builder(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 10))
    # per-arm decile values must be non-decreasing in the decile
    for col in ("y_a", "y_b"):
        vs = [r[col] for r in rows]
        assert all(a <= b + 1e-12 for a, b in zip(vs, vs[1:]))
    for r in rows:
        assert r["qte"] == pytest.approx(r["y_a"] - r["y_b"], abs=1e-9)


def test_multi_sourcing_conserves_parts(spark, sf_dir):
    from pyspark.sql import functions as F

    from procurement_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    rows = load_all()["part_multi_sourcing"].builder(spark, sf_dir).collect()
    assert sum(r["n_parts"] for r in rows) == n_parts
    assert sum(r["part_share"] for r in rows) == pytest.approx(1.0, rel=1e-12)
    for r in rows:
        if r["sourcing"] == "single":
            assert r["min_suppliers"] == r["max_suppliers"] == 1
        if r["sourcing"] == "dual":
            assert r["min_suppliers"] == r["max_suppliers"] == 2
        if r["sourcing"] == "multi":
            assert r["min_suppliers"] >= 3


# ---------------------------------------------------------------------------
# batch 11: DiD / SRM / load factor


def test_did_is_delta_of_deltas(spark, sf_dir):
    (r,) = load_all()["events_ab_did"].builder(spark, sf_dir).collect()
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert r["did"] == pytest.approx(r["delta_a"] - r["delta_b"], abs=1e-9)


def test_srm_python_replay(spark, sf_dir):
    from pyspark.sql import functions as F

    from procurement_data_pipeline_spark.queries.experiment import _arm_col
    from procurement_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    arms = [
        r["arm"]
        for r in ev.select("user_id").distinct().select(_arm_col().alias("arm")).collect()
    ]
    n_a = sum(1 for a in arms if a == "A")
    n_b = len(arms) - n_a
    (row,) = load_all()["events_ab_srm"].builder(spark, sf_dir).collect()
    assert (row["n_a"], row["n_b"]) == (n_a, n_b)
    assert row["chi2"] == pytest.approx((n_a - n_b) ** 2 / (n_a + n_b), rel=1e-12)
    assert row["srm_flag"] == (1 if row["chi2"] > 3.841458820694124 else 0)
    # the md5 split is a fair coin: a flagged SRM here would mean the
    # portable-hash assignment itself is broken
    assert row["srm_flag"] == 0


def test_load_factor_bounds(spark, sf_dir):
    rows = load_all()["events_load_factor_daily"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_hours"] <= 24
        assert r["peak_hour_events"] * r["n_hours"] >= r["n_events"]
        assert r["load_factor"] >= 1.0 - 1e-12
        assert r["load_factor"] == pytest.approx(
            r["peak_hour_events"] * r["n_hours"] / r["n_events"], rel=1e-12
        )


# ---------------------------------------------------------------------------
# batch 12: log-rank / BPE surfacing


def test_logrank_python_replay(spark, sf_dir):
    """Replay O/E/V from the same lifetime relation the query derives."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from procurement_data_pipeline_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lt = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("sd"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("o_orderpriority").isin(["1-URGENT", "5-LOW"]))
        .select(
            (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("g1"),
            F.datediff(F.col("sd").cast("date"), F.col("o_orderdate").cast("date")).alias("t"),
        )
        .collect()
    )
    per_week = defaultdict(lambda: [0, 0, 0, 0])  # d1, d, l1, l
    for r in lt:
        t = min(max(r["t"], 0), 120)
        week = t // 7
        ev = 1 if r["t"] <= 120 else 0
        c = per_week[week]
        c[0] += ev if r["g1"] else 0
        c[1] += ev
        c[2] += r["g1"]
        c[3] += 1
    weeks = sorted(per_week)
    tot1 = sum(per_week[w][2] for w in weeks)
    tot = sum(per_week[w][3] for w in weeks)
    o1 = e1 = v = 0.0
    left1, left = 0, 0
    for w in weeks:
        d1, d, l1, l = per_week[w]
        n1, n = tot1 - left1, tot - left
        if d > 0:
            o1 += d1
            e1 += d * n1 / n
            if n > 1:
                v += d * (n1 / n) * (1 - n1 / n) * ((n - d) / (n - 1))
        left1 += l1
        left += l
    (row,) = load_all()["orders_logrank"].builder(spark, sf_dir).collect()
    assert row["o1"] == int(o1)
    assert row["e1"] == pytest.approx(e1, rel=1e-9)
    assert row["var_lr"] == pytest.approx(v, rel=1e-9)
    assert row["z"] == pytest.approx((o1 - e1) / v**0.5, rel=1e-9)


def test_bpe_vocab_query_shape(spark, sf_dir):
    rows = load_all()["docs_bpe_vocab"].builder(spark, sf_dir).collect()
    assert rows
    ranks = [r["merge_rank"] for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["merged_token"] == r["left"] + r["right"]
        assert r["total_tokens"] <= r["total_words"] * 40  # sane segmentation
        assert r["total_tokens"] >= r["total_words"]  # >= one token per word


# ---------------------------------------------------------------------------
# batch 13: customer growth analytics


def test_first_value_repeat_conserves_customers(spark, sf_dir):
    from pyspark.sql import functions as F

    from procurement_data_pipeline_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    rows = load_all()["customer_first_value_repeat"].builder(spark, sf_dir).collect()
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert {r["decile"] for r in rows} == set(range(1, 11))
    # avg_first_value must be non-decreasing in the decile (ranked ASC)
    by_decile = sorted(rows, key=lambda r: r["decile"])
    vals = [r["avg_first_value"] for r in by_decile]
    assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:]))
    for r in rows:
        assert 0.0 <= r["repeat_share"] <= 1.0
        assert r["avg_orders"] >= 1.0


def test_time_to_nth_monotone(spark, sf_dir):
    rows = sorted(
        load_all()["events_time_to_nth"].builder(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 10))
    hs = [r["hours_to_nth"] for r in rows]
    assert all(h >= 0 for h in hs)
    assert all(a <= b + 1e-9 for a, b in zip(hs, hs[1:]))


def test_value_migration_conserves_customers(spark, sf_dir):
    from pyspark.sql import functions as F

    from procurement_data_pipeline_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    rows = load_all()["customer_value_migration"].builder(spark, sf_dir).collect()
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, rel=1e-12)
    segs = {"low", "mid", "high", "absent"}
    for r in rows:
        assert r["seg1"] in segs and r["seg2"] in segs


# ---------------------------------------------------------------------------
# batch 14: growth accounting / return rates


def test_growth_accounting_identities(spark, sf_dir):
    """dau = new + retained + resurrected on every day, and yesterday's
    dau = today's retained + today's churned (the self-auditing identity
    of the decomposition)."""
    rows = sorted(
        load_all()["events_growth_accounting"].builder(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    by_day = {r["day"]: r for r in rows}
    for r in rows:
        assert r["dau"] == r["new_users"] + r["retained"] + r["resurrected"]
    for prev, cur in zip(rows, rows[1:]):
        if (cur["day"] - prev["day"]).days == 1:
            assert prev["dau"] == cur["retained"] + cur["churned"], (
                prev,
                cur,
            )
    # first day is all-new
    assert rows[0]["retained"] == 0 and rows[0]["resurrected"] == 0
    assert rows[0]["dau"] == rows[0]["new_users"]


def test_brand_return_rate_bounds(spark, sf_dir):
    rows = load_all()["part_brand_return_rate"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_returned"] <= r["n_lines"]
        assert 0.0 <= r["qty_return_share"] <= 1.0
        assert 0.0 <= r["revenue_return_share"] <= 1.0


# ---------------------------------------------------------------------------
# batch 15: dedup savings / p-chart


def test_dedup_savings_reconciles_with_dedup_exact(spark, sf_dir):
    reg = load_all()
    fp_groups = reg["docs_dedup_exact"].builder(spark, sf_dir).collect()
    dropped_total = sum(r["n_docs"] - 1 for r in fp_groups)
    rows = reg["docs_dedup_savings"].builder(spark, sf_dir).collect()
    assert sum(r["n_dropped"] for r in rows) == dropped_total
    for r in rows:
        assert 0 <= r["n_dropped"] < r["n_docs"] or (
            r["n_dropped"] == 0 and r["n_docs"] >= 0
        )
        assert 0 <= r["tokens_saved"] <= r["total_tokens"]
        assert r["token_savings_share"] == pytest.approx(
            r["tokens_saved"] / r["total_tokens"], rel=1e-12
        )


def test_pchart_limits_bracket_center(spark, sf_dir):
    rows = load_all()["events_error_pchart"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["lcl"] <= r["pbar"] <= r["ucl"]
        assert r["p_day"] == pytest.approx(r["errs"] / r["n"], abs=0)
        expect_flag = 1 if (r["p_day"] > r["ucl"] or r["p_day"] < r["lcl"]) else 0
        assert r["out_of_control"] == expect_flag
