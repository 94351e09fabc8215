"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR.

Output contract (the driver captures only the LAST 2000 characters of
stdout and parses the final line as JSON — round 5's single fat line
overflowed that window and shipped no parsed bench number):

* FINAL stdout line: a COMPACT JSON object — headline metric, per-query
  mins, sf, and a fixed-cost calibration time — guaranteed well under the
  driver's tail capture.
* everything else (extended tier, raw per-pass spreads, errors) goes to
  the sidecar file ``BENCH_EXTENDED.json`` next to this script and to an
  EARLIER stdout line, so the full evidence stays auditable without ever
  crowding the parsed line.

The headline set (specs registered with bench=True) is FROZEN for
round-over-round comparability — "value" always means the same 19 queries.
The curation/sketch/ANN tier is timed separately under "extended" so new
operators get performance evidence without moving the headline metric.

``calibration_sec`` times a fixed CPU-bound query (a seeded in-memory
range-aggregate, no IO, constant size regardless of sf) with the same
min-of-3 estimator. The container shares cores with other tenants; a
round where every query AND the calibration row shift together is ambient
load, while a query that moves against a flat calibration row is a real
regression — the separation round 5 could not make.

Each query is built lazily and executed via a count-style full materialization
(``df.write.format("noop")`` — runs the whole plan, no driver collect cost,
no disk write), which is the fair analogue of the reference pushing results
into a warehouse table.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from procurement_data_pipeline_spark.caching import release_cached
from procurement_data_pipeline_spark.registry import load_all
from procurement_data_pipeline_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    specs = load_all()
    bench_specs = {n: s for n, s in sorted(specs.items()) if s.bench}
    # Non-headline tier timed under "extended" (names, not a bench flag, so
    # the headline membership cannot drift by accident). Every name must be
    # a declared query; unknown names report as errors rather than KeyError.
    extended_names = [
        "docs_corpus_mix",
        "docs_decontaminate",
        "docs_pack_sequences",
        "docs_repetition_metrics",
        "docs_vocab_topk",
        "docs_vocab_topk_sketch",
        "emb_random_projection",
        "events_value_quantiles_approx",
        "docs_cluster_safe_split",
        # Round-5 continuation tier:
        "docs_tfidf_topterms",
        "emb_kmeans",
        "emb_semantic_decontaminate",
        "events_user_state_scd2",
        "events_user_state_cdc",
        "events_value_zscore_outliers",
        "events_rolling_distinct_users",
        "events_rolling_distinct_users_hll",
        "events_distinct_users_hll",
        "docs_corpus_mix_temperature",
        # Third-session tier (one representative per operator family):
        "events_cusum_drift",
        "part_affinity_rules",
        "part_hierarchy_rollup",
        "part_fifo_consumption",
        "customer_rfm",
        "emb_pca_power",
        "docs_dup_ngram_coverage",
        "events_position_attribution",
        "orders_fiscal_445_rollup",
        # Fourth-session tier (runtime filtering, sketches, experiments):
        "lineitem_bloom_pruned_revenue",
        "events_kmv_type_overlap",
        "events_ab_cuped",
        "events_value_bootstrap_ci",
        "orders_kaplan_meier",
        "orders_forecast_backtest",
        "events_ab_welch",
        # Fifth-session tier (replenishment, bitmaps, smoothing):
        "part_eoq",
        "part_croston_forecast",
        "part_demand_classes",
        "orders_holt_trend",
        "events_segment_bitmap_overlap",
        "events_retention_bitmap",
        "part_copurchase_bfs",
        "emb_mmr_rerank",
        "orders_mann_kendall",
        "part_price_index_brand",
        "part_abc_xyz_matrix",
        "orders_ar_aging",
        "emb_minmax_scale",
        # Sixth-session tier (advanced time series / statistics):
        "orders_prorated_daily_revenue",
        "orders_theil_sen",
        "orders_ship_leadlag",
        "events_anova_by_type",
        "orders_holt_winters",
        "nation_supplier_hhi",
        "events_markov_transitions",
        "events_session_paths",
        "part_lot_sizing_ww",
        "docs_interleaved_shuffle",
        "events_neyman_sample",
        "events_value_twap",
        # Seventh-session tier (evaluation, economics, lexical stats):
        "emb_retrieval_ndcg",
        "events_ab_permutation",
        "supplier_spend_gini",
        "part_price_elasticity",
        "emb_dim_correlation",
        "docs_lexical_diversity",
        "events_user_pareto_share",
        "events_value_hampel",
        "events_ab_mannwhitney",
        "emb_kmeans_silhouette",
        "orders_revenue_acf",
        "emb_label_centroid_drift",
        "events_stickiness_dau_wau",
        # Eighth-session tier (sourcing, survival, load-shape, separation):
        "part_purchase_price_variance",
        "part_bullwhip_ratio",
        "brand_maverick_spend",
        "part_kraljic_matrix",
        "orders_rmst",
        "orders_competing_risks",
        "events_mcnemar_conversion",
        "events_dft_daily_power",
        "events_peak_concurrency",
        "docs_vocab_growth",
        "events_cramers_v",
        "events_value_variance_ratio",
        "docs_template_clusters",
        "events_value_emd",
        "docs_source_hellinger",
        "emb_dim_anova",
        "part_newsvendor_quantiles",
        "supplier_lead_time_percentiles",
        "lineitem_volume_discount_curve",
        "customer_purchase_regularity",
        # ninth-session batch: flow/health analytics
        "orders_seasonal_strength",
        "events_rate_spikes",
        "supplier_share_momentum",
        "nation_trade_balance",
        "emb_norm_quality",
        "emb_label_confusion",
        "orders_priority_sla",
        "part_slow_movers",
        "orders_ljung_box",
        "supplier_disruption_premium",
        "part_triangle_stats",
        "part_also_bought_cosine",
        "events_ewma_chart",
        "events_littles_law",
        "orders_seasonal_decompose",
        "emb_cluster_purity",
        "nation_part_lq",
        # Round-6 tier (versioned table format; the fixture builds once in
        # the warm-up pass — timed passes measure the read paths):
        "versioned_time_travel",
        "versioned_merge_current",
        "versioned_pruned_scan",
        # Round-7 tier (compound/clustered data skipping):
        "versioned_compound_scan",
        "versioned_clustered_scan",
        # Round-8 tier (incremental delta manifests: chain fold + vacuum
        # checkpoint, CDF adds-union fast path, stats_adds-folded pruning):
        "versioned_delta_chain",
        "versioned_delta_cdf",
        "versioned_delta_pruned",
        # Round-9 tier (graded-window promotions get extended timings too;
        # multi-probe SemDeDup and the SQL time-travel rewrite are new):
        "emb_semantic_dedup",
        "emb_semantic_dedup_multiprobe",
        "versioned_sql_time_travel",
        "versioned_mor_delete",
        # Round-10 tier (timestamp travel, MOR debt, partial-column MERGE;
        # events_value_deciles joins per VERDICT r9 item 6 — the driver
        # should own timings for the rank-rewrite family):
        "versioned_timestamp_travel",
        "versioned_describe_debt",
        "versioned_merge_update_set",
        "versioned_clone_scan",
        "events_value_deciles",
        # Round-11 tier (column mapping: both append eras of a renamed
        # column read through the physical pin):
        "versioned_renamed_scan",
    ]
    def plan_rows() -> dict[str, str]:
        """query → its PLANS.md row: a cheap committed fingerprint of the
        audited plan shape. Rows that changed since the previous bench
        artifact mark queries whose plans the round touched."""
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "PLANS.md"
        )
        rows: dict[str, str] = {}
        try:
            with open(path) as f:
                for line in f:
                    parts = [
                        p.strip() for p in line.strip().strip("|").split("|")
                    ]
                    if len(parts) > 1 and parts[0] not in ("query", "---"):
                        rows[parts[0]] = line.strip()
        except OSError:
            pass
        return rows

    def previous_sidecar() -> dict:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_EXTENDED.json"
        )
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    # Priority order for the extended tier (VERDICT r8): under the wall
    # budget a truncation must starve the STALEST evidence, not the newest.
    # Queries whose PLANS.md row changed since the last artifact run FIRST,
    # then by LAST-TIMED run sequence ascending (never-timed first) — a
    # persistent round-robin, not a one-run memory: with a one-run lookback
    # two truncated runs would ping-pong over the same prefix and the tail
    # would never get timed (observed in this round's back-to-back runs).
    current_rows = plan_rows()
    prev = previous_sidecar()
    prev_rows: dict = prev.get("plan_rows", {})
    # run_seq advances past the HIGHEST value anywhere in the sidecar, not
    # just the recorded run_seq (ADVICE r10): a sidecar whose last_timed
    # entries exceed run_seq (the inconsistency hand-patched in commit
    # 50c9a81) now self-heals instead of skewing the round-robin priority
    # ordering until someone edits the artifact.
    run_seq = (
        max(
            [int(prev.get("run_seq", 0))]
            + [int(v) for v in prev.get("last_timed", {}).values()]
        )
        + 1
    )
    prev_last: dict = dict(prev.get("last_timed", {}))
    for q in prev.get("extended", {}).get("queries", {}):
        prev_last.setdefault(q, run_seq - 1)  # bootstrap from older sidecars

    def ext_priority(name: str) -> tuple[int, int, str]:
        if current_rows.get(name) != prev_rows.get(name):
            return (0, 0, name)  # plan changed (or never fingerprinted)
        return (1, int(prev_last.get(name, -1)), name)

    extended_specs = {
        n: specs[n]
        for n in sorted(extended_names, key=ext_priority)
        if n in specs
    }
    unknown_extended = [n for n in extended_names if n not in specs]

    spark = get_session("bench")

    def run_once(name: str, group: dict) -> float | None:
        """Execute one query through the noop sink; None on failure.

        Per-query isolation: one broken query must not zero the round's
        performance evidence for the other N-1 (round 3 lost its entire
        bench to a single analysis error in warm-up).
        """
        try:
            t0 = time.perf_counter()
            group[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 — report, keep benching
            errors.setdefault(name, f"{type(e).__name__}: {e}".split("\n")[0][:300])
            return None
        finally:
            # Scoped-persist caller contract: drop any MEMORY_AND_DISK
            # blocks a query pinned for its internal reuse, so the next
            # query benches against a clean executor-memory slate.
            release_cached()

    errors: dict[str, str] = {}
    # skips (wall-budget truncation) are NOT errors: the artifact must
    # never read "didn't run" as "broke" (VERDICT r8 — 48 budget skips
    # surfaced as error_queries and had to be hand-audited)
    skipped: dict[str, str] = {}
    for n in unknown_extended:
        errors[n] = "unknown query name in extended_names (renamed or typo?)"

    def calib_probe() -> float | None:
        """One pass of the fixed-cost CPU reference (see run_calibration).

        Probed per timed pass / periodically through the extended tier so
        PERF can separate mid-run ambient load from real regressions —
        round 11 lost its headline signal to exactly that ambiguity (the
        start-of-run probe cannot see a co-tenant spike 200 s later)."""
        try:
            t0 = time.perf_counter()
            spark.range(0, 200_000_000, 1, 32).selectExpr(
                "sum(id % 97) as s", "count(*) as n"
            ).write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 4)
        except Exception:  # noqa: BLE001 — a probe must never kill the run
            return None

    def bench_group(
        group: dict, n_passes: int
    ) -> tuple[dict[str, list[float]], list[float | None], dict[str, list[float | None]]]:
        # Warm-up execution of every query (codegen compile, parquet
        # footers, noop-sink init) so the timed passes measure steady-state
        # plan execution — the quantity that extrapolates to cluster scale
        # — not constant first-touch JVM costs. (The extended tier has its
        # own per-query warm+time loop with the wall-budget deadline.)
        for name in group:
            run_once(name, group)
        # N timed passes, report the min: the container shares cores with
        # other tenants, and min-of-N is the standard estimator for the
        # machine-independent cost under intermittent external load. All
        # passes are kept so the spread (co-tenant noise) is auditable.
        # Each pass opens with one calibration probe, and every query's
        # timing remembers its pass's probe — per-query ambient context.
        passes: dict[str, list[float]] = {}
        pass_calibs: list[float | None] = []
        calib_for: dict[str, list[float | None]] = {}
        for _ in range(n_passes):
            pass_calibs.append(calib_probe())
            for name in group:
                if name in errors:
                    continue
                elapsed = run_once(name, group)
                if elapsed is not None:
                    passes.setdefault(name, []).append(round(elapsed, 4))
                    calib_for.setdefault(name, []).append(pass_calibs[-1])
        return passes, pass_calibs, calib_for

    def run_calibration() -> list[float]:
        """Fixed-cost CPU reference: same work every round, every machine.

        A pure in-memory range aggregate (no parquet, no shuffle of data
        rows, size independent of sf) whose only cost driver is available
        CPU — the ambient-load dipstick for the headline numbers.
        """
        times: list[float] = []
        try:
            for i in range(4):  # pass 0 is the warm-up (codegen compile)
                t0 = time.perf_counter()
                spark.range(0, 200_000_000, 1, 32).selectExpr(
                    "sum(id % 97) as s", "count(*) as n"
                ).write.format("noop").mode("overwrite").save()
                if i > 0:
                    times.append(round(time.perf_counter() - t0, 4))
        except Exception as e:  # noqa: BLE001 — a broken calibration must
            # never cost the round its whole bench artifact
            errors.setdefault(
                "_calibration", f"{type(e).__name__}: {e}".split("\n")[0][:300]
            )
        return times

    t_start = time.perf_counter()
    calib_passes = run_calibration()
    passes, pass_calibs, calib_for = bench_group(bench_specs, 3)

    # Wall budget for the extended tier, SCALED BY AMBIENT (VERDICT r9
    # item 1): a fixed budget under variable co-tenant load structurally
    # starves the tier exactly when the machine is slow (BENCH_r09 timed
    # 19/112 extended queries at calibration 0.4689 vs 71 at 0.39 in r8).
    # The calibration row is a fixed-cost CPU reference, so
    # calibration/0.22 (the r7-era calm-ambient value) is the slowdown
    # ratio; a loaded box buys proportional wall clock, capped at 3x.
    # The harness's own hard kill (~560 s observed in round 8) may still
    # land before a scaled deadline — the checkpoint emission below makes
    # that safe: every timed query updates the artifact, so a kill costs
    # only the not-yet-run tail, never the whole bench.
    _CALIB_REF = 0.22
    base_budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "480"))
    calib = min(calib_passes) if calib_passes else None
    scale = min(3.0, max(1.0, calib / _CALIB_REF)) if calib else 1.0
    budget = base_budget * scale
    deadline = t_start + budget - 30.0

    ext_passes: dict[str, list[float]] = {}
    ext_calib: dict[str, float | None] = {}
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    sidecar_path = os.path.join(repo_dir, "BENCH_EXTENDED.json")
    # Per-core-count sidecar copy: the driver benches at two core counts
    # back-to-back, and round 11's 8-core run overwrote the 32-core run's
    # extended evidence (VERDICT r11 item 2). The shared sidecar keeps the
    # round-robin state; the _c<cpus> copy is the per-run durable record.
    from procurement_data_pipeline_spark.session import cpu_count

    cpus_sidecar_path = os.path.join(
        repo_dir, f"BENCH_EXTENDED_c{cpu_count()}.json"
    )

    def emit(final: bool) -> None:
        """Write the sidecar and print a compact artifact line reflecting
        everything timed SO FAR. Called after the headline tier and after
        every extended query: the driver parses the LAST stdout line, so
        a harness hard-kill mid-tier leaves the most recent checkpoint —
        not nothing — as the round's artifact, and the sidecar's
        round-robin state survives for the next run to continue from.

        A query that errored in ANY pass is evidence-incomplete: report
        it only under "errors", never in timings/total (a partial min
        would silently change the estimator from min-of-3 to
        min-of-fewer)."""
        timings = {
            name: min(ts) for name, ts in passes.items() if name not in errors
        }
        total = round(sum(timings.values()), 4)
        # Ambient context for each headline min: the calibration probe of
        # the pass the min came from (PERF separates load from regression).
        queries_calib = {
            name: calib_for[name][ts.index(min(ts))]
            for name, ts in passes.items()
            if name not in errors and calib_for.get(name)
        }
        ext_timings = {
            name: min(ts)
            for name, ts in ext_passes.items()
            if name not in errors
        }
        sidecar = {
            "metric": "headline_queries_total_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "calibration_sec": calib,
            "calibration_passes": calib_passes,
            "headline_pass_calibrations": pass_calibs,
            "queries_calib": queries_calib,
            "budget_sec": round(budget, 1),
            "budget_scale": round(scale, 4),
            "extended": {
                "total_sec": round(sum(ext_timings.values()), 4),
                "queries": ext_timings,
                "passes": ext_passes,
                "calib_at": ext_calib,
            },
            "passes": passes,  # raw per-pass timings → variance auditable
            # plan fingerprints at bench time: the next run prioritizes
            # queries whose PLANS.md row changed since this artifact
            "plan_rows": current_rows,
            # persistent round-robin state: when each query was last timed
            # (run_seq units), so repeated truncated runs cover the whole
            # tier instead of ping-ponging over one prefix
            "run_seq": run_seq,
            "last_timed": {
                **prev_last,
                **{q: run_seq for q in ext_timings},
            },
        }
        if errors:
            sidecar["errors"] = errors
        if skipped:
            sidecar["skipped"] = skipped
        tmp = sidecar_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sidecar, f, indent=1, sort_keys=True)
        os.replace(tmp, sidecar_path)  # a kill mid-dump never torn-writes
        tmp_c = cpus_sidecar_path + ".tmp"
        with open(tmp_c, "w") as f:
            json.dump(sidecar, f, indent=1, sort_keys=True)
        os.replace(tmp_c, cpus_sidecar_path)
        if final:
            # full evidence on an EARLY line (truncated by the driver's
            # tail capture — the sidecar is the durable copy)…
            print(json.dumps(sidecar))
        compact = {
            "metric": "headline_queries_total_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            "calibration_sec": calib,
            # Extended-tier evidence in the PARSED line (VERDICT r11 item
            # 2): total + coverage count; per-query numbers live in the
            # per-cpus sidecar, which the driver's second run cannot
            # overwrite.
            "extended_total_sec": round(sum(ext_timings.values()), 4),
            "extended_timed": len(ext_timings),
            # Per-pass ambient probes (item 8): a headline min is read
            # against the load of the pass it came from.
            "headline_pass_calibrations": pass_calibs,
        }
        if not final:
            # a checkpoint line doubling as the artifact means the run
            # was killed mid-tier — say so, and say how far it got
            compact["in_progress"] = True
            compact["timed_extended"] = len(ext_timings)
        if errors:
            compact["error_queries"] = sorted(errors)[:10]
        if skipped:
            # explicit skip accounting, SEPARATE from errors: "didn't
            # run" must never read as "broke" in the parsed artifact
            compact["skipped_count"] = len(skipped)
            compact["skipped_queries"] = sorted(skipped)[:10]
        line = json.dumps(compact)
        # …and the parsed line LAST, with a hard budget: the driver keeps
        # only the final 2000 characters of stdout. If the compact form
        # ever outgrows it, shed detail rather than the whole artifact
        # (the skip COUNT is the last thing shed — it is one integer).
        if len(line) >= 1800:
            compact.pop("skipped_queries", None)
            line = json.dumps(compact)
        if len(line) >= 1800:
            compact.pop("error_queries", None)
            line = json.dumps(compact)
        if len(line) >= 1800:
            compact["queries"] = {}
            line = json.dumps(compact)
        print(line, flush=True)

    emit(final=False)  # headline artifact is safe before the tier starts
    # Extended tier: PER-QUERY warm-up + one timed pass (headline keeps
    # its min-of-3 spread audit). Interleaving warm+time per query means
    # a budget truncation (or a hard kill) never wastes warm-up work on
    # queries whose timed pass will not run — each query's evidence
    # completes before the next query starts, in priority order.
    last_probe: float | None = calib
    for i, name in enumerate(extended_specs):
        if time.perf_counter() > deadline:
            skipped.setdefault(name, "bench wall budget exhausted")
            continue
        if i % 8 == 0:  # periodic ambient probe (VERDICT r11 item 8)
            last_probe = calib_probe()
        if run_once(name, extended_specs) is None:  # warm-up (or error)
            emit(final=False)
            continue
        elapsed = run_once(name, extended_specs)
        if elapsed is not None:
            ext_passes.setdefault(name, []).append(round(elapsed, 4))
            ext_calib[name] = last_probe
        emit(final=False)
    emit(final=True)


if __name__ == "__main__":
    main()
