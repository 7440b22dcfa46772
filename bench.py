"""Benchmark harness — the driver runs this per-round at sf0.1.

Runs the headline queries on local[$SPARK_GRAFT_CPUS] against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set = the scale-relevant shapes: full-scan agg, multi-join,
window top-k, stateful-analytics batch forms, MinHash-LSH dedup (the
O(n·sig) path, NOT the O(n²) exact variant), SRP-LSH ANN, text
pipeline. Each query is forced with a count()-style action; inputs are
re-read per query (no caching) so numbers reflect scan→result cost.

Each query runs SPARK_GRAFT_BENCH_RUNS times (default 3, whole-list
rounds so warm-state is comparable across queries) and reports the
per-query MINIMUM — the variance-robust estimate of the plan's cost on
this box; single first executions carry ±30% ambient noise (measured,
BASELINE.md round 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from edu_online_spark import registry
from edu_online_spark.session import get_spark

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_top_orders",
    "tpch_q5_region_revenue",
    "tpch_q6_forecast_revenue",
    "tpch_q4_priority_waiting",
    "tpch_q21_waiting_suppliers",
    "part_topk_per_brand",
    "register_sliding_counts",
    "quiz_mastery",
    "page_flow",
    "events_sessionize",
    "events_region_enrich",
    "ip_region_counts",
    "purchase_view_window_counts",
    "purchases_minutely_gapfill",
    "archival_daily_counts",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_knn_bruteforce",
    "sim_knn_lsh",
    "text_quality",
    "text_fingerprints",
    "benchmark_contamination",
    "documents_chunked",
    "multimodal_decoded_meta",
    "corpus_vocabulary_topk",
    "text_tfidf_top_terms",
    "text_pii_redacted",
    "events_time_grain_rollup",
    # round 4
    "tpch_q2_min_cost_supplier",
    "tpch_q9_profit_by_nation",
    "tpch_q11_important_parts",
    "events_hll_rollup",
    "events_theta_overlap",
    "dedup_cross_corpus",
    "hybrid_search_rrf",
    "docs_gopher_quality",
    "docs_stratified_sample",
    "corpus_token_countmin",
    "purchase_training_examples",
    "corpus_dataset_card",
    "corpus_drift_report",
    "multimodal_image_ahash",
    # round 5
    "hybrid_search_rrf_lsh",
    "corpus_end_to_end_curation",
    "customer_record_linkage",
    "docs_substring_dedup",
    # round 6: the LSH-fed hybrid production path WITHOUT the exact-RRF
    # baseline the certified entry pays for its recall pin — this is the
    # deployment-shape number (VERDICT r5 #8)
    "hybrid_search_rrf_lsh_prod",
    # round 6: second-wave curation deliverables — budget quota (global
    # prefix sum), shard layout, label hygiene, bloom join pre-filter
    "docs_token_budget_cap",
    "corpus_shard_manifest",
    "embeddings_label_noise",
    "customers_bloom_prefilter",
    "lineitem_price_kll_rollup",
    "multimodal_ahash_neardup",
    # round 7: novelty curve (shingle-keyed first-occurrence join),
    # winnowing fingerprints (xxhash64 scale variant — the certified
    # entry runs the char-fold mirror), mixture-design vocab overlap,
    # exact length report
    "docs_ngram_novelty",
    "docs_winnowing_fingerprints_fast",
    "docs_winnowing_overlap",
    "source_vocab_overlap",
    "docs_length_quantiles_exact",
    # round 8: the four library-op promotions (now registry queries)
    "docs_winnowing_clusters",
    "docs_winnowing_cross_corpus",
    "customer_record_linkage_multipass",
    "sim_knn_ivf_probe_recall",
    # round 9: the three r8-queued promotions + the two new source
    # diagnostics (passage-overlap matrix, tokenizer fertility)
    "source_dup_matrix",
    "corpus_shards_incremental",
    "docs_decontamination_stats",
    "source_winnow_overlap_matrix",
    "source_token_fertility",
    # round 10: persisted-index probe promotion + the four new ops
    # (value-ordered pareto cumulative, interval-overlap backlog,
    # per-source dup inflation, cluster size profile)
    "dedup_cross_corpus_probe",
    "lineitem_supplier_pareto",
    "orders_open_backlog",
    "docs_dup_inflation",
    "dedup_cluster_size_profile",
    # round 11: the five ORACLE_R11 promotions + the two zero-shuffle
    # R12-queue ops pulled forward (threshold curve pays its own LSH
    # pass standalone — the composed-diagnostics sharing numbers live
    # in BASELINE.md)
    "dedup_threshold_yield_curve",
    "events_burst_flags",
    "events_weekly_active_users",
    "embeddings_split_centroid_shift",
    "corpus_vocab_coverage",
    "docs_weighted_sample",
    "embeddings_rademacher_sketch",
    # round 12 promotions. NOTE (rider carried from VERDICT r10 /
    # BASELINE §4-r10c): dedup_ngram_jaccard_prefix is benched at
    # sf0.1 ONLY — prefix filtering improves the exact path's CONSTANT
    # (10-14× fewer candidates), not its complexity class; on
    # low-entropy corpora the candidate set is still pair-shaped, and
    # _guard_all_pairs raises above 50k docs by design.
    "dedup_ngram_jaccard_prefix",
    "events_inter_arrival_profile",
    # round 13 promotions. savings_by_source standalone pays its own
    # LSH-pairs pass here; its composed marginal cost when sharing one
    # pairs pass with the sibling diagnostics is 0.87 s on 500k docs
    # (BASELINE.md §4-r12 composed-diagnostics row) — read the
    # standalone number as a certification vehicle, the composed
    # number as the deployment shape.
    "corpus_bigram_simpson",
    "orders_fulfillment_latency",
    "events_dau_wau_stickiness",
    "dedup_savings_by_source",
    # round 14 promotions — the ORACLE_R14 six plus the R15 queue
    # pulled one round early (VERDICT r13 #3). The three pair-shaped
    # dedup/multimodal entries (lang_purity, degree_spectrum,
    # calibration) standalone pay their own LSH/pairs pass here, same
    # caveat as savings_by_source above; growth rows live in
    # SCALE.md §4-r11/r12/r13c.
    "supplier_revenue_gini",
    "customer_balance_deciles",
    "dedup_cluster_lang_purity",
    "multimodal_image_whash",
    "multimodal_whash_neardup",
    "multimodal_consensus_neardup",
    "supplier_revenue_hhi",
    "events_user_activity_gini",
    "dedup_pair_degree_spectrum",
    "dedup_minhash_calibration",
    "embeddings_norm_deciles",
    "corpus_shingle_df_spectrum",
    # round 15: the composed dedup-diagnostics entry (VERDICT r14 #5)
    # — five reports over ONE shared LSH pass, the deployment shape;
    # the five standalone entries above stay as certification
    # vehicles, each pricing its own pairs pass
    "dedup_diagnostics_composed",
    # round-15 promotions (the ORACLE_R16 cohort, one round early)
    "events_daily_mad_anomalies",
    "supplier_return_rate_wilson",
    "lineitem_price_benford",
    "corpus_bigram_lift_topk",
    # round-16 promotions (the ORACLE_R17 batch at its scheduled
    # bound — VERDICT r15 #2). dedup_pair_transitivity standalone pays
    # its own LSH-pairs pass, same caveat as the sibling diagnostics;
    # ann_label_ndcg is the brute-force-scored retrieval eval (the
    # certified exact baseline, query side broadcast-bounded).
    "events_cusum_level_shift",
    "events_ab_conversion_ztest",
    "corpus_token_heavy_hitters",
    "text_lang_kappa",
    "docs_quality_spearman",
    "dedup_pair_transitivity",
    "ann_label_ndcg",
    "events_l_diversity",
    # round 16: the composed winnowing-diagnostics entry (VERDICT r15
    # #4) — four reports over ONE checkpointed selection pass, the
    # deployment shape; the four standalone entries above stay as
    # certification vehicles, each pricing its own selection
    "winnowing_diagnostics_composed",
]

# Ambient-drift calibration (VERDICT r10 #6): pinned, plan-stable
# queries re-run a fixed number of times after warm-up. Each pin's
# median round-over-round ratio estimates box drift (the ±16%/−9.5%/
# +6.5% swings of rounds 8-10 were ambient, re-litigated each
# verdict); the headline totals can be read against them instead of
# against zero. TWO pins because contention has two axes (VERDICT r11
# #3): the scan-agg pin (tpch_q1, whole-stage-codegen scan+agg, no
# wide shuffle, no Python boundary) moved +1% in the round-11 driver
# capture while the heavy LSH/winnowing queries moved +21% — a light
# pin cannot see shuffle/Arrow contention. dedup_minhash_lsh exercises
# exactly that profile: posexplode fan-out, a banded self-join's wide
# Exchange, and Arrow-batched pandas_udf signatures.
CALIBRATION_PINS = [
    ("tpch_q1_pricing_summary", 5),   # scan-agg / codegen axis
    ("dedup_minhash_lsh", 3),         # shuffle / Arrow-boundary axis
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark()
    qs = registry.queries()
    timings: dict[str, float] = {}
    # warm the JVM: codegen, parquet reader, shuffle, decimal agg — so
    # the first timed query isn't charged one-time session setup
    warm = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm.groupBy("r_name").agg(F.sum(warm.r_regionkey.cast("decimal(10,2)"))).collect()
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # calibration: median of N re-runs of each pinned plan, measured
    # after warm-up and before the headline loop so the estimates are
    # not contaminated by whatever the loop caches in the OS page
    # cache mid-flight. The first pin's fields stay at the top level
    # (rounds 10-11 artifacts are read through them); both pins land
    # under "pins".
    pins = []
    for cal_query, cal_runs in CALIBRATION_PINS:
        cal_fn = qs[cal_query]
        cal_times: list[float] = []
        for _ in range(cal_runs):
            t0 = time.perf_counter()
            cal_fn(spark, sf_dir).count()
            cal_times.append(round(time.perf_counter() - t0, 3))
        cal_times.sort()
        pins.append({
            "query": cal_query,
            "runs": cal_runs,
            "median_sec": cal_times[len(cal_times) // 2],
            "min_sec": cal_times[0],
            "all_sec": cal_times,
        })
        print(f"# calibration {cal_query}: {cal_times}", file=sys.stderr)
    calibration = dict(pins[0], pins=pins)
    for r in range(runs):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            t = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, t), t)
            print(f"# run{r + 1} {name}: {t:.3f}s ({n} rows)", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "sf": sf,
        "calibration": calibration,
    }
    # the driver captures a bounded TAIL of stdout, which truncated the
    # head of the (long) JSON line in round 8 and silently dropped the
    # first per-query rows — also persist the artifact losslessly.
    # VERDICT r12 #3: the driver's per-round capture kept dirtying the
    # COMMITTED BENCH_LOCAL.json, so the DEFAULT is now a gitignored
    # scratch file (full record still on disk, clean working tree);
    # deliberate builder refreshes set
    # SPARK_GRAFT_BENCH_OUT=BENCH_LOCAL.json and commit the result.
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_SCRATCH.json")
    if not os.path.isabs(out_path):
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), out_path
        )
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    # Keep the PRINTED line as small as the contract allows (VERDICT
    # r16 #5: the driver stores a bounded stdout tail; r15's line
    # outgrew it and the round-over-round comparison was lost). The
    # queries dict is contractual and stays; the per-run calibration
    # arrays are not — the artifact file above keeps them losslessly.
    slim = dict(payload)
    slim["calibration"] = {
        k: v for k, v in calibration.items() if k != "all_sec"
    }
    slim["calibration"]["pins"] = [
        {k: v for k, v in p.items() if k != "all_sec"} for p in pins
    ]
    print(json.dumps(slim))


if __name__ == "__main__":
    main()
