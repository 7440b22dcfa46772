"""Measured scaling rehearsal (VERDICT-r3 #6): heavy operators at 10×.

Runs the two heaviest pipeline operators — dedup_minhash_lsh and
sim_knn_lsh — at sf0.1 (driver testdata) and at a generated sf1
(tools/gen_scale.py, 10× rows), recording wall-clock AND total shuffle
read/write bytes per run (from Spark's stage-level REST API, stdlib
urllib — no extra deps). A near-linear growth curve is the empirical
backing for SCALE.md's claim that candidate generation is bucketed
(equi-join on banded hashes), not quadratic.

    python tools/gen_scale.py /tmp/scale_rehearsal/sf1 10
    python tools/scale_rehearsal.py /tmp/scale_rehearsal/sf1

Prints one JSON line per (query, scale) with secs / shuffle bytes /
output rows, then a growth summary.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from edu_online_spark.registry import queries  # noqa: E402
from edu_online_spark.session import get_spark  # noqa: E402

QUERIES = [
    "dedup_minhash_lsh",
    "sim_knn_lsh",
    "dedup_cross_corpus",
    # round-4 session additions — all linear by construction; measured
    # here to keep the growth table honest rather than analytic
    "corpus_token_countmin",
    "docs_gopher_quality",
    "docs_stratified_sample",
    # round-5 additions (VERDICT r4 #6): the new/hardened heavy paths
    "hybrid_search_rrf_lsh",   # LSH-fed fusion incl. exact-RRF baseline
    "customer_record_linkage", # composite-blocked candidate generation
    "corpus_bpe_merges",       # batched merge loop (vocab-sized rounds)
    "multimodal_image_ahash",  # perceptual-hash trio over cached assets
    "multimodal_audio_fingerprint",
    "multimodal_video_scenecuts",
    "corpus_end_to_end_curation",
    # round-6 additions (VERDICT r5 #6 + #3): the substring-dedup family
    # (span explosion is corpus-token-linear by design — measure it) and
    # the residue-class negative sampler (candidate rows must grow
    # linearly in corpus size, not O(n²/50) like the crossJoin it
    # replaced)
    "corpus_repeated_spans",
    "docs_substring_dedup",
    "dedup_substring_cross_corpus",
    "retrieval_negative_samples",
    # round-6 session additions: global prefix-sum sharding (bucketed —
    # no single-partition window), broadcast-centroid label noise (n·L
    # rows, L constant), bloom bit-set probe (broadcast, build-side
    # DISTINCT is the only exchange)
    "corpus_shard_manifest",
    "embeddings_label_noise",
    "customers_bloom_prefilter",
    "multimodal_ahash_neardup",  # banded perceptual pairs — bytes never shuffle
    "multimodal_video_fp_neardup",  # cut-structure pairs, same engine
    "lineitem_price_kll_rollup",  # mergeable quantile sketches, scan-shaped
    "docs_quality_budget_fill",   # quality-ordered bucketed prefix sum
    # round-7 additions: shingle-keyed first-occurrence join (the
    # heaviest new path) and the winnowing selection (per-doc windows)
    "docs_ngram_novelty",
    "docs_winnowing_fingerprints_fast",
    # round-9 (VERDICT r8 #3): the four r8 bench promotions — none had
    # a measured 10× row; the cluster closure is the heaviest headline
    # without one (iterative: rounds-to-converge × per-round join)
    "docs_winnowing_clusters",
    "docs_winnowing_cross_corpus",
    "customer_record_linkage_multipass",
    "sim_knn_ivf_probe_recall",
    # round-9 additions — measured the round they land, so no headline
    # entry ships without a growth row
    "source_winnow_overlap_matrix",
    "source_token_fertility",
    # round-10 additions — measured the round they land
    "dedup_cross_corpus_probe",
    "lineitem_supplier_pareto",
    "orders_open_backlog",
    "docs_dup_inflation",
    "dedup_cluster_size_profile",
    # round-11 promotions — measured the round they land
    "dedup_threshold_yield_curve",
    "events_burst_flags",
    "events_weekly_active_users",
    "embeddings_split_centroid_shift",
    "corpus_vocab_coverage",
    "docs_weighted_sample",
    "embeddings_rademacher_sketch",
    # round-13 promotions — measured the round they land
    "corpus_bigram_simpson",
    "orders_fulfillment_latency",
    "events_dau_wau_stickiness",
    "dedup_savings_by_source",
    # round-15 queue — measured the round the LIBRARY op lands (two
    # rounds before the registry slot), resolved via LIBRARY below
    "corpus_shingle_df_spectrum",
    "supplier_revenue_hhi",
    "embeddings_norm_deciles",
    "dedup_minhash_calibration",
    "events_user_activity_gini",
    "dedup_pair_degree_spectrum",
    # round-16 queue — measured the round the LIBRARY op lands
    "events_daily_mad_anomalies",
    "supplier_return_rate_wilson",
    "corpus_bigram_lift_topk",
    "lineitem_price_benford",
    # round-14 promotions not already tracked above (the R15-queue six
    # were; these are the ORACLE_R14 six)
    "supplier_revenue_gini",
    "customer_balance_deciles",
    "dedup_cluster_lang_purity",
    "multimodal_image_whash",
    "multimodal_whash_neardup",
    "multimodal_consensus_neardup",
    # round-14 plan rewrites (VERDICT r13 #4/#5) — keep their growth
    # curves measured mechanically (first rows hand-measured in
    # SCALE.md §4-r14a/b)
    "customer_rfm",
    "docs_quality_spearman_banded",
    # the R18 queue's histogram-midrank MW scale path (round-14
    # queued-op window audit finding)
    "events_ab_mannwhitney_histogram",
    # round-15 additions: the composed diagnostics entry (one shared
    # LSH pass, five consumers) and the hash-grain cluster rewiring
    "dedup_diagnostics_composed",
    "multimodal_ahash_clusters",
    # round-16: the R17 batch (first rows hand-measured at the library
    # landing, SCALE.md §4-r13g/h/i — tracked mechanically now that
    # they are registry queries) and the composed winnowing entry
    "events_cusum_level_shift",
    "events_ab_conversion_ztest",
    "corpus_token_heavy_hitters",
    "text_lang_kappa",
    "docs_quality_spearman",
    "dedup_pair_transitivity",
    "ann_label_ndcg",
    "events_l_diversity",
    "winnowing_diagnostics_composed",
    # round-16 R19-queue additions — measured the round the LIBRARY
    # op lands, resolved via LIBRARY below until their registry slots
    "events_t_closeness",
    "ann_label_mrr",
    "events_ab_fdr_bh",
]


def _library():
    """Queued ops that are not registry queries yet: name → callable
    with the registry (spark, sf_dir) signature, so growth rows exist
    BEFORE the promotion round."""
    from edu_online_spark.operators import pii
    from edu_online_spark.operators.analytics import (
        ab_fdr_bh,
        ab_value_mannwhitney_histogram,
        daily_mad_anomalies,
        price_benford_screen,
        supplier_return_rate_wilson,
        supplier_revenue_hhi,
        user_activity_gini,
    )
    from edu_online_spark.operators.dedup import (
        minhash_calibration,
        pair_degree_spectrum,
    )
    from edu_online_spark.operators.similarity import label_mrr, norm_deciles
    from edu_online_spark.operators.textops import (
        bigram_lift_topk,
        quality_length_spearman_banded,
        shingle_df_spectrum,
    )
    from edu_online_spark.sources import load_table

    return {
        "corpus_shingle_df_spectrum": lambda s, d: shingle_df_spectrum(
            load_table(s, d, "documents")
        ),
        "supplier_revenue_hhi": lambda s, d: supplier_revenue_hhi(
            load_table(s, d, "lineitem"),
            load_table(s, d, "supplier"),
            load_table(s, d, "nation"),
        ),
        "embeddings_norm_deciles": lambda s, d: norm_deciles(
            load_table(s, d, "embeddings")
        ),
        "dedup_minhash_calibration": lambda s, d: minhash_calibration(
            load_table(s, d, "documents")
        ),
        "events_user_activity_gini": lambda s, d: user_activity_gini(
            load_table(s, d, "events")
        ),
        "dedup_pair_degree_spectrum": lambda s, d: pair_degree_spectrum(
            load_table(s, d, "documents")
        ),
        "events_daily_mad_anomalies": lambda s, d: daily_mad_anomalies(
            load_table(s, d, "events")
        ),
        "supplier_return_rate_wilson": lambda s, d: (
            supplier_return_rate_wilson(load_table(s, d, "lineitem"))
        ),
        "corpus_bigram_lift_topk": lambda s, d: bigram_lift_topk(
            load_table(s, d, "documents")
        ),
        "lineitem_price_benford": lambda s, d: price_benford_screen(
            load_table(s, d, "lineitem")
        ),
        # the banded Spearman is the unregistered scale path the exact
        # op's guard names — its growth curve is the claim to back
        "docs_quality_spearman_banded": lambda s, d: (
            quality_length_spearman_banded(load_table(s, d, "documents"))
        ),
        "events_ab_mannwhitney_histogram": lambda s, d: (
            ab_value_mannwhitney_histogram(load_table(s, d, "events"))
        ),
        "events_t_closeness": pii._q_events_tclose,
        "ann_label_mrr": lambda s, d: label_mrr(
            load_table(s, d, "embeddings")
        ),
        "events_ab_fdr_bh": lambda s, d: ab_fdr_bh(
            load_table(s, d, "events")
        ),
    }

# Queries whose cost Catalyst can prune under count() (aggregate
# expressions and join branches fold away when only the row count is
# demanded): materialize through the noop sink instead, which forces
# every output column (§4-r8b method).
NOOP_MATERIALIZE = {
    "docs_winnowing_clusters",
    "docs_winnowing_cross_corpus",
    "customer_record_linkage_multipass",
    "sim_knn_ivf_probe_recall",
    "source_winnow_overlap_matrix",
    "source_token_fertility",
    "dedup_cross_corpus_probe",
    "lineitem_supplier_pareto",
    "orders_open_backlog",
    "docs_dup_inflation",
    "dedup_cluster_size_profile",
    "dedup_threshold_yield_curve",
    "events_burst_flags",
    "events_weekly_active_users",
    "embeddings_split_centroid_shift",
    "corpus_vocab_coverage",
    "docs_weighted_sample",
    "embeddings_rademacher_sketch",
    "corpus_bigram_simpson",
    "orders_fulfillment_latency",
    "events_dau_wau_stickiness",
    "dedup_savings_by_source",
    "corpus_shingle_df_spectrum",
    "supplier_revenue_hhi",
    "embeddings_norm_deciles",
    "dedup_minhash_calibration",
    "events_user_activity_gini",
    "dedup_pair_degree_spectrum",
    "events_daily_mad_anomalies",
    "supplier_return_rate_wilson",
    "corpus_bigram_lift_topk",
    "lineitem_price_benford",
    "events_cusum_level_shift",
    "events_ab_conversion_ztest",
    "corpus_token_heavy_hitters",
    "text_lang_kappa",
    "docs_quality_spearman",
    "dedup_pair_transitivity",
    "ann_label_ndcg",
    "events_l_diversity",
    "winnowing_diagnostics_composed",
    "events_t_closeness",
    "ann_label_mrr",
    "events_ab_fdr_bh",
}


def _materialize(df, name: str) -> int:
    if name in NOOP_MATERIALIZE:
        df.write.format("noop").mode("overwrite").save()
        return -1  # rows not observable through the noop sink
    return df.count()


def _shuffle_totals(spark) -> tuple[int, int]:
    """Sum shuffle read/write bytes across all completed stages via the
    UI REST API (the one place PySpark exposes stage metrics without a
    JVM listener)."""
    url = spark.sparkContext.uiWebUrl
    if not url:
        return -1, -1
    base = f"http://localhost:{url.rsplit(':', 1)[1]}"
    app_id = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages?status=complete") as r:
            stages = json.load(r)
    except Exception as exc:  # UI disabled or port moved — degrade, don't die
        print(f"stage metrics unavailable: {exc}", file=sys.stderr)
        return -1, -1
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_rehearsal/sf1"
    subset = sys.argv[2:]  # optional: rehearse only the named queries
    run_list = [q for q in QUERIES if not subset or q in subset]
    qs = dict(_library())
    qs.update(queries())  # a later registration shadows the library row
    results: dict[tuple[str, str], dict] = {}
    for scale, sf_dir in [("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1_dir)]:
        # fresh session per scale so REST stage totals are per-scale deltas;
        # the engine default disables the UI — the rehearsal needs its REST
        # stage metrics, so re-enable it here only. maxPartitionBytes drops
        # to 1 MB so the rehearsal's single-digit-MB parquet files split
        # into multiple scan tasks (at 128 MB each file is ONE split and
        # wall-clock growth measures serialized map cost — the §4-r8
        # caveat; gen_scale.py now writes ~32 row groups per table so the
        # byte-range splits align to real work)
        spark = get_spark(extra={
            "spark.ui.enabled": "true",
            "spark.sql.files.maxPartitionBytes": str(1 << 20),
        })
        # JVM/codegen warmup so the first measured query doesn't absorb
        # session start cost (which would swamp the scaling signal)
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        for name in run_list:
            _materialize(qs[name](spark, sf_dir), name)  # warm run
            r0, w0 = _shuffle_totals(spark)
            t0 = time.monotonic()
            n = _materialize(qs[name](spark, sf_dir), name)
            secs = time.monotonic() - t0
            r1, w1 = _shuffle_totals(spark)
            rec = {
                "query": name,
                "scale": scale,
                "secs": round(secs, 2),
                "rows": n,
                "shuffle_read_mb": round((r1 - r0) / 1e6, 1) if r0 >= 0 else None,
                "shuffle_write_mb": round((w1 - w0) / 1e6, 1) if w0 >= 0 else None,
            }
            results[(name, scale)] = rec
            print(json.dumps(rec))
        spark.stop()
    for name in run_list:
        a, b = results[(name, "sf0.1")], results[(name, "sf1")]
        print(
            json.dumps(
                {
                    "query": name,
                    "time_growth_x": round(b["secs"] / a["secs"], 2),
                    "shuffle_write_growth_x": (
                        round(b["shuffle_write_mb"] / a["shuffle_write_mb"], 2)
                        if a["shuffle_write_mb"] else None
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
