"""Registry contract: extension isolation and name/oracle hygiene."""

from __future__ import annotations

from edu_online_spark import registry


def test_all_oracles_have_queries():
    qs, os_ = registry.queries(), registry.oracle_sql()
    orphans = set(os_) - set(qs)
    assert not orphans, f"oracle entries without queries: {orphans}"


def test_rows_only_set_is_intentional():
    """Every query without an oracle must be on the documented
    rows-only list — a new query silently missing its oracle fails."""
    qs, os_ = registry.queries(), registry.oracle_sql()
    rows_only = set(qs) - set(os_)
    # round 4 moved the approx/recall quartet to boolean-tolerance
    # oracles (exact columns hash-checked, estimate envelope pinned);
    # what remains is genuinely engine-defined or sequential
    assert rows_only == {
        "ann_all_pairs_topk",
        "corpus_bpe_merges",
        "dedup_simhash",
        "docs_bpe_encoded",
        "docs_compression_ratio",
        "docs_lm_perplexity",
        "docs_winnowing_fingerprints_fast",
        "events_user_value_ewma",
        "hybrid_search_rrf_lsh_prod",
        "sim_knn_ivf",
        "sim_knn_lsh",
        "text_fingerprints_fast",
        "text_knn_minhash",
    }


def test_broken_extension_does_not_kill_core(monkeypatch):
    """ADVICE r1: one failing extension import must not take down the
    core registry."""
    import importlib

    real_import = importlib.import_module

    def broken(name, package=None):
        if name.endswith(".tpch"):
            raise ImportError("simulated broken extension")
        return real_import(name, package)

    monkeypatch.setattr(importlib, "import_module", broken)
    # force a re-resolve through the guarded loader
    mods = registry._extended_modules()
    names = {m.__name__.rsplit(".", 1)[-1] for m in mods}
    assert "tpch" not in names          # the broken one was skipped
    assert "dedup" in names and "textops" in names  # the rest survived


# Round 11 rotates to the 43-row round-7 staleness cohort, which
# contains one rows-only query (docs_winnowing_fingerprints_fast —
# xxhash64 is Spark-specific, so its semantics are pytest-pinned; the
# driver row is the weak row-count check that resets its staleness
# clock). The remaining seven slots go to the five ORACLE_R11
# promotions plus the two R12-queue ops pulled forward, all
# oracle-backed.
ROWS_ONLY_WINDOW_SLOTS: set[str] = {
    "docs_winnowing_fingerprints_fast",
}


def test_driver_window_contract():
    """The driver certifies only the first 50 registry entries. Pin the
    round-8 rotation contract: every _WINDOW_PRIORITY name (the
    staleness cohort + this round's changed and new queries) sits
    inside the window, and the only rows-only names in any window
    slot are the declared ones."""
    qs = list(registry.queries())
    os_ = set(registry.oracle_sql())
    first50 = qs[:50]
    for name in registry._WINDOW_PRIORITY:
        assert name in first50, f"{name} fell out of the driver window"
        if name not in ROWS_ONLY_WINDOW_SLOTS:
            assert name in os_, f"priority slot wasted on rows-only {name}"
    rows_only_in_window = {q for q in first50 if q not in os_}
    assert rows_only_in_window == ROWS_ONLY_WINDOW_SLOTS


# Rotation cadence: with ~160 registry queries and a 50-slot window the
# full cycle takes ceil(160/50) + changed/new/sentinel overhead ≈ 5
# rounds; a query whose driver row is older than that has silently
# fallen out of the rotation.
STALENESS_BOUND_ROUNDS = 5


def test_rotation_staleness_bound():
    """VERDICT r5 #7: mechanically enforce the rotation contract —
    every registry query must either sit in the current driver window
    or have a driver-side CORRECTNESS row within the last
    STALENESS_BOUND_ROUNDS rounds. Uses the CORRECTNESS_r*.json files
    the driver writes at the repo root; skips (rather than passes
    vacuously) if none exist."""
    import glob
    import json
    import os

    import pytest

    root = os.path.join(os.path.dirname(__file__), "..")
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if not files:
        pytest.skip("no driver CORRECTNESS files present")
    latest_round = max(
        int(os.path.basename(f).split("_r")[1].split(".")[0]) for f in files
    )
    last_seen: dict[str, int] = {}
    for f in files:
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        for name in json.load(open(f)):
            last_seen[name] = max(last_seen.get(name, 0), rnd)

    window = set(list(registry.queries())[:50])
    stale = {
        name: last_seen.get(name)
        for name in registry.queries()
        if name not in window
        and (latest_round + 1) - last_seen.get(name, 0) > STALENESS_BOUND_ROUNDS
    }
    assert not stale, (
        f"queries neither in the current window nor driver-certified in "
        f"the last {STALENESS_BOUND_ROUNDS} rounds: {stale}"
    )


def test_rotation_planner_reproduces_round12_plan():
    """tools/rotation_plan.py must reproduce the committed round-12
    arithmetic (COVERAGE.md 'Round-12 rotation plan'): the hard cohort
    is EXACTLY the 50 round-8 rows (zero free slots, none rows-only),
    the two R12-queue promotions are flagged as slotless, and the
    staleness audit holds through round 13."""
    from tools.rotation_plan import plan

    p = plan(12)
    assert p["free_slots"] == 0
    assert p["rows_only_slots"] == []
    assert set(p["queued_promotions"]) == {
        "dedup_ngram_jaccard_prefix",
        "events_inter_arrival_profile",
    }
    assert p["audit_ok"]
    expected = {
        "ann_all_pairs_recall", "ann_recall_report", "basket_part_pairs",
        "corpus_dataset_card", "corpus_drift_report", "corpus_mixture_plan",
        "corpus_snapshot_diff", "corpus_token_countmin",
        "customer_record_linkage_multipass", "customer_rfm",
        "data_quality_checks", "dedup_cross_corpus", "dedup_semantic_keep",
        "docs_gopher_quality", "docs_length_histogram",
        "docs_quality_budget_fill", "docs_stratified_sample",
        "docs_vocab_encoded", "docs_winnowing_clusters",
        "docs_winnowing_cross_corpus", "events_cohort_retention",
        "events_daily_anomalies", "events_distinct_users_approx",
        "events_funnel", "events_hll_rollup", "events_scd2_status",
        "events_theta_overlap", "events_time_grain_rollup",
        "events_value_percentiles", "hybrid_search_rrf",
        "lineitem_price_quantiles_approx", "multimodal_audio_features",
        "multimodal_decoded_meta", "multimodal_frame_sample",
        "multimodal_media_summary", "multimodal_payload_dedup",
        "multimodal_resized", "purchase_training_examples",
        "retrieval_negative_samples", "sim_knn_ivf_probe_recall",
        "text_pii_redacted", "text_pii_source_stats", "text_url_domains",
        "tpch_q10_returned_items", "tpch_q11_important_parts",
        "tpch_q15_top_supplier", "tpch_q2_min_cost_supplier",
        "tpch_q7_volume_shipping", "tpch_q8_market_share",
        "tpch_q9_profit_by_nation",
    }
    assert set(p["hard_cohort"]) == expected and len(p["window"]) == 50
