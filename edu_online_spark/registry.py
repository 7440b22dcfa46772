"""Central query registry: merges each operator module's QUERIES/ORACLE.

The driver contract (__spark_entry__.py) and the local parity tests both
read from here, so "implemented" has exactly one definition.

Queries present in QUERIES but absent from ORACLE are deliberately
rows-only (non-SQL-expressible ops: LSH candidate generation, iterative
algorithms, stateful streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import archival, page, quiz, register

_MODULES = [register, quiz, page, archival]


# Registration order is a CONTRACT, not cosmetics: the correctness driver
# checks the first 50 registry entries per round. The LLM-pipeline modules
# (iplookup / dedup / similarity / textops / pii / multimodal — the north-star
# operators) therefore come before the long relational tail (tpch /
# analytics / sessions, certified by the round-2 driver run) so every
# flagship operator gets a driver-side CORRECTNESS entry each round.
_EXTENSION_NAMES = [
    "iplookup",
    "dedup",
    "similarity",
    "textops",
    "pii",
    "multimodal",
    "sketches",
    "bpe",
    "curation",
    "tpch",
    "analytics",
    "sessions",
]


def _extended_modules():
    """Extension operator modules are appended as they land.

    Only ImportError is swallowed (an optional dependency genuinely
    absent from the environment must not take down the core registry);
    any other failure — a typo, a NameError at module scope — would
    silently drop every query in the module and surface downstream as
    'unknown query', so it propagates."""
    import importlib
    import sys

    mods = []
    for name in _EXTENSION_NAMES:
        try:
            mods.append(importlib.import_module(f".operators.{name}", __package__))
        except ImportError as exc:
            print(
                f"edu_online_spark: skipping extension module {name!r}: {exc}",
                file=sys.stderr,
            )
    return mods


# Modules whose queries compete for the driver's 50 correctness slots
# (everything before the relational tail, which was driver-certified in
# round 2).
_PREFIX_TAIL_BOUNDARY = "tpch"

# Round-14 window rotation (plan re-emitted at the start of round 14 —
# `python tools/rotation_plan.py 14` after CORRECTNESS_r13 landed —
# matching COVERAGE.md "Round-14 rotation plan" exactly; applied per
# VERDICT r13 items #1-#3):
#   1. hard cohort (deadline = 14): exactly the six round-13
#      deferrals — the four cohort-9 fillers the R13 promotions
#      displaced plus the two planner-deferred purchase rows, all
#      last certified r9, certifying AT the deadline (legal under the
#      exact-deadline model, proven by
#      tests/test_registry.py::test_deferral_at_deadline_never_trips_staleness).
#      They HEAD the window;
#   2. fillers: the planner's 44-name ascending-deadline list,
#      truncated to 32 — the LAST TWELVE planner fillers
#      (`tpch_q13_order_distribution` … `nation_participation`, all
#      deadline-15) are displaced by the promotions below and defer
#      to their round-15 deadline (they MUST head the r15 window).
#      Six filler slots are rows-only by design (LSH/iterative/
#      engine-defined estimator) — declared in
#      tests/test_registry.py::ROWS_ONLY_WINDOW_SLOTS;
#   3. TWELVE promotions take slots the round they land
#      (staleness-at-birth rule): the six ORACLE_R14 names on
#      schedule, plus the six R15-queue names promoted ONE ROUND
#      EARLY per VERDICT r13 #3 (drain the queue) — all rehearsed at
#      sf0.01 in rounds 13 AND 14; the post-edit greedy audit
#      (`tools/rotation_plan.py 15`) confirms no deadline is missed
#      by the doubled displacement.
# Names are validated against the assembled registry — a typo or a
# renamed query fails loudly rather than silently ceding its slot.
_WINDOW_PRIORITY = [
    # 1: hard cohort at its r14 deadline — must head the window
    "customer_record_linkage",
    "events_sessionize",
    "events_session_stats",
    "events_region_enrich",
    "purchase_attribution",
    "purchase_status_asof",
    # 2: fillers by ascending deadline then registry order (planner
    #    order, first 32 of 44)
    "dedup_exact",
    "dedup_minhash_lsh",
    "corpus_repeated_spans",
    "docs_substring_dedup",
    "dedup_substring_cross_corpus",
    "docs_leakage_safe_split",
    "docs_memorization_risk",
    "split_leakage_compare",
    "dedup_cross_corpus_probe",
    "docs_dup_inflation",
    "dedup_cluster_size_profile",
    "embeddings_quantized_int8",
    "embeddings_label_noise",
    "docs_feature_hashed",
    "docs_hashed_knn",
    "docs_mixture_temperature",
    "docs_curriculum_stages",
    "multimodal_ahash_neardup",
    "multimodal_video_fp_neardup",
    "multimodal_ahash_clusters",
    "customers_bloom_prefilter",
    "lineitem_price_kll_rollup",
    "corpus_end_to_end_curation",
    "dedup_simhash",  # rows-only
    "sim_knn_lsh",  # rows-only
    "sim_knn_ivf",  # rows-only
    "hybrid_search_rrf_lsh_prod",  # rows-only
    "docs_bpe_encoded",  # rows-only
    "tpch_q4_priority_waiting",
    "tpch_q17_small_qty_revenue",
    "tpch_q21_waiting_suppliers",
    # 2b: changed THIS round — the threshold-bucketed customer_rfm
    #     rewrite (VERDICT r13 #4) re-derives query AND oracle, so it
    #     takes a slot the round it changes (the changed-query rule in
    #     test_driver_window_contract), displacing the tail filler
    #     `orders_priciest_per_priority` (deadline 15 — joins the r15
    #     hard cohort; audit re-run OK)
    "customer_rfm",
    # 3a: ORACLE_R14 promotions, on schedule — each takes a slot the
    #     round it lands (staleness-at-birth rule)
    "supplier_revenue_gini",
    "customer_balance_deciles",
    "dedup_cluster_lang_purity",
    "multimodal_image_whash",
    "multimodal_whash_neardup",
    "multimodal_consensus_neardup",
    # 3b: R15-queue promotions pulled one round forward (VERDICT r13
    #     #3); the calibration op is the declared rows-only slot
    "supplier_revenue_hhi",
    "events_user_activity_gini",
    "dedup_pair_degree_spectrum",
    "dedup_minhash_calibration",  # rows-only
    "embeddings_norm_deciles",
    "corpus_shingle_df_spectrum",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Module order as declared, with two cross-module rules:
    _WINDOW_PRIORITY names come first (the round's rotation of the
    driver's 50-certification-slot window), then, within the north-star
    PREFIX (core + every extension module before the relational tail),
    oracle-checked entries precede rows-only ones. The driver's
    correctness gate covers only the first 50 entries and gives
    rows-only queries just a weak row-count check — so rows-only
    entries cede their early slots to queries whose hash-match actually
    consumes one."""
    mods = _MODULES + _extended_modules()
    tail_start = next(
        (
            i
            for i, m in enumerate(mods)
            if m.__name__.rsplit(".", 1)[-1] == _PREFIX_TAIL_BOUNDARY
        ),
        len(mods),
    )
    prefix, tail = mods[:tail_start], mods[tail_start:]

    out: dict[str, Callable] = {}

    def add(name, fn):
        if name in out:
            raise ValueError(f"duplicate query name {name!r}")
        out[name] = fn

    deferred: list[tuple[str, Callable]] = []
    for m in prefix:
        oracle_backed = getattr(m, "ORACLE", {})
        for name, fn in m.QUERIES.items():
            if name in oracle_backed:
                add(name, fn)
            else:
                deferred.append((name, fn))
    for name, fn in deferred:
        add(name, fn)
    for m in tail:
        for name, fn in m.QUERIES.items():
            add(name, fn)

    missing = [n for n in _WINDOW_PRIORITY if n not in out]
    if missing:
        raise ValueError(f"_WINDOW_PRIORITY names not in registry: {missing}")
    rotated = {n: out[n] for n in _WINDOW_PRIORITY}
    rotated.update((n, f) for n, f in out.items() if n not in rotated)
    return rotated


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES + _extended_modules():
        out.update(getattr(m, "ORACLE", {}))
    return out
