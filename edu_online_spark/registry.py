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

# Round-15 window rotation (plan re-emitted at the start of round 15 —
# `python tools/rotation_plan.py 15` after CORRECTNESS_r14 landed —
# matching COVERAGE.md "Round-15 rotation plan" exactly; applied per
# VERDICT r14 items #1-#2):
#   1. hard cohort (deadline = 15): exactly the nineteen round-14
#      deferrals — the twelve tail fillers the twelve r14 promotions
#      displaced, the one filler the changed customer_rfm displaced,
#      plus the six planner-deferred names, all last certified r10,
#      certifying AT the deadline (legal under the exact-deadline
#      model, proven by
#      tests/test_registry.py::test_deferral_at_deadline_never_trips_staleness).
#      They HEAD the window;
#   2. fillers: the planner's 31-name ascending-deadline list,
#      truncated to 24 — the LAST SEVEN planner fillers
#      (`corpus_token_df` … `docs_quality_tiered_sample`, all
#      deadline-16) are displaced by the changed/new/promoted names
#      below and defer to their round-16 deadline (they MUST head the
#      r16 window). NO filler slot is rows-only this round —
#      tests/test_registry.py::ROWS_ONLY_WINDOW_SLOTS is the empty
#      set, exactly as the round-14 plan pre-staged;
#   3. changed/new/promoted names take slots the round they land
#      (staleness-at-birth rule): customer_rfm (melted threshold
#      pipeline, VERDICT r14 #4) and multimodal_ahash_clusters
#      (rewired to the hash-grain cluster engine, VERDICT r14 #3)
#      re-derive their plans this round; dedup_diagnostics_composed
#      is the round's new registration (VERDICT r14 #5); the four
#      ORACLE_R16 names are promoted ONE ROUND EARLY per VERDICT r14
#      #2 (keep draining — queue entering r16 is 16, strictly below
#      20), all parity-rehearsed at sf0.01 in rounds 13, 14 and 15.
#      The post-edit greedy audit (`tools/rotation_plan.py 16`)
#      confirms no deadline is missed by the displacement.
# Names are validated against the assembled registry — a typo or a
# renamed query fails loudly rather than silently ceding its slot.
_WINDOW_PRIORITY = [
    # 1: hard cohort at its r15 deadline — must head the window
    "orders_priciest_per_priority",
    "tpch_q13_order_distribution",
    "tpch_q16_dormant_customers",
    "tpch_q18_large_orders",
    "tpch_q20_heavy_suppliers",
    "part_price_rank_family",
    "tpch_q12_priority_by_flag",
    "tpch_q14_promo_share",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_rich_punctual_orders",
    "orders_cube",
    "orders_grouping_sets",
    "nation_participation",
    "events_hourly_heatmap",
    "orders_date_features",
    "lineitem_supplier_pareto",
    "orders_open_backlog",
    "purchase_view_window_counts",
    "purchases_minutely_gapfill",
    # 2: fillers by ascending deadline then registry order (planner
    #    order, first 24 of 31)
    "ip_region_counts",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_near_dup_clusters",
    "dedup_neardup_curated",
    "dedup_containment",
    "dedup_threshold_yield_curve",
    "sim_knn_bruteforce",
    "sim_embedding_norms",
    "xmodal_label_lang_crosstab",
    "xmodal_norm_extremes",
    "embeddings_split_centroid_shift",
    "embeddings_rademacher_sketch",
    "text_quality",
    "text_lang_confusion",
    "text_fingerprints",
    "text_token_stats",
    "text_top_bigrams",
    "documents_curated",
    "benchmark_contamination",
    "documents_chunked",
    "text_char_diversity",
    "corpus_vocabulary_topk",
    "text_repetition_scores",
    # 3a: changed THIS round — the melted customer_rfm threshold
    #     pipeline (VERDICT r14 #4) and the hash-grain
    #     multimodal_ahash_clusters rewiring (VERDICT r14 #3) take
    #     slots the round they change (the changed-query rule in
    #     test_driver_window_contract)
    "customer_rfm",
    "multimodal_ahash_clusters",
    # 3b: NEW this round — the composed dedup-diagnostics entry
    #     (VERDICT r14 #5), certified at birth
    "dedup_diagnostics_composed",
    # 3c: ORACLE_R16 promotions pulled one round forward (VERDICT r14
    #     #2 — keep draining the queue)
    "events_daily_mad_anomalies",
    "supplier_return_rate_wilson",
    "lineitem_price_benford",
    "corpus_bigram_lift_topk",
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
