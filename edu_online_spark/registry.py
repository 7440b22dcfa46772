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

# Round-13 window rotation (plan precomputed by tools/rotation_plan.py
# at the end of round 12 — `python tools/rotation_plan.py 13` — and
# applied VERBATIM from COVERAGE.md "Round-13 window, fully
# precomputed", VERDICT r12 items #1-#2):
#   1. hard cohort (deadline = 13): exactly the two fillers the
#      round-12 promotions displaced — `basket_part_pairs`,
#      `customer_rfm` (last certified r8; certifying AT the deadline
#      is legal under the exact-deadline model, proven by
#      tests/test_registry.py::test_deferral_at_deadline_never_trips_staleness).
#      They HEAD the window;
#   2. fillers: the round-9 cohort by registry order, deferring
#      `purchase_attribution` and `purchase_status_asof` to their
#      round-14 deadline. Seven filler slots are rows-only by design
#      (LSH/iterative/libm-dependent) — declared in
#      tests/test_registry.py::ROWS_ONLY_WINDOW_SLOTS;
#   3. the four ORACLE_R13 promotions (`corpus_bigram_simpson`,
#      `orders_fulfillment_latency`, `events_dau_wau_stickiness`,
#      `dedup_savings_by_source`; library + tests + audited oracles
#      held since round 11/12, re-rehearsed 4/4 at sf0.01 in round
#      12) take slots the round they land (staleness-at-birth rule),
#      displacing the last four cohort-9 fillers by registry order
#      (`customer_record_linkage`, `events_sessionize`,
#      `events_session_stats`, `events_region_enrich`), which defer
#      to their round-14 deadline; r14 debt = those 4 + the 2
#      planner-deferred purchase rows = 6, as the greedy audit
#      simulated.
# Names are validated against the assembled registry — a typo or a
# renamed query fails loudly rather than silently ceding its slot.
_WINDOW_PRIORITY = [
    # 1: hard cohort at its r13 deadline — must head the window
    "basket_part_pairs",
    "customer_rfm",
    # 2: round-9 cohort fillers by registry order (each buying its
    #    slot back one round before its r14 deadline)
    "register_platform_counts",
    "register_windowed_counts",
    "register_sliding_counts",
    "register_cumulative_daily",
    "quiz_mastery",
    "quiz_mastery_approx",
    "page_props_decode",
    "page_flow",
    "archival_daily_counts",
    "source_dup_matrix",
    "embeddings_label_centroids",
    "hybrid_search_rrf_lsh",
    "docs_quality_calibrated",
    "docs_decontamination_stats",
    "corpus_shards_incremental",
    "source_winnow_overlap_matrix",
    "source_token_fertility",
    "multimodal_image_ahash",
    "multimodal_audio_fingerprint",
    "multimodal_video_scenecuts",
    "text_knn_minhash",  # rows-only
    "ann_all_pairs_topk",  # rows-only
    "text_fingerprints_fast",  # rows-only
    "docs_lm_perplexity",  # rows-only
    "docs_compression_ratio",  # rows-only
    "corpus_bpe_merges",  # rows-only
    "tpch_q1_pricing_summary",
    "tpch_q3_top_orders",
    "tpch_q5_region_revenue",
    "tpch_q6_forecast_revenue",
    "part_topk_per_brand",
    "users_purchase_no_error",
    "users_view_and_purchase",
    "orders_rollup",
    "customers_without_orders",
    "daily_event_pivot",
    "events_distinct_users",
    "lineitem_price_quantiles",
    "events_deterministic_sample",
    "events_user_value_ewma",  # rows-only
    "basket_association_rules",
    "events_value_winsorized",
    "events_daily_trend",
    "events_type_transitions",
    # 3: ORACLE_R13 promotions — each takes a slot the round it lands
    #    (staleness-at-birth rule); these displace the last four
    #    cohort-9 fillers per the deferral arithmetic
    "corpus_bigram_simpson",
    "orders_fulfillment_latency",
    "events_dau_wau_stickiness",
    "dedup_savings_by_source",
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
