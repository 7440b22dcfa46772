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

# Round-5 window rotation. The driver certifies only the first 50
# entries per round, so the window is rotated each round toward the
# queries whose certification is most valuable NOW:
#   1. the COMPLETE residue of never-driver-certified queries (all 19
#      remaining after r1-r4 — 12 oracle-backed, 7 rows-only; after
#      this round every registry query has a driver-side row);
#   2. queries whose implementation or oracle changed this round
#      (null-ordering fix, bigram guard, exact-exclusion rewrite);
#   3. new round-5 queries (certify immediately);
#   4. long-standing sentinels re-certified every round, then
#      round-1-certified queries whose rows are now four rounds old.
# Names are validated against the assembled registry — a typo or a
# renamed query fails loudly rather than silently ceding its slot.
_WINDOW_PRIORITY = [
    # 1: never driver-certified (r1-r4 CORRECTNESS keys checked) —
    # oracle-backed first
    "retrieval_negative_samples",
    "embeddings_label_centroids",
    "multimodal_image_ahash",
    "multimodal_audio_fingerprint",
    "multimodal_video_scenecuts",
    "basket_association_rules",
    "events_value_winsorized",
    "events_daily_trend",
    "events_type_transitions",
    "events_seasonal_residuals",
    "purchase_status_asof",
    # 1b: never-certified rows-only (weak check, but closes the set)
    "text_knn_minhash",
    "ann_all_pairs_topk",
    "text_fingerprints_fast",
    "docs_lm_perplexity",
    "docs_compression_ratio",
    "corpus_bpe_merges",
    "docs_bpe_encoded",
    "events_user_value_ewma",
    # 2: implementation changed in round 5 (advisor fixes)
    "docs_quality_calibrated",
    "customer_record_linkage",
    # 3: new in round 5 — appended as they land (see round-5 additions
    # below in this list)
    "hybrid_search_rrf_lsh",
    "corpus_end_to_end_curation",
    # 4: sentinels
    "quiz_mastery",
    "dedup_minhash_lsh",
    "sim_knn_bruteforce",
    # 4b: round-1 rows now four rounds old — refresh the heaviest-used
    "tpch_q1_pricing_summary",
    "tpch_q3_top_orders",
    "tpch_q5_region_revenue",
    "tpch_q6_forecast_revenue",
    "register_platform_counts",
    "register_sliding_counts",
    "register_cumulative_daily",
    "quiz_mastery_approx",
    "page_props_decode",
    "page_flow",
    "archival_daily_counts",
    "part_topk_per_brand",
    "users_purchase_no_error",
    "users_view_and_purchase",
    "orders_rollup",
    "customers_without_orders",
    "daily_event_pivot",
    "events_distinct_users",
    "lineitem_price_quantiles",
    "events_deterministic_sample",
    "events_sessionize",
    "events_session_stats",
    "events_region_enrich",
    "purchase_attribution",
]

# Round-6 rotation backlog: added after this round's window filled —
# certify next round: corpus_repeated_spans, docs_substring_dedup,
# dedup_substring_cross_corpus (green at sf0.01 + sf0.1),
# docs_leakage_safe_split (green at sf0.01; quadratic closure oracle →
# sf0.01 policy), docs_feature_hashed, docs_hashed_knn (green at
# sf0.01 + sf0.1). All oracle-backed.


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
