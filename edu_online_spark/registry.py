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

# Round-9 window rotation. The driver certifies only the first 50
# entries per round, so the window is rotated each round toward the
# queries whose certification is most valuable NOW:
#   1. the STALENESS_BOUND_ROUNDS=5 contract (tests/test_registry.py)
#      trips first: the FULL 43-row round-5 cohort hits the bound at
#      round 9 (VERDICT r8 #1 — mechanical and non-negotiable), so it
#      owns 43 of the 50 slots. Seven of those are declared rows-only
#      (ROWS_ONLY_WINDOW_SLOTS in tests/test_registry.py) — their
#      driver row is the weak row-count check, which is still what
#      resets their staleness clock;
#   2. the three r8 library ops promoted to certified registry slots
#      (VERDICT r8 #2), with oracles written and type-audited in r8;
#   3. the round-9 additions (tokenizer fertility, winnowing
#      source matrix) — new queries MUST take a window slot the round
#      they land or they trip the staleness contract at birth.
# Round 10 must lead with the round-6 staleness cohort.
# Names are validated against the assembled registry — a typo or a
# renamed query fails loudly rather than silently ceding its slot.
_WINDOW_PRIORITY = [
    # 1: full round-5 cohort — staleness bound trips THIS round
    "ann_all_pairs_topk",  # rows-only
    "archival_daily_counts",
    "basket_association_rules",
    "corpus_bpe_merges",  # rows-only
    "customer_record_linkage",
    "customers_without_orders",
    "daily_event_pivot",
    "docs_compression_ratio",  # rows-only
    "docs_lm_perplexity",  # rows-only
    "docs_quality_calibrated",
    "embeddings_label_centroids",
    "events_daily_trend",
    "events_deterministic_sample",
    "events_distinct_users",
    "events_region_enrich",
    "events_session_stats",
    "events_sessionize",
    "events_type_transitions",
    "events_user_value_ewma",  # rows-only
    "events_value_winsorized",
    "hybrid_search_rrf_lsh",
    "lineitem_price_quantiles",
    "multimodal_audio_fingerprint",
    "multimodal_image_ahash",
    "multimodal_video_scenecuts",
    "orders_rollup",
    "page_flow",
    "page_props_decode",
    "part_topk_per_brand",
    "purchase_attribution",
    "purchase_status_asof",
    "quiz_mastery_approx",
    "register_cumulative_daily",
    "register_platform_counts",
    "register_sliding_counts",
    "text_fingerprints_fast",  # rows-only
    "text_knn_minhash",  # rows-only
    "tpch_q1_pricing_summary",
    "tpch_q3_top_orders",
    "tpch_q5_region_revenue",
    "tpch_q6_forecast_revenue",
    "users_purchase_no_error",
    "users_view_and_purchase",
    # 2: round-8 library ops promoted to certified slots (oracles
    # type-audited in r8)
    "source_dup_matrix",
    "corpus_shards_incremental",
    "docs_decontamination_stats",
    # 3: round-9 additions — a new query takes a window slot the round
    # it lands or it trips the staleness contract at birth
    "source_winnow_overlap_matrix",
    "source_token_fertility",
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
