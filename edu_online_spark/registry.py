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

# Round-8 window rotation. The driver certifies only the first 50
# entries per round, so the window is rotated each round toward the
# queries whose certification is most valuable NOW:
#   1. the STALENESS_BOUND_ROUNDS=5 contract (tests/test_registry.py)
#      trips first: the FULL 44-row round-4 cohort hits the bound at
#      round 8 (VERDICT r7 #1 — mechanical and non-negotiable), so it
#      owns 44 of the 50 slots;
#   2. the two queries whose 10× growth curves this round's perf work
#      touches (re-certification after an implementation change);
#   3. the four r7 library ops promoted to certified registry slots
#      (VERDICT r7 #5), with freshly written oracles.
# Sentinels sit this round out (all r7-certified); round 9 must lead
# with the 43-row round-5 cohort.
# Names are validated against the assembled registry — a typo or a
# renamed query fails loudly rather than silently ceding its slot.
_WINDOW_PRIORITY = [
    # 1: full round-4 cohort — staleness bound trips THIS round
    "ann_all_pairs_recall",
    "ann_recall_report",
    "basket_part_pairs",
    "corpus_dataset_card",
    "corpus_drift_report",
    "corpus_mixture_plan",
    "corpus_snapshot_diff",
    "corpus_token_countmin",
    "customer_rfm",
    "data_quality_checks",
    "dedup_cross_corpus",
    "dedup_semantic_keep",
    "docs_gopher_quality",
    "docs_length_histogram",
    "docs_stratified_sample",
    "docs_vocab_encoded",
    "events_cohort_retention",
    "events_daily_anomalies",
    "events_distinct_users_approx",
    "events_funnel",
    "events_hll_rollup",
    "events_scd2_status",
    "events_theta_overlap",
    "events_time_grain_rollup",
    "events_value_percentiles",
    "hybrid_search_rrf",
    "lineitem_price_quantiles_approx",
    "multimodal_audio_features",
    "multimodal_decoded_meta",
    "multimodal_frame_sample",
    "multimodal_media_summary",
    "multimodal_payload_dedup",
    "multimodal_resized",
    "purchase_training_examples",
    "text_pii_redacted",
    "text_pii_source_stats",
    "text_url_domains",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_profit_by_nation",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q15_top_supplier",
    # 2: implementation changed this round (10× growth-curve work) —
    # re-certify on the new shape
    "docs_quality_budget_fill",
    "retrieval_negative_samples",
    # 3: round-7 library ops promoted to certified slots (new oracles)
    "docs_winnowing_clusters",
    "docs_winnowing_cross_corpus",
    "customer_record_linkage_multipass",
    "sim_knn_ivf_probe_recall",
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
