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

# Round-4 window rotation. The driver certifies only the first 50
# entries per round, so the window is rotated each round toward the
# queries whose certification is most valuable NOW:
#   1. oracle-backed queries that have never received a driver-side
#      CORRECTNESS row (added in rounds 2-3 behind the round-2 window);
#   2. queries whose implementation or oracle changed this round
#      (sown-PII trio, the real-decode multimodal suite, the two
#      oracle-type fixes);
#   3. long-standing sentinels re-certified every round.
# Names are validated against the assembled registry — a typo or a
# renamed query fails loudly rather than silently ceding its slot.
_WINDOW_PRIORITY = [
    # 1: never driver-certified (r1-r3 CORRECTNESS keys checked)
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q15_top_supplier",
    "events_funnel",
    "events_daily_anomalies",
    "events_cohort_retention",
    "basket_part_pairs",
    "customer_rfm",
    "data_quality_checks",
    "events_hourly_heatmap",
    "docs_length_histogram",
    "events_time_grain_rollup",
    "events_value_percentiles",
    "events_scd2_status",
    # 2: changed in round 4
    "multimodal_audio_features",
    "multimodal_decoded_meta",
    "multimodal_media_summary",
    "multimodal_frame_sample",
    "multimodal_resized",
    "multimodal_payload_dedup",
    "text_pii_source_stats",
    "text_pii_redacted",
    "text_url_domains",
    "docs_vocab_encoded",
    "corpus_mixture_plan",
    # 2b: new in round 4 (oracle-backed, certify immediately)
    "tpch_q2_min_cost_supplier",
    "tpch_q9_profit_by_nation",
    "tpch_q11_important_parts",
    "events_hll_rollup",
    "events_theta_overlap",
    "dedup_cross_corpus",
    "docs_gopher_quality",
    "docs_stratified_sample",
    "corpus_snapshot_diff",
    "dedup_semantic_keep",
    "corpus_token_countmin",
    "purchase_training_examples",
    "docs_quality_calibrated",
    "corpus_dataset_card",
    "corpus_drift_report",
    "customer_record_linkage",
    # 2c: rows-only → boolean-tolerance oracle upgrades (round 4);
    # quiz_mastery_approx reaches the window via prefix order already
    "events_distinct_users_approx",
    "lineitem_price_quantiles_approx",
    "ann_recall_report",
    "ann_all_pairs_recall",
    "hybrid_search_rrf",
    # 3: sentinels
    "quiz_mastery",
    "dedup_minhash_lsh",
    "sim_knn_bruteforce",
]

# Round-5 rotation backlog: oracle-backed queries added late in round 4
# that did NOT fit this round's 50-slot window (all locally certified at
# sf0.01, most also at sf0.1 — see COVERAGE.md). Promote these into
# _WINDOW_PRIORITY next round, retiring this round's freshly-certified
# block:
#   purchase_training_examples is IN the window; still missing:
#   basket_association_rules, events_value_winsorized,
#   events_daily_trend, events_type_transitions, purchase_status_asof,
#   embeddings_label_centroids, multimodal_image_ahash,
#   multimodal_audio_fingerprint, multimodal_video_scenecuts,
#   docs_quality_calibrated is IN; retrieval_negative_samples (sf0.01),
#   events_seasonal_residuals.


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
