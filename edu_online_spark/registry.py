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

# Round-10 window rotation (plan precomputed in COVERAGE.md at the
# end of round 9 and re-verified mechanically this round):
#   1. the STALENESS_BOUND_ROUNDS=5 contract trips first: the FULL
#      41-row round-6 cohort hits the bound at round 10, so it owns
#      41 of the 50 slots. Five of those are declared rows-only
#      (ROWS_ONLY_WINDOW_SLOTS in tests/test_registry.py) — their
#      driver row is the weak row-count check, which is still what
#      resets their staleness clock;
#   2. the round-9 library op promoted to a certified slot
#      (`dedup_cross_corpus_probe`, oracle queued + type-audited in
#      round 9), plus any round-10 additions — a new query takes a
#      window slot the round it lands or it trips the staleness
#      contract at birth;
#   3. fillers drawn from the round-7 cohort (47 queries hit the bound
#      at round 11 — one more than the window holds, so every filler
#      certified now is a slot bought back next round).
# Round 11 must lead with the remaining round-7 staleness cohort.
# Names are validated against the assembled registry — a typo or a
# renamed query fails loudly rather than silently ceding its slot.
_WINDOW_PRIORITY = [
    # 1: full round-6 cohort — staleness bound trips THIS round
    "corpus_repeated_spans",
    "customers_bloom_prefilter",
    "dedup_simhash",  # rows-only
    "dedup_substring_cross_corpus",
    "docs_bpe_encoded",  # rows-only
    "docs_curriculum_stages",
    "docs_feature_hashed",
    "docs_hashed_knn",
    "docs_leakage_safe_split",
    "docs_memorization_risk",
    "docs_mixture_temperature",
    "docs_substring_dedup",
    "embeddings_quantized_int8",
    "events_hourly_heatmap",
    "hybrid_search_rrf_lsh_prod",  # rows-only
    "lineitem_price_kll_rollup",
    "multimodal_ahash_clusters",
    "multimodal_ahash_neardup",
    "multimodal_video_fp_neardup",
    "nation_participation",
    "orders_cube",
    "orders_date_features",
    "orders_grouping_sets",
    "orders_priciest_per_priority",
    "part_price_rank_family",
    "purchase_view_window_counts",
    "purchases_minutely_gapfill",
    "sim_knn_ivf",  # rows-only
    "sim_knn_lsh",  # rows-only
    "split_leakage_compare",
    "tpch_q12_priority_by_flag",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_share",
    "tpch_q16_dormant_customers",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_heavy_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_rich_punctual_orders",
    "tpch_q4_priority_waiting",
    # 2: round-9 library op promoted to a certified slot, plus
    #    round-10 additions (each takes a slot the round it lands)
    "dedup_cross_corpus_probe",
    # 2 (cont.): round-10 additions — each takes a slot the round it
    #    lands (staleness-at-birth rule)
    "lineitem_supplier_pareto",
    "orders_open_backlog",
    "docs_dup_inflation",
    "dedup_cluster_size_profile",
    # 3: fillers from the round-7 cohort (round-11 pressure relief)
    "dedup_exact",
    "dedup_minhash_lsh",
    "corpus_end_to_end_curation",
    "embeddings_label_noise",
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
