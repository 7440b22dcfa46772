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

# Round-11 window rotation (plan precomputed in COVERAGE.md at the
# end of round 10 and applied mechanically this round — VERDICT r10
# item #1):
#   1. the STALENESS_BOUND_ROUNDS=5 contract trips first: exactly 43
#      queries have round 7 as their newest driver row after r10 (the
#      round-7 cohort minus the four fillers r10 pre-certified) and
#      hit the one-round-margin rotation point at round 11. One is
#      declared rows-only (`docs_winnowing_fingerprints_fast`,
#      ROWS_ONLY_WINDOW_SLOTS in tests/test_registry.py) — its driver
#      row is the weak row-count check, which is still what resets
#      its staleness clock;
#   2. the five ORACLE_R11 promotions (library + tests + audited
#      oracles landed in round 10) — a new query takes a window slot
#      the round it lands or it trips the staleness contract at birth;
#   3. the two remaining free slots go to the zero-shuffle R12-queue
#      ops pulled forward (VERDICT r10 item #2); the rest of the R12
#      queue (`dedup_ngram_jaccard_prefix`,
#      `events_inter_arrival_profile`) stays queued for round 12.
# Names are validated against the assembled registry — a typo or a
# renamed query fails loudly rather than silently ceding its slot.
_WINDOW_PRIORITY = [
    # 1: full round-7 staleness cohort — bound trips at round 12
    "benchmark_contamination",
    "chunks_packed",
    "corpus_boilerplate_ngrams",
    "corpus_shard_manifest",
    "corpus_token_df",
    "corpus_vocabulary_topk",
    "daily_revenue_ma7",
    "dedup_containment",
    "dedup_embedding_cosine",
    "dedup_near_dup_clusters",
    "dedup_neardup_curated",
    "dedup_ngram_jaccard",
    "docs_length_quantiles_exact",
    "docs_ngram_novelty",
    "docs_quality_tiered_sample",
    "docs_token_budget_cap",
    "docs_train_val_test",
    "docs_winnowing_fingerprints",
    "docs_winnowing_fingerprints_fast",  # rows-only
    "docs_winnowing_overlap",
    "documents_chunked",
    "documents_curated",
    "events_k_anonymity",
    "events_profile",
    "events_props_k_stats",
    "events_seasonal_residuals",
    "events_stratified_sample",
    "ip_region_counts",
    "sim_embedding_norms",
    "sim_knn_bruteforce",
    "source_vocab_overlap",
    "text_boilerplate_fraction",
    "text_char_diversity",
    "text_fingerprints",
    "text_lang_confusion",
    "text_normalized",
    "text_quality",
    "text_repetition_scores",
    "text_tfidf_top_terms",
    "text_token_stats",
    "text_top_bigrams",
    "xmodal_label_lang_crosstab",
    "xmodal_norm_extremes",
    # 2: ORACLE_R11 promotions — each takes a slot the round it lands
    #    (staleness-at-birth rule)
    "dedup_threshold_yield_curve",
    "events_burst_flags",
    "embeddings_split_centroid_shift",
    "events_weekly_active_users",
    "corpus_vocab_coverage",
    # 3: R12-queue ops pulled forward into the two free slots
    "docs_weighted_sample",
    "embeddings_rademacher_sketch",
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
