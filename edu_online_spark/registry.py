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

# Round-7 window rotation. The driver certifies only the first 50
# entries per round, so the window is rotated each round toward the
# queries whose certification is most valuable NOW:
#   1. the STALENESS_BOUND_ROUNDS=5 contract (tests/test_registry.py)
#      trips first: the r2 cohort displaced by round-6 insertions
#      (driver row age hits the bound exactly this round), then the
#      ENTIRE round-3 cohort (31 rows — they hit the bound in round 8,
#      and round 8's window must absorb the 44-row round-4 cohort, so
#      they cannot wait);
#   2. queries whose implementation or oracle changed this round (the
#      four r6 red rows: explicit-CAST oracle outputs on the three
#      prefix-sum budget ops; the de-quantiled seasonal residuals),
#      plus the extended curation composition and the de-skewed label
#      noise op;
#   3. new round-7 queries, inserted as they land;
#   4. long-standing sentinels re-certified every round.
# Names are validated against the assembled registry — a typo or a
# renamed query fails loudly rather than silently ceding its slot.
_WINDOW_PRIORITY = [
    # 1a: round-2 cohort — staleness bound trips THIS round
    "daily_revenue_ma7",
    "events_profile",
    "events_props_k_stats",
    "events_stratified_sample",
    # 1b: full round-3 cohort — bound trips in round 8, which is
    # already fully booked by the 44-row round-4 cohort
    "benchmark_contamination",
    "chunks_packed",
    "corpus_boilerplate_ngrams",
    "corpus_token_df",
    "corpus_vocabulary_topk",
    "dedup_containment",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_near_dup_clusters",
    "dedup_neardup_curated",
    "dedup_ngram_jaccard",
    "docs_quality_tiered_sample",
    "docs_train_val_test",
    "documents_chunked",
    "documents_curated",
    "events_k_anonymity",
    "ip_region_counts",
    "register_windowed_counts",
    "sim_embedding_norms",
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
    # 2: changed in round 7 — the four r6 red rows (oracle output CASTs
    # / the row_number median rewrite), the extended end-to-end
    # curation chain, and the de-skewed label-noise op
    "events_seasonal_residuals",
    "docs_token_budget_cap",
    "docs_quality_budget_fill",
    "corpus_shard_manifest",
    "corpus_end_to_end_curation",
    "embeddings_label_noise",
    # 3: new in round 7 — inserted here as they land
    "docs_ngram_novelty",
    "source_vocab_overlap",
    "docs_winnowing_fingerprints",
    "docs_winnowing_fingerprints_fast",  # rows-only scale twin (new)
    "docs_winnowing_overlap",
    "docs_length_quantiles_exact",
    # 4: sentinels
    "quiz_mastery",
    "dedup_minhash_lsh",
    "sim_knn_bruteforce",
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
