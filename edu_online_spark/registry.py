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

# Round-16 window rotation (plan re-emitted at the start of round 16 —
# `python tools/rotation_plan.py 16` after CORRECTNESS_r15 landed —
# matching the pre-staged COVERAGE.md "Round-16 rotation plan" and the
# plan pinned by test_rotation_planner_reproduces_round16_plan at the
# r15 close; applied per VERDICT r15 items #1-#2):
#   1. hard cohort (deadline = 16): exactly the twenty-six round-15
#      deferrals — the seven tail fillers the r15 changed/new/promoted
#      names displaced plus the nineteen planner-deferred names, all
#      last certified r11, certifying AT the deadline (legal under the
#      exact-deadline model, proven by
#      tests/test_registry.py::test_deferral_at_deadline_never_trips_staleness).
#      They HEAD the window. This is the largest hard cohort to date
#      and includes the round's ONE rows-only slot
#      (`docs_winnowing_fingerprints_fast` — rows-only ops hit the
#      same staleness bound; ROWS_ONLY_WINDOW_SLOTS names it);
#   2. fillers: the planner's 24-name ascending-deadline list,
#      truncated to 14 — the LAST TEN planner fillers
#      (`corpus_drift_report` … `multimodal_frame_sample`, all
#      deadline-17) are displaced by the changed/new/promoted names
#      below and defer to their round-17 deadline (they MUST be in the
#      r17 window; the post-edit greedy audit
#      `tools/rotation_plan.py 17` confirms no deadline is missed);
#   3. changed/new/promoted names take slots the round they land
#      (staleness-at-birth / changed-query rule):
#      multimodal_consensus_neardup re-derives its plan this round
#      (hash-grain probe fusion, VERDICT r15 #3) and
#      dedup_diagnostics_composed drops its redundant re-checkpoint
#      (ADVICE r15 #2); the EIGHT ORACLE_R17 names land at their
#      scheduled bound (VERDICT r15 #2 — the largest batch yet),
#      all parity-rehearsed at sf0.01 every round since r13. Queue
#      entering r17 is 8 (R18=5, R19=3).
# Names are validated against the assembled registry — a typo or a
# renamed query fails loudly rather than silently ceding its slot.
_WINDOW_PRIORITY = [
    # 1: hard cohort at its r16 deadline — must head the window
    "corpus_token_df",
    "text_tfidf_top_terms",
    "corpus_boilerplate_ngrams",
    "text_boilerplate_fraction",
    "text_normalized",
    "chunks_packed",
    "docs_quality_tiered_sample",
    "docs_train_val_test",
    "docs_token_budget_cap",
    "corpus_shard_manifest",
    "docs_ngram_novelty",
    "source_vocab_overlap",
    "docs_winnowing_fingerprints",
    "docs_winnowing_overlap",
    "docs_length_quantiles_exact",
    "corpus_vocab_coverage",
    "docs_weighted_sample",
    "events_k_anonymity",
    "docs_winnowing_fingerprints_fast",  # rows-only (declared)
    "events_stratified_sample",
    "events_profile",
    "events_props_k_stats",
    "daily_revenue_ma7",
    "events_seasonal_residuals",
    "events_burst_flags",
    "events_weekly_active_users",
    # 2: fillers by ascending deadline then registry order (planner
    #    order, first 13 of 24 — the 14th, corpus_snapshot_diff, is
    #    displaced by the new composed winnowing entry below and
    #    defers to its round-17 deadline with the other ten)
    "dedup_cross_corpus",
    "dedup_semantic_keep",
    "retrieval_negative_samples",
    "dedup_ngram_jaccard_prefix",
    "ann_recall_report",
    "ann_all_pairs_recall",
    "sim_knn_ivf_probe_recall",
    "hybrid_search_rrf",
    "docs_vocab_encoded",
    "corpus_mixture_plan",
    "docs_gopher_quality",
    "corpus_dataset_card",
    "docs_stratified_sample",
    # 3a: changed THIS round — the hash-grain consensus probe fusion
    #     (VERDICT r15 #3) and the composed diagnostics checkpoint fix
    #     (ADVICE r15 #2) take slots the round they change (the
    #     changed-query rule in test_driver_window_contract)
    "multimodal_consensus_neardup",
    "dedup_diagnostics_composed",
    # 3b: NEW this round — the composed winnowing-diagnostics entry
    #     (VERDICT r15 #4), certified at birth
    "winnowing_diagnostics_composed",
    # 3c: ORACLE_R17 promotions landing at their scheduled bound
    #     (VERDICT r15 #2 — the eight-op batch, largest landing yet)
    "events_cusum_level_shift",
    "events_ab_conversion_ztest",
    "corpus_token_heavy_hitters",
    "text_lang_kappa",
    "docs_quality_spearman",
    "dedup_pair_transitivity",
    "ann_label_ndcg",
    "events_l_diversity",
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
