"""End-to-end curation funnel semantics on a planted fixture: each
stage's effect must be visible in the card, and the funnel counts must
be monotone."""

from __future__ import annotations

from edu_online_spark.operators.curation import corpus_end_to_end_curation

# 24 distinct ~6-char words + 2 stopwords: passes every Gopher rule
# (20-1000 tokens, mean word len 4.2-10, top share <= 1/26 < 0.12,
# 2 stopwords).
_GOOD = (
    "the quickly branded crystal mornings deliver useful metrics and "
    "gathers shining results foundry pipeline curated tokens sampled "
    "packing budget release shipping quality filters measure wordings"
)
# near-duplicate of _GOOD: one word swapped, shingle Jaccard >> 0.5
_NEAR_DUP = _GOOD.replace("crystal", "crystals")
# DIFFERENT text (no shingle overlap — dedup must not touch it) with a
# planted email: the scrub stage must redact it BEFORE the gate/dedup
# see the text
_WITH_PII = (
    "the reactor vented plasma toward bob@example.com during overnight "
    "and calibration windows rotating magnets sustained thermal loads "
    "while operators logged anomaly spikes across redundant monitors"
)


def test_curation_funnel_stages(spark):
    docs = spark.createDataFrame(
        [
            (0, _GOOD, "s1", "en"),
            (1, _NEAR_DUP, "s1", "en"),          # collapsed by dedup
            (2, "too short", "s1", "en"),        # dropped by the gate
            (3, _WITH_PII, "s2", "en"),          # redacted, then kept
        ],
        ["doc_id", "text", "source", "lang"],
    )
    card = {r["source"]: r for r in corpus_end_to_end_curation(docs).collect()}
    s1, s2 = card["s1"], card["s2"]
    assert s1["n_raw"] == 3 and s2["n_raw"] == 1
    assert s1["n_kept_gopher"] == 2          # the short doc dropped
    assert s1["n_after_dedup"] == 1          # near-dup collapsed
    assert s1["n_sampled"] == 1 and s1["n_redactions"] == 0
    assert s2["n_kept_gopher"] == 1 and s2["n_after_dedup"] == 1
    assert s2["n_redactions"] == 1           # the planted email
    assert s2["sampled_tokens"] == 24
    # funnel monotonicity in every source
    for row in (s1, s2):
        assert (
            row["n_raw"]
            >= row["n_kept_gopher"]
            >= row["n_after_dedup"]
            >= row["n_sampled"]
        )
        assert row["n_packs"] >= 1 and row["packed_tokens"] == row["sampled_tokens"]


def test_curation_release_branch(spark):
    """Round 7: the budget → mixture → shard branch. With a tiny
    corpus (far under CURATION_FILL_BUDGET) every deduped doc is
    budget-admitted; the sqrt-temperature mixture then draws
    total//2 docs; shards partition exactly the mixed token mass."""
    docs = spark.createDataFrame(
        [
            (0, _GOOD, "s1", "en"),
            (1, _NEAR_DUP, "s1", "en"),
            (2, "too short", "s1", "en"),
            (3, _WITH_PII, "s2", "en"),
        ],
        ["doc_id", "text", "source", "lang"],
    )
    card = {r["source"]: r for r in corpus_end_to_end_curation(docs).collect()}
    s1, s2 = card["s1"], card["s2"]
    # budget far above the corpus: everything deduped is admitted
    assert s1["n_budget_kept"] == s1["n_after_dedup"] == 1
    assert s2["n_budget_kept"] == s2["n_after_dedup"] == 1
    assert s1["budget_tokens"] == 25 and s2["budget_tokens"] == 24
    # mixture: sample_n = 2 // 2 = 1 total; equal sqrt-weights → each
    # source targets floor(1 * 0.5) = 0 ... the draw is degenerate at
    # n=2, so just pin the branch invariants
    total_mixed = s1["n_mixed"] + s2["n_mixed"]
    assert total_mixed <= 1
    for row in (s1, s2):
        assert row["n_mixed"] <= row["n_budget_kept"]
        assert row["mixed_tokens"] <= row["budget_tokens"]
        assert (row["n_shards"] >= 1) == (row["n_mixed"] >= 1)
