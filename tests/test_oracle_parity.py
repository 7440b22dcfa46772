"""Fast oracle-parity regression: a representative slice of the
registry compared against DuckDB at sf0.001 on every pytest run (the
full 43-query sweep lives in tools/parity.py, driver-run at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tools.parity import compare, run_oracle

REPRESENTATIVE = [
    "register_platform_counts",
    "register_sliding_counts",
    "quiz_mastery",
    "page_flow",
    "tpch_q1_pricing_summary",
    "tpch_q5_region_revenue",
    "events_sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_knn_bruteforce",
    "text_fingerprints",
    "multimodal_decoded_meta",
    "orders_rollup",
    "purchase_attribution",
    "customer_record_linkage",
    "corpus_end_to_end_curation",
    # round 8: promoted library ops
    "customer_record_linkage_multipass",
    "docs_winnowing_clusters",
    # round 10: promoted probe + new ops
    "dedup_cross_corpus_probe",
    "lineitem_supplier_pareto",
    "orders_open_backlog",
    "docs_dup_inflation",
    "dedup_cluster_size_profile",
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_query_matches_oracle(spark, sf_dir, name):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    problems = compare(name, qs[name](spark, sf_dir), run_oracle(oracles[name], sf_dir))
    assert not problems, problems
