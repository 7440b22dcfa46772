"""Plan-shape regression tests: the properties that make queries scale
(pushdown, pruning, broadcast, codegen) asserted on the physical plan.
A change that silently drops one of these fails here, not at 100 TB.
"""

from __future__ import annotations

from edu_online_spark.operators.quiz import mastery_agg
from edu_online_spark.operators.synth import quiz_view
from edu_online_spark.operators.tpch import (
    q1_pricing_summary,
    q3_top_orders,
    q5_region_revenue,
)
from edu_online_spark.plans import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)
from edu_online_spark.sources import load_table


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    df = q1_pricing_summary(load_table(spark, sf_dir, "lineitem"))
    pushed = pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), f"shipdate not pushed: {pushed}"
    scans = read_schema_columns(df)
    assert scans, "no parquet scan found"
    # 11-column table; the query needs 7 — pruning must drop the rest
    assert all(len(cols) <= 7 for cols in scans), scans
    assert all("l_comment" not in cols and "l_partkey" not in cols for cols in scans)


def test_q3_broadcasts_dimensions(spark, sf_dir):
    df = q3_top_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )
    assert has_broadcast_join(df)
    # segment + date filters sit on the scans
    pushed = pushed_filters(df)
    assert any("c_mktsegment" in p for p in pushed)
    assert any("o_orderdate" in p for p in pushed)
    assert any("l_shipdate" in p for p in pushed)
    # top-10 must be a bounded TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in explain_str(df, "simple")


def test_q5_no_cartesian_and_broadcasts(spark, sf_dir):
    df = q5_region_revenue(
        *[
            load_table(spark, sf_dir, t)
            for t in ("region", "nation", "customer", "supplier", "orders", "lineitem")
        ]
    )
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert has_broadcast_join(df)


def test_quiz_mastery_single_shuffle(spark, sf_dir):
    df = mastery_agg(quiz_view(load_table(spark, sf_dir, "events")))
    plan = explain_str(df, "simple")
    # one grouping key set → exactly one exchange (partial agg before it)
    assert plan.count("Exchange") == 1, plan
    assert "partial" in plan.lower()


def test_q19_disjunction_is_hash_join(spark, sf_dir):
    """OR of brand/size/qty clauses must NOT degrade to a nested-loop
    join — Catalyst extracts the common equi-key."""
    from edu_online_spark.operators.tpch import q19_disjunctive_revenue

    df = q19_disjunctive_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )
    plan = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ip_lookup_is_bucketed_equi_join(spark, sf_dir):
    """The interval-containment lookup must plan as a broadcast HASH
    join on the bucket key (BETWEEN only as residual), never BNLJ."""
    from edu_online_spark.operators.iplookup import ip_region_counts

    df = ip_region_counts(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "region"),
        spark,
    )
    plan = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert has_broadcast_join(df)


def test_range_join_is_binned_equi_join(spark, sf_dir):
    """purchase_view_window_counts: time-range join via hour bins —
    equi join, no cross product."""
    from edu_online_spark.operators.sessions import purchase_view_window_counts

    df = purchase_view_window_counts(load_table(spark, sf_dir, "events"))
    plan = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # purchase/view filters reach the scans
    pushed = pushed_filters(df)
    assert any("purchase" in p for p in pushed)
    assert any("view" in p for p in pushed)


def test_q21_single_fact_join(spark, sf_dir):
    """The window formulation must evaluate the lineitem⋈orders join
    once — two Scan nodes total, not four."""
    from edu_online_spark.operators.tpch import q21_waiting_suppliers

    df = q21_waiting_suppliers(
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "nation"),
    )
    plan = explain_str(df, "simple")
    assert plan.count("Scan parquet") == 4  # lineitem, orders, supplier, nation


def test_q7_q8_q10_dims_broadcast_facts_pruned(spark, sf_dir):
    """The round-3 TPC-H additions keep the scale shape: date/flag/type
    filters pushed to the fact scan, dimension sides broadcast, no
    cartesian fallback anywhere."""
    from edu_online_spark.operators.tpch import (
        q7_volume_shipping,
        q8_market_share,
        q10_returned_items,
        q15_top_supplier,
    )

    t = {
        n: load_table(spark, sf_dir, n)
        for n in ("region", "nation", "customer", "supplier", "orders", "lineitem", "part")
    }
    q7 = q7_volume_shipping(t["supplier"], t["lineitem"], t["orders"], t["customer"], t["nation"])
    p7 = explain_str(q7)
    assert any("l_shipdate" in p for p in pushed_filters(q7))
    assert has_broadcast_join(q7)
    assert "CartesianProduct" not in p7 and "BroadcastNestedLoopJoin" not in p7

    q8 = q8_market_share(
        t["part"], t["supplier"], t["lineitem"], t["orders"], t["customer"], t["nation"], t["region"]
    )
    p8 = explain_str(q8)
    assert any("p_type" in p for p in pushed_filters(q8))
    assert has_broadcast_join(q8)
    assert "CartesianProduct" not in p8 and "BroadcastNestedLoopJoin" not in p8

    q10 = q10_returned_items(t["customer"], t["orders"], t["lineitem"], t["nation"])
    p10 = explain_str(q10)
    assert any("l_returnflag" in p for p in pushed_filters(q10))
    assert any("o_orderdate" in p for p in pushed_filters(q10))
    assert "TakeOrderedAndProject" in explain_str(q10, "simple")

    q15 = q15_top_supplier(t["supplier"], t["lineitem"])
    p15 = explain_str(q15)
    # scalar max joins back via broadcast, and the lineitem scan is pruned
    assert has_broadcast_join(q15)
    assert any("l_shipdate" in p for p in pushed_filters(q15))


def test_q2_q9_q11_derived_catalog_shapes(spark, sf_dir):
    """Round-4 TPC-H completions (partsupp derived from lineitem): part
    filters pushed to the scan, constant-size dims broadcast, the only
    nested-loop join anywhere is q11's 1-row scalar-threshold broadcast."""
    from edu_online_spark.operators.tpch import (
        q2_min_cost_supplier,
        q9_profit_by_nation,
        q11_important_parts,
    )

    t = {
        n: load_table(spark, sf_dir, n)
        for n in ("region", "nation", "supplier", "orders", "lineitem", "part")
    }
    q2 = q2_min_cost_supplier(t["part"], t["supplier"], t["lineitem"], t["nation"], t["region"])
    p2 = explain_str(q2)
    assert any("p_type" in p for p in pushed_filters(q2))
    assert any("p_size" in p for p in pushed_filters(q2))
    assert has_broadcast_join(q2)
    assert "CartesianProduct" not in p2 and "BroadcastNestedLoopJoin" not in p2
    assert "TakeOrderedAndProject" in explain_str(q2, "simple")

    q9 = q9_profit_by_nation(t["part"], t["supplier"], t["lineitem"], t["orders"], t["nation"])
    p9 = explain_str(q9)
    assert any("p_name" in p for p in pushed_filters(q9))
    assert has_broadcast_join(q9)
    assert "CartesianProduct" not in p9 and "BroadcastNestedLoopJoin" not in p9

    q11 = q11_important_parts(t["supplier"], t["lineitem"], t["nation"], t["region"])
    p11 = explain_str(q11)
    assert any("r_name" in p for p in pushed_filters(q11))
    assert "CartesianProduct" not in p11
    # the scalar total joins back as a 1-row broadcast (BNLJ is the
    # expected physical form of that crossJoin; anything larger would
    # not appear because both join inputs are aggregates)
    assert has_broadcast_join(q11) or "BroadcastNestedLoopJoin" in p11


def test_vocabulary_and_tfidf_plan_shapes(spark, sf_dir):
    """Wordcount must partial-aggregate before its single shuffle and
    take top-k without a global sort; TF-IDF must stay equi-join only."""
    from edu_online_spark.operators.textops import tfidf_top_terms, vocabulary_topk

    docs = load_table(spark, sf_dir, "documents")
    vocab = vocabulary_topk(docs)
    plan = explain_str(vocab, "simple")
    assert "TakeOrderedAndProject" in plan
    assert "partial" in explain_str(vocab).lower()  # map-side combine

    tfidf = tfidf_top_terms(docs)
    p = explain_str(tfidf, "simple")  # one line per node (formatted mode
    # repeats each node in the detail section, breaking counts)
    assert "CartesianProduct" not in p
    # exactly ONE nested-loop join is allowed: the broadcast of the
    # 1-row n_docs aggregate (every engine's scalar-subquery plan);
    # a second one would mean a real join degenerated
    assert p.count("BroadcastNestedLoopJoin") <= 1
    assert has_broadcast_join(tfidf)  # tf⋈df resolved as a hash join


def test_analytics_round3_no_degenerate_joins(spark, sf_dir):
    """Funnel, cohort, and basket queries must stay equi-join only —
    a missed join key degenerates to a nested-loop/cartesian plan that
    dies at scale."""
    from edu_online_spark.operators.analytics import (
        basket_part_pairs,
        cohort_retention,
        events_funnel,
    )

    events = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    for df in (events_funnel(events), cohort_retention(events), basket_part_pairs(li)):
        p = explain_str(df, "simple")
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


def test_pii_ops_stay_in_scan_stage(spark, sf_dir):
    """The PII pass must cost one corpus read: per-doc scan counts are
    pure projection (no exchange at all), and the per-source report is
    one partial-agg shuffle. A regex that fell out of codegen into a
    Python UDF would show up as BatchEvalPython here."""
    from edu_online_spark.operators.pii import (
        pii_redact,
        pii_scan,
        pii_source_stats,
        url_domains,
    )

    docs = load_table(spark, sf_dir, "documents")
    for df in (pii_scan(docs), pii_redact(docs)):
        plan = explain_str(df, "simple")
        assert "BatchEvalPython" not in plan
        assert "Exchange" not in plan  # pure scan-stage projection
        assert "Join" not in plan  # never re-join the corpus to itself

    stats = pii_source_stats(docs)
    p = explain_str(stats, "simple")
    assert "BatchEvalPython" not in p
    assert "Join" not in p
    assert "partial" in explain_str(stats).lower()  # map-side combine

    dom = url_domains(docs)
    p = explain_str(dom, "simple")
    assert "BatchEvalPython" not in p
    assert "partial" in explain_str(dom).lower()


def test_time_grain_rollup_reuses_daily_grain(spark, sf_dir):
    """The month/year grains must fold over the materialized daily
    aggregate, not re-scan the fact table: after construction the
    union plan contains ZERO parquet scans (the single scan ran once,
    into the daily checkpoint)."""
    from edu_online_spark.operators.analytics import time_grain_rollup

    df = time_grain_rollup(load_table(spark, sf_dir, "events"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 0, plan
    grains = {r["grain"] for r in df.select("grain").distinct().collect()}
    assert grains == {"day", "month", "year"}


def test_encode_documents_bounded_vocab_and_broadcast(spark, sf_dir):
    """Vocab ranking must be a bounded TakeOrdered (not a global sort
    over all distinct tokens) and the token->id join must broadcast the
    vocab side."""
    from edu_online_spark.operators.textops import encode_documents

    df = encode_documents(load_table(spark, sf_dir, "documents"))
    plan = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in plan
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in plan


def test_pack_training_sequences_no_global_sort(spark, sf_dir):
    """Packing must stay parallel per source: the window sort is
    within hash partitions — no rangepartitioning (global sort)
    anywhere in the plan."""
    from edu_online_spark.operators.textops import pack_training_sequences

    df = pack_training_sequences(load_table(spark, sf_dir, "documents"))
    plan = explain_str(df, "simple")
    assert "rangepartitioning" not in plan
    assert "hashpartitioning" in plan


def test_gopher_rules_stay_in_scan_stage(spark, sf_dir):
    """The quality gate must cost one corpus read: pure HOF column
    projections, no exchange, no join, no Python. A rule that fell out
    of codegen into BatchEvalPython would 100×-cost the 100 TB scan."""
    from edu_online_spark.operators.textops import gopher_quality_rules

    df = gopher_quality_rules(load_table(spark, sf_dir, "documents"))
    plan = explain_str(df, "simple")
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_stratified_sample_single_stratum_shuffle(spark, sf_dir):
    """Top-k-per-stratum: exactly one exchange (hash-partition on
    source), no global sort — the window sorts within strata only."""
    from edu_online_spark.operators.textops import stratified_sample

    df = stratified_sample(load_table(spark, sf_dir, "documents"))
    plan = explain_str(df, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan  # no global sort
    assert "BatchEvalPython" not in plan


def test_snapshot_diff_prunes_to_two_columns(spark, sf_dir):
    """The diff reads only (doc_id, text) from each snapshot — column
    pruning must reach both scans; no nested-loop fallback."""
    from edu_online_spark.operators.textops import corpus_snapshot_diff

    df = corpus_snapshot_diff(load_table(spark, sf_dir, "documents"))
    plan = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    scans = read_schema_columns(df)
    assert scans and all(set(c) <= {"doc_id", "text"} for c in scans), scans


def test_training_examples_single_user_shuffle(spark, sf_dir):
    """Point-in-time features must come from running windows over ONE
    user_id shuffle — no per-label self-join re-aggregation."""
    from edu_online_spark.operators.sessions import purchase_training_examples

    df = purchase_training_examples(load_table(spark, sf_dir, "events"))
    plan = explain_str(df, "simple")
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_record_linkage_blocking_is_equi_join(spark, sf_dir):
    """The candidate stage must be the composite (nation, name-suffix)
    equi-join (blocking), not a nested-loop cross of dirty x clean."""
    from edu_online_spark.operators.analytics import customer_record_linkage

    df = customer_record_linkage(load_table(spark, sf_dir, "customer"))
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    # the composite block key must be part of the join condition (the
    # formatted plan prints the equi-join keys)
    formatted = explain_str(df, "formatted")
    assert "_d_bk" in formatted and "_c_bk" in formatted


def test_decoded_meta_single_python_stage(spark, sf_dir):
    """The decode stage must be exactly ONE Arrow-batched Python pass
    over a pruned scan: no shuffle, no extra Python stages, and only
    the three decoder-needed columns crossing the boundary (the meta
    JSON and stored byte_len stay JVM-side). This pins the round-5
    perf fix — decoded_meta's cost is scan → Arrow → parse, full stop."""
    from edu_online_spark.operators.multimodal import q_decoded_meta

    df = q_decoded_meta(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert plan.count("ArrowEvalPython") == 0  # mapInPandas, not UDF eval
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    scans = read_schema_columns(df)
    assert scans and all("meta" not in cols for cols in scans), scans


def test_curation_pipeline_shapes(spark, sf_dir):
    """The end-to-end curation composition: no cartesian anywhere, no
    Python in the plan (every stage is column expressions or the banded
    join), the loser anti-join broadcast, and (round 7) the release
    branch present — its ONLY nested-loop join is the mixture stage's
    1-row broadcast normalizer."""
    from edu_online_spark.operators.curation import corpus_end_to_end_curation

    df = corpus_end_to_end_curation(load_table(spark, sf_dir, "documents"))
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    # temperature_mixture_sample's 1-row normalizer crossJoin runs
    # inside the eager `mixed` checkpoint — the deliverable plan keeps
    # zero nested-loop joins
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # losers anti-join + card joins
    # release-branch shard prefix sum present downstream of the eager
    # checkpoints: the per-bucket cumsum + tiny offsets window, plus the
    # stratified rank window (budget fill's windows run inside bkept's
    # checkpoint and don't appear in the deliverable plan)
    assert plan.count("Window") >= 3


def test_substring_dedup_and_hashing_plan_shapes(spark, sf_dir):
    """Round-5 late additions stay declarative: substring dedup's span
    explode + anti-join, the feature hasher, and the hashed KNN's
    sparse dot-product join — no cartesian, no Python anywhere, scans
    pruned to (doc_id, text)."""
    from edu_online_spark.operators.dedup import substring_dedup
    from edu_online_spark.operators.textops import (
        feature_hash_vectors,
        hashed_knn,
    )

    docs = load_table(spark, sf_dir, "documents")
    for df in (
        substring_dedup(docs),
        feature_hash_vectors(docs),
        hashed_knn(docs),
    ):
        plan = explain_str(df, "simple")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        scans = read_schema_columns(df)
        assert scans and all(
            set(cols) <= {"doc_id", "text"} for cols in scans
        ), scans


def test_hybrid_lsh_no_corpus_cross(spark, sf_dir):
    """The LSH-fed hybrid path must generate candidates via banded
    equi-joins — the corpus never self-crosses, and the only Python is
    the Arrow-batched SRP bucketizer."""
    from edu_online_spark.operators.similarity import hybrid_search_rrf_lsh_topk

    df = hybrid_search_rrf_lsh_topk(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
    )
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time Python banned


def test_round6_session_trio_plan_shapes(spark, sf_dir):
    """Shard manifest, label-noise mining, and the bloom pre-filter
    stay declarative: zero Python, no cartesian fact×fact product, and
    scans pruned to the columns each op actually reads. The bloom
    probe path must resolve to broadcast joins (its whole point is
    that the probe side never shuffles)."""
    from edu_online_spark.operators.similarity import label_noise_candidates
    from edu_online_spark.operators.sketches import bloom_membership_audit
    from edu_online_spark.operators.textops import shard_manifest

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    man = shard_manifest(docs)
    plan = explain_str(man, "simple")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    scans = read_schema_columns(man)
    assert scans and all(
        set(cols) <= {"doc_id", "text", "source"} for cols in scans
    ), scans

    noise = label_noise_candidates(emb)
    plan = explain_str(noise, "simple")
    # the only product is the broadcast × 1-row centroid-matrix join
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # r7 map-side rewrite: the per-vec_id nearest-other ranking window
    # (an n·L shuffle) must never come back — selection happens inside
    # each row via array expressions
    assert "Window" not in plan
    scans = read_schema_columns(noise)
    assert scans and all(
        set(cols) <= {"vec_id", "embedding", "label"} for cols in scans
    ), scans

    bloom = bloom_membership_audit(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
    )
    plan = explain_str(bloom, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert has_broadcast_join(bloom)
    scans = read_schema_columns(bloom)
    assert scans and all(
        set(cols) <= {"c_custkey"} or set(cols) <= {"o_custkey"}
        for cols in scans
    ), scans


def test_round7_textops_plan_shapes(spark, sf_dir):
    """Novelty, vocab overlap, winnowing, and the exact length report
    stay declarative: no Python anywhere, no data-sized cartesian (the
    only non-equi join is the S×S source-size grid), scans pruned to
    the columns each op reads."""
    from edu_online_spark.operators.textops import (
        length_quantiles_exact,
        ngram_novelty,
        source_vocab_overlap,
        winnowing_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents")
    for df, cols in (
        (ngram_novelty(docs), {"doc_id", "text"}),
        (winnowing_fingerprints(docs), {"doc_id", "text"}),
        (winnowing_fingerprints(docs, variant="poly"), {"doc_id", "text"}),
        (length_quantiles_exact(docs), {"source", "text"}),
    ):
        plan = explain_str(df, "simple")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        scans = read_schema_columns(df)
        assert scans and all(set(c) <= cols for c in scans), scans

    ov = source_vocab_overlap(docs)
    plan = explain_str(ov, "simple")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    scans = read_schema_columns(ov)
    assert scans and all(set(c) <= {"source", "text"} for c in scans), scans


def test_winnowing_overlap_plan_shape(spark, sf_dir):
    """Overlap pairing stays a keyed fp equi-join behind the df cap —
    no cartesian, no Python. The fingerprint relation is materialized
    once (eager checkpoint — its scan pruning is asserted by
    test_round7_textops_plan_shapes on the un-checkpointed form), so
    the overlap plan itself must contain no parquet scan at all."""
    from edu_online_spark.operators.textops import winnowing_overlap_pairs

    df = winnowing_overlap_pairs(load_table(spark, sf_dir, "documents"))
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Scan parquet" not in plan  # reads the checkpointed fps only


def test_multipass_linkage_plan_shape(spark, sf_dir):
    """The sorted-neighborhood pass must stay keyed: bucketed rank
    windows (never a single global sort partition over records), a
    band equi-join for the neighborhood pairing, and no cartesian or
    data-sized nested loop anywhere in the two-pass union."""
    from pyspark.sql import functions as F

    from edu_online_spark.operators.analytics import link_records_multipass

    c = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long").cast("string")
    clean = c.select(
        F.col("c_custkey").alias("cand_key"),
        F.col("c_nationkey").alias("c_nation"),
        F.concat(F.col("c_name"), F.lit("|"), cents).alias("c_rec"),
    )
    dirty = c.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("true_key"),
        F.col("c_nationkey").alias("d_nation"),
        F.concat(F.col("c_name"), F.lit("|9"), cents).alias("d_rec"),
    )
    df = link_records_multipass(dirty, clean)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_weighted_sample_zero_shuffle_topk(spark, sf_dir):
    """The weighted top-k sample must stay a bounded TakeOrdered over a
    pruned 3-column scan — zero exchanges; a regression to a global
    sort or a shuffle would change the 100 TB cost class."""
    from edu_online_spark.operators.textops import weighted_sample

    df = weighted_sample(load_table(spark, sf_dir, "documents"))
    plan = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("Exchange") == 0, plan
    scans = read_schema_columns(df)
    assert scans and all(len(cols) <= 3 for cols in scans), scans


def test_rademacher_sketch_zero_shuffle_scan(spark, sf_dir):
    """The JL sketch is one scan stage: no exchange, no join, and the
    scan reads only (vec_id, embedding)."""
    from edu_online_spark.operators.similarity import rademacher_sketch

    df = rademacher_sketch(load_table(spark, sf_dir, "embeddings"))
    plan = explain_str(df, "simple")
    assert plan.count("Exchange") == 0, plan
    assert "Join" not in plan, plan
    scans = read_schema_columns(df)
    assert scans and all(len(cols) <= 2 for cols in scans), scans


def test_fulfillment_latency_histogram_selection(spark, sf_dir):
    """The exact-quantile plan must be histogram-shaped: the only sort
    feeding a window runs over the (priority, days) count relation —
    no corpus-grain global sort — and the orderkey join must not
    degrade to a nested loop."""
    from edu_online_spark.operators.analytics import fulfillment_latency

    df = fulfillment_latency(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # partial aggregation must sit below the histogram exchange so the
    # corpus collapses map-side before any shuffle
    assert "partial" in plan.lower()


def test_inter_arrival_profile_single_exchange(spark, sf_dir):
    """The per-user arrival profile must be ONE user_id exchange
    (lag window + grouped sorted-fold reuse the same partitioning):
    a second exchange would mean the groupBy lost the window's
    partitioning; any join or Python stage would change the cost
    class."""
    from edu_online_spark.operators.analytics import inter_arrival_profile

    df = inter_arrival_profile(load_table(spark, sf_dir, "events"))
    plan = explain_str(df, "simple")
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ngram_jaccard_prefix_no_cartesian(spark, sf_dir):
    """The prefix-filtered exact path is deliberately join-heavy (df
    ranking + candidate + verify), but every join must stay an
    equi-join on shingle/doc keys — a CartesianProduct or broadcast
    nested loop would mean the prefix key fell out of a join
    condition; and the whole pipeline stays JVM-side."""
    from edu_online_spark.operators.dedup import ngram_jaccard_pairs_prefix

    df = ngram_jaccard_pairs_prefix(load_table(spark, sf_dir, "documents"))
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fulfillment_latency_histogram_plan(spark, sf_dir):
    """The latency quantiles must read off the (priority, days)
    HISTOGRAM: one equi-join (no cartesian/nested-loop), the
    map-side-combined count before the cumulative window, everything
    JVM-side. A corpus-sized sort would show as an extra exchange."""
    from edu_online_spark.operators.analytics import fulfillment_latency

    df = fulfillment_latency(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("Exchange") <= 3, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# Partition-less windows allowed in the CURRENT driver window, with
# the boundedness argument for each input relation. A window spec with
# no partition key moves its whole input through ONE task, so the only
# acceptable ones are those whose input is bounded BY CONSTRUCTION —
# never corpus/row-grain. customer_rfm shipped exactly that defect and
# sat certified-green for five rounds (VERDICT r13 #4); this pin makes
# the class mechanically impossible to reintroduce through the window
# (every new/changed query takes a window slot the round it lands, so
# it is audited at birth). Full-registry sweep: tools/window_audit.py.
PARTITIONLESS_WINDOW_ALLOWLIST: dict[str, int] = {
    # ≤32-row bucket-offset relations of the distributed prefix sum
    # (token_budget_cap machinery — the heavy cum is partitioned by
    # bucket; only the tiny offset table is globally ordered)
    "corpus_end_to_end_curation": 1,
    "corpus_shard_manifest": 1,
    "corpus_shards_incremental": 1,
    "docs_quality_budget_fill": 1,
    # same bucketed-prefix shape: the pareto's global windows run on
    # the bucket-offset `pid` relation, not the supplier rows
    "lineitem_supplier_pareto": 2,
    # |distinct df values| / |distinct degree| rows (dozens) — the
    # spectrum share windows
    "corpus_shingle_df_spectrum": 1,
    "dedup_pair_degree_spectrum": 1,
    # the composed diagnostics inherit exactly the degree-spectrum
    # share window above (the other four consumers are window-free or
    # cluster-partitioned)
    "dedup_diagnostics_composed": 1,
    # DAY-grain median/MAD selection windows (calendar-bounded, same
    # envelope as events_daily_anomalies)
    "events_daily_mad_anomalies": 6,
    # two SUM(n) OVER () shares over the 9-row leading-digit relation
    "lineitem_price_benford": 2,
    # rank windows over a LIMIT-bounded head: both ops take the top-N
    # vocabulary via TakeOrderedAndProject (bounded per-partition
    # heaps) FIRST and only window the ≤N-row result — constant-size
    # by construction, never the full vocabulary
    "corpus_vocab_coverage": 1,
    "docs_vocab_encoded": 1,
    # CALENDAR-grain cums (day/minute relations — decades < 10⁴ rows)
    "daily_revenue_ma7": 2,
    "events_daily_anomalies": 6,
    "orders_open_backlog": 1,
    "purchases_minutely_gapfill": 1,
    # CUSUM closed form: two whole-relation aggs (n_days, total) + two
    # running sums + two running mins + the two alarm reads, all over
    # the DAY-grain relation (calendar-bounded — the daily_anomalies
    # envelope)
    "events_cusum_level_shift": 8,
    # the two exact global rank windows permutation Spearman is
    # DEFINED by — the op is GUARDED at SPEARMAN_EXACT_MAX_ROWS
    # rankable rows (checkpoint-then-count preflight) and its refusal
    # names quality_length_spearman_banded, the window-free scale path
    # (the _guard_all_pairs contract; §4-r14b)
    "docs_quality_spearman": 2,
    # BH rank window over the |event types|-row testable relation
    # (dictionary-bounded by construction; the spec appears twice —
    # the rejected and k* branches each derive ranks from the
    # CHECKPOINTED type-grain relation, so neither re-runs the corpus
    # aggregates. Queued R19 — inert in this pin until the op takes
    # its window slot, justified here at birth)
    "events_ab_fdr_bh": 2,
}


def test_driver_window_has_no_unjustified_global_sorts(spark, sf_dir):
    """Every partition-less window spec in any of the 50 driver-window
    queries' plans must be on the justified allowlist above, with the
    exact spec count pinned — a new query smuggling a row-grain global
    sort fails here in its landing round."""
    from edu_online_spark import registry
    from tools.window_audit import partitionless_specs

    qs = registry.queries()
    window = list(qs)[:50]
    found: dict[str, int] = {}
    for name in window:
        plan = explain_str(qs[name](spark, sf_dir), "simple")
        specs = partitionless_specs(plan)
        if specs:
            found[name] = len(specs)
    assert found == {
        k: v for k, v in PARTITIONLESS_WINDOW_ALLOWLIST.items() if k in set(window)
    }, found


def test_customer_rfm_no_global_sort_plan(spark, sf_dir):
    """VERDICT r13 #4: the quartile assignment must be threshold
    bucketing, never a customer-grain total-order window. Pin: no
    ntile anywhere, and EVERY window spec in the plan is partitioned
    (by the melted selection helper's `metric` key, then `pick` — each
    partition is one coarse bucket's value histogram for one metric,
    bounded by the domain arguments in the docstring). The only
    nested-loop joins are the bounded bucket-prior range join and the
    1-row threshold normalizers."""
    from edu_online_spark.operators.analytics import customer_rfm

    df = customer_rfm(load_table(spark, sf_dir, "orders"))
    plan = explain_str(df, "simple")
    assert "ntile" not in plan, plan
    specs = [
        seg for seg in plan.split("windowspecdefinition(")[1:]
    ]
    assert specs, "expected the selection windows in the plan"
    for seg in specs:
        assert seg.lstrip().startswith("metric#"), (
            "partition-less window spec found: " + seg[:120]
        )
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_window_audit_reports_unplannable_distinctly(spark):
    """ADVICE r14 #1: a query whose runner raises (guard refusal,
    missing data, import error) must surface in the audit's
    unplannable dict with its diagnostic — never fold into the
    findings as a zero-spec row that prints as a clean pass."""
    from tools.window_audit import _audit_queries

    def fine(s, d):
        return s.range(3)

    def broken(s, d):
        raise ValueError("guard refusal: use the_scale_path")

    findings, unplannable = _audit_queries(
        {"fine": fine, "broken": broken}, spark, "unused", ["fine", "broken"]
    )
    assert findings == {}
    assert unplannable == {
        "broken": "ValueError: guard refusal: use the_scale_path"
    }


def test_customer_rfm_ties_share_quartiles(spark, sf_dir):
    """Threshold semantics: equal metric values can never straddle a
    quartile boundary (the property the old o_custkey-tiebroken ntile
    violated), and every quartile is populated at this SF."""
    from pyspark.sql import functions as F

    from edu_online_spark.operators.analytics import customer_rfm

    df = customer_rfm(load_table(spark, sf_dir, "orders")).cache()
    try:
        for metric, quart in [
            ("recency_days", "r_quartile"),
            ("frequency", "f_quartile"),
            ("monetary", "m_quartile"),
        ]:
            split = (
                df.groupBy(metric)
                .agg(F.countDistinct(quart).alias("nq"))
                .filter(F.col("nq") > 1)
                .count()
            )
            assert split == 0, f"{metric}: tied values straddle quartiles"
            got = {r[0] for r in df.select(quart).distinct().collect()}
            assert got == {1, 2, 3, 4}, (quart, got)
    finally:
        df.unpersist()


def test_dau_wau_stickiness_single_spine_plan(spark, sf_dir):
    """One corpus scan, no join: the distinct (day,user) spine feeds
    the ≤7-day explode and ONE aggregate computes both counts."""
    from edu_online_spark.operators.analytics import dau_wau_stickiness

    df = dau_wau_stickiness(load_table(spark, sf_dir, "events"))
    plan = explain_str(df, "simple")
    assert "Join" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bigram_simpson_no_join_plan(spark, sf_dir):
    """Explode → two map-side-combined aggregates; no join anywhere,
    and the whole pipeline is JVM-side."""
    from edu_online_spark.operators.textops import bigram_simpson

    df = bigram_simpson(load_table(spark, sf_dir, "documents"))
    plan = explain_str(df, "simple")
    assert "Join" not in plan, plan
    assert "partial" in plan.lower(), plan  # map-side combine present
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_savings_by_source_keyed_joins_plan(spark, sf_dir):
    """Downstream of the LSH pairs the savings report is loser-marking
    plus two per-source aggregates — every join an equi-join, no
    cartesian, JVM-side end to end."""
    from edu_online_spark.operators.dedup import savings_by_source

    df = savings_by_source(load_table(spark, sf_dir, "documents"))
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_r15_queue_plan_shapes(spark, sf_dir):
    """The round-15 queue holds its plan discipline while it waits
    (the Gini-guard lesson): spectrum = explode + two aggs, no join;
    HHI = the Gini op's join tree (one broadcast on nation, no
    cartesian); norm deciles = ONE label exchange (rank window and
    count share the partitioning); calibration = banded equi-joins
    only. All JVM-side."""
    from edu_online_spark.operators.analytics import supplier_revenue_hhi
    from edu_online_spark.operators.dedup import minhash_calibration
    from edu_online_spark.operators.similarity import norm_deciles
    from edu_online_spark.operators.textops import shingle_df_spectrum

    docs = load_table(spark, sf_dir, "documents")

    spectrum = explain_str(shingle_df_spectrum(docs), "simple")
    assert "Join" not in spectrum, spectrum
    assert "BatchEvalPython" not in spectrum and "ArrowEvalPython" not in spectrum

    hhi = explain_str(
        supplier_revenue_hhi(
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "supplier"),
            load_table(spark, sf_dir, "nation"),
        ),
        "simple",
    )
    assert "CartesianProduct" not in hhi and "BroadcastNestedLoopJoin" not in hhi
    assert "BroadcastHashJoin" in hhi, hhi
    assert "BatchEvalPython" not in hhi and "ArrowEvalPython" not in hhi

    nd = explain_str(
        norm_deciles(load_table(spark, sf_dir, "embeddings")), "simple"
    )
    assert nd.count("Exchange") == 1, nd
    assert "Join" not in nd, nd
    assert "BatchEvalPython" not in nd and "ArrowEvalPython" not in nd

    cal = explain_str(minhash_calibration(docs), "simple")
    assert "CartesianProduct" not in cal, cal
    assert "BroadcastNestedLoopJoin" not in cal, cal
    assert "BatchEvalPython" not in cal and "ArrowEvalPython" not in cal


def test_user_activity_gini_histogram_plan(spark, sf_dir):
    """Gini-via-histogram must never sort a population: no join, no
    Python stage, map-side combines present, and the only window runs
    over the (type, count) histogram — a population-sized rank window
    would add exchanges past the pinned bound."""
    from edu_online_spark.operators.analytics import user_activity_gini

    df = user_activity_gini(load_table(spark, sf_dir, "events"))
    plan = explain_str(df, "simple")
    assert "Join" not in plan, plan
    assert "partial" in plan.lower(), plan
    assert plan.count("Exchange") <= 4, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pair_degree_spectrum_keyed_plan(spark, sf_dir):
    """Downstream of the banded LSH pairs the spectrum is a keyed
    degree count + a doc_id left join + a tiny histogram — no
    cartesian anywhere, JVM-side end to end."""
    from edu_online_spark.operators.dedup import pair_degree_spectrum

    df = pair_degree_spectrum(load_table(spark, sf_dir, "documents"))
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_r16_queue_plan_shapes(spark, sf_dir):
    """The round-16 queue's plan discipline: the Wilson interval is
    ONE map-side-combined exchange and nothing else; the MAD screen's
    only nested-loop joins are the deliberate 1-ROW scalar broadcasts
    (median, MAD) onto the calendar-bounded day-grain relation — the
    corpus is touched by exactly one aggregation; the lift ranking is
    keyed equi-joins only. All JVM-side."""
    from edu_online_spark.operators.analytics import (
        daily_mad_anomalies,
        supplier_return_rate_wilson,
    )
    from edu_online_spark.operators.textops import bigram_lift_topk

    wilson = explain_str(
        supplier_return_rate_wilson(load_table(spark, sf_dir, "lineitem")),
        "simple",
    )
    assert wilson.count("Exchange") == 1, wilson
    assert "Join" not in wilson, wilson
    assert "BatchEvalPython" not in wilson and "ArrowEvalPython" not in wilson

    mad = explain_str(
        daily_mad_anomalies(load_table(spark, sf_dir, "events")), "simple"
    )
    assert "CartesianProduct" not in mad, mad
    # scalar broadcasts are the ONLY nested-loop joins allowed here
    assert mad.count("BroadcastNestedLoopJoin") <= 3, mad
    assert "partial" in mad.lower(), mad
    assert "BatchEvalPython" not in mad and "ArrowEvalPython" not in mad

    lift = explain_str(
        bigram_lift_topk(load_table(spark, sf_dir, "documents")), "simple"
    )
    assert "CartesianProduct" not in lift, lift
    assert "BroadcastNestedLoopJoin" not in lift, lift
    assert "BatchEvalPython" not in lift and "ArrowEvalPython" not in lift


def test_r17_queue_plan_shapes(spark, sf_dir):
    """The round-17 queue's plan discipline. CUSUM and the z-test each
    touch the corpus with exactly one map-side-combined aggregation
    and run join-free (the z-test's first-seen window and user groupBy
    share ONE user_id exchange). The heavy-hitters pass is the one
    deliberate MapInPandas (the bounded Misra-Gries summary), its
    candidate probe a BroadcastHashJoin and its total the 1-row
    broadcast normalizer — never a cartesian, never a sort-merge of
    the token stream. NDCG is broadcast joins only."""
    from edu_online_spark.operators.analytics import (
        ab_conversion_ztest,
        cusum_level_shift,
    )
    from edu_online_spark.operators.similarity import label_ndcg
    from edu_online_spark.operators.textops import token_heavy_hitters

    for op, table in (
        (cusum_level_shift, "events"),
        (ab_conversion_ztest, "events"),
    ):
        plan = explain_str(op(load_table(spark, sf_dir, table)), "simple")
        assert plan.count("Exchange") == 2, plan
        assert "Join" not in plan, plan
        assert "partial" in plan.lower(), plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    hh = explain_str(
        token_heavy_hitters(load_table(spark, sf_dir, "documents")),
        "simple",
    )
    assert hh.count("MapInPandas") == 1, hh
    assert hh.count("BroadcastHashJoin") == 1, hh
    assert hh.count("BroadcastNestedLoopJoin") == 1, hh  # 1-row total
    assert "CartesianProduct" not in hh and "SortMergeJoin" not in hh, hh

    ndcg = explain_str(
        label_ndcg(load_table(spark, sf_dir, "embeddings")), "simple"
    )
    assert "CartesianProduct" not in ndcg, ndcg
    assert "SortMergeJoin" not in ndcg, ndcg
    assert "BatchEvalPython" not in ndcg and "ArrowEvalPython" not in ndcg


def test_r18_queue_plan_shapes(spark, sf_dir):
    """The round-18 queue's plan discipline: OLS is ONE map-side-
    combined aggregate, join-free; TVD's only broadcasts are the
    |sources|-row totals (plus the 1-row corpus total) onto the pair
    relation — no source × vocabulary materialization, no cartesian
    of data; the survival curve's single data exchange is user_id
    (window + groupBy shared) with a 1-row observation-end
    normalizer. All JVM-side."""
    from edu_online_spark.operators.analytics import (
        activation_survival,
        price_qty_ols,
    )
    from edu_online_spark.operators.textops import source_token_tvd

    ols = explain_str(
        price_qty_ols(load_table(spark, sf_dir, "lineitem")), "simple"
    )
    assert ols.count("Exchange") == 1, ols
    assert "Join" not in ols, ols
    assert "partial" in ols.lower(), ols

    tvd = explain_str(
        source_token_tvd(load_table(spark, sf_dir, "documents")), "simple"
    )
    assert "CartesianProduct" not in tvd, tvd
    assert tvd.count("BroadcastNestedLoopJoin") <= 1, tvd  # 1-row total
    assert tvd.count("BroadcastHashJoin") == 1, tvd  # src totals probe
    assert "BatchEvalPython" not in tvd and "ArrowEvalPython" not in tvd

    surv = explain_str(
        activation_survival(load_table(spark, sf_dir, "events")), "simple"
    )
    assert "CartesianProduct" not in surv, surv
    assert surv.count("BroadcastNestedLoopJoin") <= 1, surv  # obs end
    assert "BatchEvalPython" not in surv and "ArrowEvalPython" not in surv

    from edu_online_spark.operators.analytics import (
        ab_srm_check,
        ab_value_mannwhitney,
    )

    for op in (ab_value_mannwhitney, ab_srm_check):
        plan = explain_str(op(load_table(spark, sf_dir, "events")), "simple")
        assert "Join" not in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_r19_queue_plan_shapes(spark, sf_dir):
    """Round-19 queue plan discipline: the effect size is ONE
    map-side-combined aggregate, join-free; KS is a value-grain
    aggregate + the exact-ECDF running window + a 1-row totals
    normalizer — no cartesian of data, all JVM-side."""
    from edu_online_spark.operators.analytics import (
        ab_value_effect_size,
        ab_value_ks_test,
    )

    eff = explain_str(
        ab_value_effect_size(load_table(spark, sf_dir, "events")), "simple"
    )
    assert eff.count("Exchange") == 1, eff
    assert "Join" not in eff, eff
    assert "partial" in eff.lower(), eff

    ks = explain_str(
        ab_value_ks_test(load_table(spark, sf_dir, "events")), "simple"
    )
    assert "CartesianProduct" not in ks, ks
    assert ks.count("BroadcastNestedLoopJoin") <= 1, ks  # 1-row totals
    assert "BatchEvalPython" not in ks and "ArrowEvalPython" not in ks

    from edu_online_spark.operators.analytics import ab_quantile_uplift

    up = explain_str(
        ab_quantile_uplift(load_table(spark, sf_dir, "events")), "simple"
    )
    assert up.count("Exchange") == 1, up  # one event_type partial agg
    assert "Join" not in up, up
