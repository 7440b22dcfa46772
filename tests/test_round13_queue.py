"""Round-13 promotion queue: library ops + audited oracles, landed a
round ahead of their window slot (the COVERAGE.md deferral arithmetic).
Each op gets the oracle parity check at sf0.001 plus a fixture test
pinning the semantics the oracle alone can't distinguish."""

from __future__ import annotations

from pyspark.sql import functions as F

from edu_online_spark.sources import load_table
from tools.parity import compare, run_oracle


# -- corpus_bigram_simpson ------------------------------------------------


def test_bigram_simpson_matches_r13_oracle(spark, sf_dir):
    from edu_online_spark.operators.textops import ORACLE_R13, bigram_simpson

    problems = compare(
        "corpus_bigram_simpson",
        bigram_simpson(load_table(spark, sf_dir, "documents")),
        run_oracle(ORACLE_R13["corpus_bigram_simpson"], sf_dir),
    )
    assert not problems, problems


def test_bigram_simpson_fixture():
    """A template source (one bigram dominates) must show higher
    Simpson concentration than a diverse one; the index is exactly
    Sigma c_i^2 / total^2 and top1_share is max c / total."""
    from edu_online_spark.session import get_spark
    from edu_online_spark.operators.textops import bigram_simpson

    spark = get_spark()
    docs = spark.createDataFrame(
        [
            # template: "a b" appears in every doc -> 3 of 6 bigrams
            ("t1", "a b c", "tmpl"),
            ("t2", "a b d", "tmpl"),
            ("t3", "a b e", "tmpl"),
            # diverse: all distinct bigrams
            ("d1", "p q r", "div"),
            ("d2", "s t u", "div"),
            ("d3", "v w x", "div"),
        ],
        "doc_id string, text string, source string",
    )
    rows = {r["source"]: r for r in bigram_simpson(docs).collect()}
    t, d = rows["tmpl"], rows["div"]
    # tmpl: bigrams {a b:3, b c:1, b d:1, b e:1} -> num 9+1+1+1=12
    assert (t["total_bigrams"], t["distinct_bigrams"]) == (6, 4)
    assert t["simpson_num"] == 12 and t["top1_cnt"] == 3
    assert t["simpson"] == 12 / 36 and t["top1_share"] == 3 / 6
    # div: six distinct singleton bigrams
    assert (d["total_bigrams"], d["distinct_bigrams"]) == (6, 6)
    assert d["simpson_num"] == 6 and d["simpson"] == 6 / 36
    assert t["simpson"] > d["simpson"]


# -- orders_fulfillment_latency -------------------------------------------


def test_fulfillment_latency_matches_r13_oracle(spark, sf_dir):
    from edu_online_spark.operators.analytics import (
        ORACLE_R13,
        fulfillment_latency,
    )

    problems = compare(
        "orders_fulfillment_latency",
        fulfillment_latency(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
        ),
        run_oracle(ORACLE_R13["orders_fulfillment_latency"], sf_dir),
    )
    assert not problems, problems


def test_fulfillment_latency_order_statistics(spark, sf_dir):
    """The histogram selection must return true order statistics:
    quantiles are monotone, bounded by max, and n_items matches the
    join cardinality."""
    from edu_online_spark.operators.analytics import fulfillment_latency

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    out = fulfillment_latency(orders, lineitem).collect()
    assert out, "no priorities?"
    for r in out:
        assert r["p50_days"] <= r["p90_days"] <= r["p99_days"] <= r["max_days"]
        assert r["n_items"] > 0
    assert sum(r["n_items"] for r in out) == lineitem.count()


def test_fulfillment_latency_fixture_selection_rule():
    """ceil(q*n) selection on a known multiset: n=10 values 1..10 per
    priority -> p50 = value at pos 5, p90 at pos 9, p99 at pos 10."""
    import datetime

    from edu_online_spark.session import get_spark
    from edu_online_spark.operators.analytics import fulfillment_latency

    spark = get_spark()
    d0 = datetime.date(2024, 1, 1)
    orders = spark.createDataFrame(
        [(k, d0, "1-URGENT") for k in range(10)],
        "o_orderkey long, o_orderdate date, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [(k, d0 + datetime.timedelta(days=k + 1)) for k in range(10)],
        "l_orderkey long, l_shipdate date",
    )
    [r] = fulfillment_latency(orders, lineitem).collect()
    assert (r["n_items"], r["p50_days"], r["p90_days"], r["p99_days"],
            r["max_days"]) == (10, 5, 9, 10, 10)


# -- events_dau_wau_stickiness --------------------------------------------


def test_dau_wau_stickiness_matches_r13_oracle(spark, sf_dir):
    from edu_online_spark.operators.analytics import (
        ORACLE_R13,
        dau_wau_stickiness,
    )

    problems = compare(
        "events_dau_wau_stickiness",
        dau_wau_stickiness(load_table(spark, sf_dir, "events")),
        run_oracle(ORACLE_R13["events_dau_wau_stickiness"], sf_dir),
    )
    assert not problems, problems


def test_dau_wau_stickiness_agrees_with_wau(spark, sf_dir):
    """The WAU column must equal the certified weekly_active_users
    relation row-for-row, and DAU can never exceed it."""
    from edu_online_spark.operators.analytics import (
        dau_wau_stickiness,
        weekly_active_users,
    )

    events = load_table(spark, sf_dir, "events")
    st = {r["day"]: r for r in dau_wau_stickiness(events).collect()}
    wau = {r["day"]: r["wau"] for r in weekly_active_users(events).collect()}
    assert set(st) == set(wau)
    for day, r in st.items():
        assert r["wau"] == wau[day]
        assert 0 < r["dau"] <= r["wau"]
        assert r["stickiness"] == r["dau"] / r["wau"]


# -- dedup_savings_by_source ----------------------------------------------


def test_savings_by_source_matches_r13_oracle(spark, sf_dir):
    from edu_online_spark.operators.dedup import ORACLE_R13, savings_by_source

    problems = compare(
        "dedup_savings_by_source",
        savings_by_source(load_table(spark, sf_dir, "documents")),
        run_oracle(ORACLE_R13["dedup_savings_by_source"], sf_dir),
    )
    assert not problems, problems


def test_savings_by_source_consistency(spark, sf_dir):
    """Cross-op invariants: total redundant docs equals the cluster
    size profile's n_dup_docs mass, chars accounting is complete, and
    passing precomputed pairs/clusters reproduces the inline answer."""
    from edu_online_spark.operators.dedup import (
        cluster_size_profile,
        minhash_lsh_pairs,
        near_dup_clusters,
        savings_by_source,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = savings_by_source(docs).collect()
    prof = cluster_size_profile(docs).collect()
    assert sum(r["n_redundant"] for r in out) == sum(
        r["n_dup_docs"] for r in prof
    )
    assert sum(r["n_docs"] for r in out) == docs.count()
    for r in out:
        assert 0 <= r["chars_removed"] <= r["chars_total"]
        assert r["savings_ratio"] == r["chars_removed"] / r["chars_total"]

    pairs = minhash_lsh_pairs(docs).localCheckpoint(eager=True)
    shared = savings_by_source(docs, pairs=pairs).collect()
    via_clusters = savings_by_source(
        docs, clusters=near_dup_clusters(pairs)
    ).collect()
    key = lambda rows: sorted(map(tuple, rows))  # noqa: E731
    assert key(shared) == key(out) == key(via_clusters)
