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
