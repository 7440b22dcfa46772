"""Relational query suite over the star schema (TPC-H-style).

The reference implements NO joins, sorts, top-k, or set ops (SURVEY
§2.5-2.6) — a complete engine needs them, so this module provides the
canonical shapes: scan→agg (Q1), selective 3-way join + top-k (Q3),
6-way snowflake join (Q5), windowed top-k per group, and set ops.

Determinism-for-oracle note: double SUMs are order-dependent, so every
money aggregate casts to exact DECIMAL first, sums exactly, and casts
the final value to DOUBLE — bit-identical in any engine regardless of
partitioning, which is what lets a 32-way parallel Spark run hash-match
single-threaded DuckDB.

Scale notes per query are inline. The unifying choices: filters sit
directly on scans (parquet pushdown), dimension tables broadcast (no
shuffle of the fact table for Q3/Q5 probe sides), aggregations rely on
partial combine, and top-k uses a bounded sort (TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table

# Exact-arithmetic casts: prices have 2 decimals, rates (discount/tax) 2.
_DEC_PRICE = "decimal(12,2)"
_DEC_RATE = "decimal(4,2)"


def _dec(col: str, t: str = _DEC_PRICE) -> F.Column:
    return F.col(col).cast(t)


def _one_minus(col: str) -> F.Column:
    return F.lit(1).cast("decimal(3,2)") - _dec(col, _DEC_RATE)


def _one_plus(col: str) -> F.Column:
    return F.lit(1).cast("decimal(3,2)") + _dec(col, _DEC_RATE)


_SHIP_CUTOFF = "1998-12-01"


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1: scan → filter → 4-group agg.

    Plan shape at scale: parquet scan with l_shipdate pushed down +
    column pruning to 7 cols, partial HashAggregate per partition, one
    shuffle of (flag,status) partials (≤ 6 rows per task), final agg.
    """
    disc_price = _dec("l_extendedprice") * _one_minus("l_discount")
    charge = disc_price * _one_plus("l_tax")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(_SHIP_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
    )


def q3_top_orders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3: BUILDING-segment revenue top 10.

    customer (segment-filtered) and orders (date-filtered) both broadcast
    at small SF; at 100 TB orders exceeds the threshold and AQE picks a
    shuffle join on o_orderkey — lineitem is already the probe side
    either way, never re-partitioned twice. Top-10 compiles to
    TakeOrderedAndProject: per-partition bounded heaps, no global sort.
    """
    cutoff = F.lit("1998-06-01").cast("timestamp_ntz")
    revenue = _dec("l_extendedprice") * _one_minus("l_discount")
    cust = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.filter(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(F.broadcast(ords), li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q5_region_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5: ASIA revenue per nation, local supplier = local customer.

    Snowflake join order keeps lineitem as the single streaming fact:
    region⋈nation (25 rows) and supplier broadcast; orders⋈customer
    carries the customer's nation; the final equi-condition
    c_nationkey = s_nationkey filters to intra-nation commerce.
    """
    cutoff_lo = F.lit("1996-01-01").cast("timestamp_ntz")
    cutoff_hi = F.lit("1998-01-01").cast("timestamp_ntz")
    revenue = _dec("l_extendedprice") * _one_minus("l_discount")
    nat = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    cust = customer.join(
        F.broadcast(nat), customer.c_nationkey == nat.n_nationkey
    ).select("c_custkey", "c_nationkey", "n_name")
    ords = orders.filter(
        (F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi)
    ).select("o_orderkey", "o_custkey")
    sup = supplier.select("s_suppkey", "s_nationkey")
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(ords), F.col("l_orderkey") == ords.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6: pure filter→sum — the pushdown showcase. All three
    predicates reach the parquet scan; the aggregate is a single
    partial+final sum of exact decimals."""
    rev = _dec("l_extendedprice") * _dec("l_discount", _DEC_RATE)
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


def top_parts_per_brand(part: DataFrame, k: int = 3) -> DataFrame:
    """Windowed top-k per group: k priciest parts per brand.

    row_number over (brand, price desc, partkey) — deterministic
    tie-break so the oracle reproduces the exact row set. One shuffle on
    p_brand; with AQE, skewed brands split automatically.
    """
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        part.select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def users_purchase_no_error(events: DataFrame) -> DataFrame:
    """Set op EXCEPT: users who purchased and never hit an error."""
    purchasers = events.filter(F.col("event_type") == "purchase").select("user_id")
    errorers = events.filter(F.col("event_type") == "error").select("user_id")
    return purchasers.distinct().exceptAll(errorers.distinct())


def users_view_and_purchase(events: DataFrame) -> DataFrame:
    """Set op INTERSECT: users with both a view and a purchase."""
    viewers = events.filter(F.col("event_type") == "view").select("user_id")
    purchasers = events.filter(F.col("event_type") == "purchase").select("user_id")
    return viewers.distinct().intersect(purchasers.distinct())


# ---------------------------------------------------------------------------
# Oracle-checked query registry
# ---------------------------------------------------------------------------

def _q(fn, *tables):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(*[load_table(spark, sf_dir, t) for t in tables])

    return runner


QUERIES = {
    "tpch_q1_pricing_summary": _q(q1_pricing_summary, "lineitem"),
    "tpch_q3_top_orders": _q(q3_top_orders, "customer", "orders", "lineitem"),
    "tpch_q5_region_revenue": _q(
        q5_region_revenue, "region", "nation", "customer", "supplier", "orders", "lineitem"
    ),
    "tpch_q6_forecast_revenue": _q(q6_forecast_revenue, "lineitem"),
    "part_topk_per_brand": _q(top_parts_per_brand, "part"),
    "users_purchase_no_error": _q(users_purchase_no_error, "events"),
    "users_view_and_purchase": _q(users_view_and_purchase, "events"),
}

_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)

ORACLE = {
    "tpch_q1_pricing_summary": f"""
        WITH agg AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                       AS sum_base_price,
                   CAST(SUM({_REV}) AS DOUBLE) AS sum_disc_price,
                   CAST(SUM({_REV} * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2))))
                        AS DOUBLE) AS sum_charge,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '{_SHIP_CUTOFF} 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        )
        SELECT *, sum_qty / count_order AS avg_qty,
               sum_base_price / count_order AS avg_price
        FROM agg
    """,
    "tpch_q3_top_orders": f"""
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "tpch_q5_region_revenue": f"""
        SELECT n_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        JOIN supplier ON l_suppkey  = s_suppkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND c_nationkey = s_nationkey
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
    """,
    "tpch_q6_forecast_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    "part_topk_per_brand": """
        WITH ranked AS (
            SELECT p_brand, p_partkey, p_retailprice,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
            FROM part
        )
        SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS INTEGER) AS rn
        FROM ranked WHERE rn <= 3
    """,
    "users_purchase_no_error": """
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        EXCEPT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    """,
    "users_view_and_purchase": """
        SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    """,
}
