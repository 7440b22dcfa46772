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

    No broadcast HINTS on orders/customer: they are fact-sized tables,
    and an explicit hint would override autoBroadcastJoinThreshold and
    AQE — at 100 TB that's a driver OOM, not a slow plan. At small SF
    the size-based threshold still picks broadcast joins by itself; at
    scale AQE degrades to shuffle joins on o_orderkey — lineitem is the
    probe side either way, never re-partitioned twice. Top-10 compiles
    to TakeOrderedAndProject: per-partition bounded heaps, no global
    sort.
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
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
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

    Snowflake join order keeps lineitem as the single streaming fact.
    Only the CONSTANT-size side gets a broadcast hint (region⋈nation:
    ≤25 rows at any SF); customer/orders/supplier grow with SF, so
    their join strategy is left to the size threshold + AQE — an
    explicit hint there would force a 100 TB broadcast. The final
    equi-condition c_nationkey = s_nationkey filters to intra-nation
    commerce.
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
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
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


def q4_priority_waiting(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → left-semi join.

    Orders in a 3-month window having at least one lineitem shipped
    more than 60 days after the order date (the synthetic tables carry
    no commit/receipt dates, so the 'late' predicate is adapted; the
    SHAPE — EXISTS with a mixed equi + non-equi correlated condition —
    is the point). Catalyst compiles the semi-join with the non-equi
    conjunct as a join residual: one shuffle (or broadcast at small
    SF), no subquery re-execution per row, and the probe side stops at
    the first match — exactly what EXISTS means.
    """
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1996-04-01").cast("timestamp_ntz")
    ords = orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
    li = lineitem.select("l_orderkey", "l_shipdate")
    return (
        ords.join(
            li,
            (ords.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q17_small_qty_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average).

    Yearly revenue lost if small-quantity orders (below 20% of the
    part's average quantity) went unfilled, for one brand. The
    correlated `(SELECT 0.2*avg(l_quantity) WHERE l2.l_partkey =
    l_partkey)` becomes a per-part aggregate joined back to lineitem —
    the aggregate is computed ONCE per part (map-side combined), not
    once per probe row.

    Cross-engine exactness: the threshold compare is reformulated
    division-free as `5 · qty · count < sum` over exact decimals —
    avg() on doubles is summation-order-dependent and would flip
    boundary rows between engines.
    """
    li = lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty_sum"),
        F.count("*").alias("qty_cnt"),
    )
    parts = part.filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 15)
    ).select("p_partkey")
    small = (
        li.join(parts, li.l_partkey == parts.p_partkey)
        .join(per_part, "l_partkey")
        .filter(
            F.lit(5) * F.col("l_quantity").cast("decimal(12,2)") * F.col("qty_cnt")
            < F.col("qty_sum")
        )
    )
    return small.agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        )
    )


def q21_waiting_suppliers(
    supplier: DataFrame, lineitem: DataFrame, orders: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS against the same fact.

    Suppliers in one nation who were the ONLY late shipper on a
    multi-supplier finished order ('late' adapted to shipdate >
    orderdate + 60 days; see q4). The two correlated subqueries
    (EXISTS other-supplier lineitem, NOT EXISTS other-supplier LATE
    lineitem) collapse into one per-order aggregate:

        n_supp      = count_distinct(supplier)        per order
        n_late_supp = count_distinct(late supplier)   per order

    A late l1 row qualifies iff n_supp > 1 (someone else supplied) and
    n_late_supp == 1 (the only late one is l1 itself). Both distinct
    counts come from partition-wide window collect_sets over ONE
    lineitem⋈orders join — a groupBy-and-join-back formulation would
    execute that fact-fact join twice (Catalyst only reuses identical
    subplans); the window form is a single shuffle on l_orderkey.
    collect_set state is bounded by suppliers-per-order (single
    digits), so the window is skew-safe.
    """
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    # Optimization r16 (guide §2.3): o_orderstatus is ORDER-grain and
    # the window aggregates within one order, so filtering finished
    # orders BEFORE the fact join is exactly equivalent to filtering
    # after the window — and the join + window now move only finished
    # orders' lineitems.
    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        orders.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    w = Window.partitionBy("l_orderkey")
    flagged = li.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late_supp",
        F.size(F.collect_set(F.when(late, F.col("l_suppkey"))).over(w)),
    )
    nat = nation.filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    sup = supplier.join(
        F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", "s_name")
    return (
        flagged.filter(
            late
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


def priciest_order_per_priority(orders: DataFrame) -> DataFrame:
    """TPC-H Q2 shape: correlated MAX scalar subquery (`WHERE
    o_totalprice = (SELECT max(...) ... same priority)`) as a per-group
    max joined back — the aggregate runs once per group, the join
    broadcasts 5 rows, ties surface in both engines identically.
    """
    per_pri = orders.groupBy("o_orderpriority").agg(
        F.max("o_totalprice").alias("max_price")
    )
    return (
        orders.join(F.broadcast(per_pri), "o_orderpriority")
        .filter(F.col("o_totalprice") == F.col("max_price"))
        .select("o_orderpriority", "o_orderkey", "o_custkey", "o_totalprice")
    )


def q13_customer_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13: customer count by number of (non-finished) orders.

    LEFT OUTER join so zero-order customers land in the c_count=0
    bucket, then a second aggregation over the first — the outer join
    preserves the entire customer side, and count(o_orderkey) (not
    count(*)) is what makes the no-match rows count as 0.
    """
    co = (
        customer.select("c_custkey")
        .join(
            orders.filter(F.col("o_orderstatus") != "F").select(
                "o_custkey", "o_orderkey"
            ),
            customer.c_custkey == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q16_dormant_customers_per_segment(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q16 shape: NOT IN (uncorrelated subquery) → left-anti join.

    Customers with no order in the dataset's final two months, counted
    per market segment. The NOT IN list reduces to DISTINCT keys before
    the anti join — at 100 TB the key set travels, not the orders.
    (o_custkey is non-null, so NOT IN ≡ anti join; a nullable probe
    would need Spark's null-aware anti-join special case.)
    """
    recent = (
        orders.filter(
            F.col("o_orderdate") >= F.lit("2001-06-01").cast("timestamp_ntz")
        )
        .select("o_custkey")
        .distinct()
    )
    return (
        customer.join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_dormant"))
    )


def q18_large_volume_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, threshold: int = 200
) -> DataFrame:
    """TPC-H Q18: orders whose total quantity clears a HAVING threshold,
    re-joined to customer detail, top 100 by price.

    The HAVING aggregate runs on lineitem alone (partial-combined, one
    shuffle on l_orderkey); only qualifying keys join back — a
    semi-join-shaped reduction before touching customer.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("total_qty"))
        .filter(F.col("total_qty") >= threshold)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q20_heavy_small_part_suppliers(
    supplier: DataFrame, lineitem: DataFrame, part: DataFrame, nation: DataFrame,
    qty_threshold: int = 60,
) -> DataFrame:
    """TPC-H Q20 shape: nested IN chains → stacked semi joins.

    Suppliers in one nation who moved more than `qty_threshold` units
    of any 'small …' part: part-name IN-list → semi join onto lineitem,
    group by (supp, part) HAVING sum(qty) > t → distinct supplier keys
    → semi join onto supplier. Every IN becomes a key-set reduction;
    nothing fact-sized is ever on a build side.
    """
    small_parts = part.filter(F.col("p_name").startswith("small")).select("p_partkey")
    heavy = (
        lineitem.join(
            small_parts, lineitem.l_partkey == small_parts.p_partkey, "left_semi"
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty"))
        .filter(F.col("qty") > qty_threshold)
        .select("l_suppkey")
        .distinct()
    )
    nat = nation.filter(F.col("n_name") == "NATION_5").select("n_nationkey")
    return (
        supplier.join(heavy, supplier.s_suppkey == heavy.l_suppkey, "left_semi")
        .join(F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey, "left_semi")
        .select("s_suppkey", "s_name")
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


def q12_priority_by_returnflag(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 shape: join + conditional CASE aggregation — per line
    category, how many high- vs low-priority orders it carried (the
    synthetic schema has no shipmode, so l_returnflag is the category).
    The CASE folds into the partial aggregate: one shuffle of
    (flag, 2 longs).
    """
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.select("l_orderkey", "l_returnflag")
        .join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q14_promo_revenue_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14: promo revenue share — ratio of two conditional decimal
    sums over one month of shipments. Both sums come out of the same
    aggregate (no second pass); the single double division at the end
    is deterministic because the operands are exact decimals.
    """
    rev = _dec("l_extendedprice") * _one_minus("l_discount")
    promo = F.col("p_type") == "PROMO"
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    joined = li.join(part.select("p_partkey", "p_type"), li.l_partkey == F.col("p_partkey"))
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(promo, rev).otherwise(F.lit(0).cast("decimal(12,2)")))
            .cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct")
    )


def q19_disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three brand/size/quantity
    conjunction clauses. Catalyst extracts the common `p_partkey =
    l_partkey` equi-key from the disjunction, so this plans as a hash
    join with the OR as a post-join filter — NOT a nested-loop join;
    the common quantity/size bounds also push to the scans.
    """
    rev = _dec("l_extendedprice") * _one_minus("l_discount")
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size").between(1, 5))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return (
        lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(
            part.select("p_partkey", "p_brand", "p_size"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(clause)
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


def q22_rich_punctual_orders(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q22 shape: scalar AVG subquery + correlated NOT EXISTS.

    Above-average-value orders with no very-late (>120 days) shipment:
    the global average is a 1-row aggregate broadcast as a cross join
    (every engine's plan for an uncorrelated scalar subquery); the
    NOT EXISTS — correlated on the key AND a cross-table date condition
    — is a left-anti join with the non-equi conjunct as the join
    residual. Exactness: the average is exact-decimal sum / count,
    divided once in double.
    """
    avg_price = orders.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double")
            / F.count("*")
        ).alias("avg_price")
    )
    li = lineitem.select("l_orderkey", "l_shipdate")
    return (
        orders.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .join(
            li,
            (F.col("o_orderkey") == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS")),
            "left_anti",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def q7_volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume per (supplier nation,
    customer nation, ship year) for one nation pair.

    Two roles of the same `nation` table join in as two broadcast
    aliases (dimension-sized; the hint is safe — 25 rows at any SF).
    The nation-pair filter lands on both dims BEFORE the fact joins, so
    the lineitem⋈orders⋈customer chain is pruned at the scan. One
    shuffle per fact join key plus the final (n1, n2, year) agg.
    """
    rev = _dec("l_extendedprice") * _one_minus("l_discount")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


def q8_market_share(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q8 shape: NATION_1's share of AMERICA's ECONOMY-part
    revenue per order year.

    The share is a conditional-sum ratio inside one aggregation — no
    self-join: sum(when(supp_nation = target, rev)) / sum(rev), both
    exact decimal sums divided once in double (bit-stable). Dimension
    chain (part filter, region→nation→customer) prunes the fact scan;
    nation appears twice (customer side for the region gate, supplier
    side for the share flag), both broadcast.
    """
    rev = _dec("l_extendedprice") * _one_minus("l_discount")
    target = "NATION_1"
    amer_nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nkey"))
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    eco_parts = part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    joined = (
        lineitem.join(F.broadcast(eco_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(amer_nations), F.col("c_nationkey") == F.col("c_nkey"))
        .join(supplier.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("s_nkey"))
    )
    zero = F.lit(0).cast("decimal(12,2)") * F.lit(0).cast("decimal(3,2)")
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == target, rev).otherwise(zero))
                .cast("double")
                / F.sum(rev).cast("double")
            ).alias("mkt_share")
        )
    )


def q10_returned_items(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter. Fact joins shuffle on their keys; nation broadcast; the
    top-20 is TakeOrderedAndProject over the (customer-cardinality)
    aggregate — never a global sort.
    """
    rev = _dec("l_extendedprice") * _one_minus("l_discount")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q15_top_supplier(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue.

    The reference Q15 uses a view + scalar MAX subquery; here the
    per-supplier aggregate computes once, its 1-row MAX broadcasts back
    as a cross join, and the equality filter keeps all ties (exact
    decimal comparison BEFORE the double cast — a double-rounded
    equality could drop or add a tie).
    """
    rev = _dec("l_extendedprice") * _one_minus("l_discount")
    by_supp = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev).alias("total_rev_dec"))
    )
    max_rev = by_supp.agg(F.max("total_rev_dec").alias("max_rev_dec"))
    return (
        by_supp.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev_dec") == F.col("max_rev_dec"))
        .join(supplier.select("s_suppkey", "s_name"), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_dec").cast("double").alias("total_revenue"),
        )
    )


def q2_min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q2 (adapted): cheapest EUROPE supplier per qualifying part.

    The testdata star schema has no partsupp table, so the part↔supplier
    catalog is DERIVED from lineitem: supply cost per (part, supplier) =
    MIN(l_extendedprice) over their trade history. That keeps Q2's
    signature shape — per-group minimum resolved by aggregate + join-back
    (the decorrelated form of the reference's correlated MIN subquery) —
    with ties preserved, exactly like q15's scalar-MAX pattern.

    Scale: the derived catalog aggregates lineitem down to (part,supplier)
    cardinality BEFORE any dimension join, so the big shuffle carries two
    keys + one decimal. region⋈nation is constant-size → broadcast; the
    min-cost join-back is an equi-join on (p_partkey, cost). Top-100 is
    TakeOrderedAndProject.
    """
    eur_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    eur_supp = supplier.join(
        F.broadcast(eur_nations), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    parts = part.filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    ).select("p_partkey", "p_name")
    # Optimization r16 (guide §3.2): `cand` inner-joins the aggregate
    # to the filtered part and EUROPE-supplier dimensions, so lineitem
    # rows outside either set can never reach the output — drop them
    # with broadcast semi-joins BEFORE the (part,supplier) exchange.
    # The shuffle now carries only qualifying-part × qualifying-supplier
    # trade rows (the selectivity product) instead of the whole fact.
    supply = (
        lineitem.join(
            F.broadcast(parts.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            F.broadcast(eur_supp.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_dec("l_extendedprice")).alias("supply_cost_dec"))
    )
    cand = (
        supply.join(eur_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal",
            "n_name", "supply_cost_dec",
        )
    )
    min_cost = cand.groupBy(F.col("p_partkey").alias("mc_partkey")).agg(
        F.min("supply_cost_dec").alias("min_cost_dec")
    )
    return (
        cand.join(
            min_cost,
            (F.col("p_partkey") == F.col("mc_partkey"))
            & (F.col("supply_cost_dec") == F.col("min_cost_dec")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "s_suppkey",
            F.col("supply_cost_dec").cast("double").alias("supply_cost"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"),
            F.asc("p_partkey"), F.asc("s_suppkey"),
        )
        .limit(100)
    )


def q9_profit_by_nation(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q9 (adapted): profit on 'red' parts per supplier nation per
    order year.

    No partsupp → supply cost is modeled as half the part's list price
    per unit (cost = l_quantity × p_retailprice × 0.5, exact decimal),
    keeping Q9's shape: 5-way join, LIKE-filtered part dimension,
    profit = revenue − cost aggregated by (nation, year).

    Scale: part is filtered before the join (predicate pushdown to the
    scan); nation broadcasts; lineitem joins orders on l_orderkey — both
    fact-sized, left to AQE. All money math is exact decimal (28,5 max —
    no 38-precision truncation), cast to double only at the end, so a
    32-way run hash-matches single-threaded DuckDB.
    """
    rev = _dec("l_extendedprice") * _one_minus("l_discount")
    cost = _dec("l_quantity") * _dec("p_retailprice") * F.lit("0.5").cast("decimal(2,1)")
    red_parts = part.filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    return (
        lineitem.join(red_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            supplier.select("s_suppkey", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(rev - cost).cast("double").alias("sum_profit"))
    )


def q11_important_parts(
    supplier: DataFrame, lineitem: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """TPC-H Q11 (adapted): parts whose traded value through ASIA-region
    suppliers exceeds 0.1% of the total.

    No partsupp → "stock value" per part is the summed extended price of
    its lineitems via ASIA suppliers. Keeps Q11's signature: grouped
    value, a GLOBAL scalar threshold (broadcast 1-row aggregate, q15
    pattern), HAVING-style filter against it.

    The threshold comparison is done in DOUBLE on both engines: each
    side is first an exact decimal sum (partition-order independent),
    then one IEEE multiply by 0.001 — bit-identical cross-engine,
    whereas a decimal multiply would overflow DuckDB's 38-digit width
    on the total.
    """
    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    asia_supp = supplier.join(
        F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    vals = (
        lineitem.join(asia_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_dec("l_extendedprice")).alias("val_dec"))
    )
    total = vals.agg(F.sum("val_dec").alias("total_dec"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(
            F.col("val_dec").cast("double")
            > F.col("total_dec").cast("double") * F.lit(0.001)
        )
        .select("p_partkey", F.col("val_dec").cast("double").alias("part_value"))
    )


def part_price_rank_family(part: DataFrame) -> DataFrame:
    """The full ranking-function family in one windowed pass per brand:
    dense_rank, percent_rank, cume_dist, ntile(4) — one shuffle on
    p_brand, every function computed from the same sort order
    (price desc, partkey asc for a total, engine-independent order).
    """
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return part.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.dense_rank().over(w).alias("drank"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).alias("quartile"),
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
    "tpch_q4_priority_waiting": _q(q4_priority_waiting, "orders", "lineitem"),
    "tpch_q17_small_qty_revenue": _q(q17_small_qty_revenue, "lineitem", "part"),
    "tpch_q21_waiting_suppliers": _q(
        q21_waiting_suppliers, "supplier", "lineitem", "orders", "nation"
    ),
    "part_topk_per_brand": _q(top_parts_per_brand, "part"),
    "orders_priciest_per_priority": _q(priciest_order_per_priority, "orders"),
    "tpch_q13_order_distribution": _q(
        q13_customer_order_distribution, "customer", "orders"
    ),
    "tpch_q16_dormant_customers": _q(
        q16_dormant_customers_per_segment, "customer", "orders"
    ),
    "tpch_q18_large_orders": _q(
        q18_large_volume_orders, "customer", "orders", "lineitem"
    ),
    "tpch_q20_heavy_suppliers": _q(
        q20_heavy_small_part_suppliers, "supplier", "lineitem", "part", "nation"
    ),
    "part_price_rank_family": _q(part_price_rank_family, "part"),
    "tpch_q12_priority_by_flag": _q(q12_priority_by_returnflag, "orders", "lineitem"),
    "tpch_q14_promo_share": _q(q14_promo_revenue_share, "lineitem", "part"),
    "tpch_q19_disjunctive_revenue": _q(q19_disjunctive_revenue, "lineitem", "part"),
    "tpch_q22_rich_punctual_orders": _q(q22_rich_punctual_orders, "orders", "lineitem"),
    "tpch_q7_volume_shipping": _q(
        q7_volume_shipping, "supplier", "lineitem", "orders", "customer", "nation"
    ),
    "tpch_q8_market_share": _q(
        q8_market_share,
        "part", "supplier", "lineitem", "orders", "customer", "nation", "region",
    ),
    "tpch_q10_returned_items": _q(
        q10_returned_items, "customer", "orders", "lineitem", "nation"
    ),
    "tpch_q15_top_supplier": _q(q15_top_supplier, "supplier", "lineitem"),
    "tpch_q2_min_cost_supplier": _q(
        q2_min_cost_supplier, "part", "supplier", "lineitem", "nation", "region"
    ),
    "tpch_q9_profit_by_nation": _q(
        q9_profit_by_nation, "part", "supplier", "lineitem", "orders", "nation"
    ),
    "tpch_q11_important_parts": _q(
        q11_important_parts, "supplier", "lineitem", "nation", "region"
    ),
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
    "tpch_q4_priority_waiting": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
    "tpch_q17_small_qty_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
                   AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23' AND p_size < 15
          AND 5 * CAST(l_quantity AS DECIMAL(12,2))
                * (SELECT count(*) FROM lineitem l2
                   WHERE l2.l_partkey = lineitem.l_partkey)
              < (SELECT SUM(CAST(l_quantity AS DECIMAL(12,2))) FROM lineitem l2
                 WHERE l2.l_partkey = lineitem.l_partkey)
    """,
    "tpch_q21_waiting_suppliers": """
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders   o ON o.o_orderkey = l1.l_orderkey
        JOIN supplier s ON s.s_suppkey  = l1.l_suppkey
        JOIN nation   n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_3'
          AND o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 100
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
    "orders_priciest_per_priority": """
        SELECT o_orderpriority, o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice = (SELECT max(o_totalprice) FROM orders o2
                              WHERE o2.o_orderpriority = o.o_orderpriority)
    """,
    "tpch_q13_order_distribution": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderstatus <> 'F'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    "tpch_q16_dormant_customers": """
        SELECT c_mktsegment, count(*) AS n_dormant
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '2001-06-01 00:00:00'
        )
        GROUP BY c_mktsegment
    """,
    "tpch_q18_large_orders": """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(total_qty AS DOUBLE) AS total_qty
        FROM (
            SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) >= 200
        ) big
        JOIN orders   ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    "tpch_q20_heavy_suppliers": """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'small%')
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 60
        )
        AND s_nationkey IN (SELECT n_nationkey FROM nation
                            WHERE n_name = 'NATION_5')
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
    "tpch_q12_priority_by_flag": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_returnflag
    """,
    "tpch_q14_promo_share": f"""
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                THEN {_REV} ELSE CAST(0 AS DECIMAL(12,2)) END)
                            AS DOUBLE)
               / CAST(SUM({_REV}) AS DOUBLE) AS promo_revenue_pct
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    "tpch_q19_disjunctive_revenue": f"""
        SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "tpch_q22_rich_punctual_orders": """
        SELECT o_orderpriority, count(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
                   AS total_value
        FROM orders
        WHERE o_totalprice > (
                SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
                       / count(*)
                FROM orders)
          AND NOT EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 120 DAY)
        GROUP BY o_orderpriority
    """,
    "part_price_rank_family": """
        SELECT p_brand, p_partkey, p_retailprice,
               CAST(dense_rank()   OVER w AS INTEGER) AS drank,
               percent_rank() OVER w AS prank,
               cume_dist()    OVER w AS cdist,
               CAST(ntile(4)  OVER w AS INTEGER) AS quartile
        FROM part
        WINDOW w AS (PARTITION BY p_brand
                     ORDER BY p_retailprice DESC, p_partkey ASC)
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
    "tpch_q7_volume_shipping": f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INTEGER) AS l_year,
                   l_extendedprice, l_discount
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE n1.n_name IN ('NATION_1', 'NATION_2')
              AND n2.n_name IN ('NATION_1', 'NATION_2')
              AND n1.n_name <> n2.n_name
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        )
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "tpch_q8_market_share": f"""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN {_REV}
                             ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
               / CAST(SUM({_REV}) AS DOUBLE) AS mkt_share
        FROM (
            SELECT sn.n_name AS supp_nation, o_orderdate,
                   l_extendedprice, l_discount
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region   ON cn.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
        )
        GROUP BY o_year
    """,
    "tpch_q10_returned_items": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "tpch_q15_top_supplier": f"""
        WITH by_supp AS (
            SELECT l_suppkey, SUM({_REV}) AS total_rev_dec
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name,
               CAST(total_rev_dec AS DOUBLE) AS total_revenue
        FROM by_supp JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_rev_dec = (SELECT MAX(total_rev_dec) FROM by_supp)
    """,
    "tpch_q2_min_cost_supplier": """
        WITH supply AS (
            SELECT l_partkey, l_suppkey,
                   MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS supply_cost_dec
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        cand AS (
            SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
                   supply_cost_dec
            FROM supply
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            JOIN part     ON l_partkey = p_partkey
            WHERE r_name = 'EUROPE'
              AND p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, s_suppkey,
               CAST(supply_cost_dec AS DOUBLE) AS supply_cost
        FROM cand
        WHERE supply_cost_dec = (
            SELECT MIN(c2.supply_cost_dec) FROM cand c2
            WHERE c2.p_partkey = cand.p_partkey
        )
        ORDER BY s_acctbal DESC, n_name ASC, s_name ASC,
                 p_partkey ASC, s_suppkey ASC
        LIMIT 100
    """,
    "tpch_q9_profit_by_nation": f"""
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(SUM(
                   {_REV}
                   - CAST(l_quantity AS DECIMAL(12,2))
                     * CAST(p_retailprice AS DECIMAL(12,2))
                     * CAST(0.5 AS DECIMAL(2,1))
               ) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    """,
    "tpch_q11_important_parts": """
        WITH vals AS (
            SELECT l_partkey AS p_partkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS val_dec
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY l_partkey
        )
        SELECT p_partkey, CAST(val_dec AS DOUBLE) AS part_value
        FROM vals
        WHERE CAST(val_dec AS DOUBLE)
              > (SELECT CAST(SUM(val_dec) AS DOUBLE) FROM vals) * 0.001
    """,
}
