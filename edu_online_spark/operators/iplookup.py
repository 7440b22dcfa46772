"""IP→region interval lookup — the ip2region dimension the reference
shipped but never wired (SparkStreamingModule/pom.xml:60-64; SURVEY
§2.5). An ip2region database is a sorted table of (ip_lo, ip_hi,
region) intervals; the lookup is an interval-containment join.

Scale shape: a naive `ip BETWEEN lo AND hi` join has no equi key, so
Spark plans BroadcastNestedLoopJoin — O(events × ranges) comparisons.
The 100 TB rendering BUCKETS the 32-bit address space: each range row
explodes into the fixed-width buckets it overlaps, each event computes
its single bucket, and the join is pure equi on `bucket` with the
precise BETWEEN as a residual filter. Probe fan-out is bounded by
ranges-per-bucket (≈1 for real ip2region data), not by the table size.

The testdata has no IP column, so events synthesize one
deterministically from user_id with overflow-safe multiplicative
hashing (identical arithmetic in the DuckDB oracle); the range table is
likewise derived arithmetically. Swapping in a real ip2region dump is a
one-line change to `ip_ranges`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.core import hash_bucket
from ..sources import load_table

N_RANGES = 1024
RANGE_WIDTH = 1 << 22          # each range covers 2^22 addresses
BUCKET_WIDTH = 1 << 20         # each range spans exactly 4 buckets
N_REGIONS = 5


def synth_ip(user_col: str = "user_id") -> F.Column:
    """Deterministic pseudo-IPv4 (uint32) per user — hash_bucket over
    the full 32-bit space (overflow-bound reasoning lives there)."""
    return hash_bucket(user_col, 4294967296)


def ip_ranges(spark: SparkSession) -> DataFrame:
    """The interval dimension: 1024 contiguous ranges tiling the 32-bit
    space, each mapped to a region key. Stand-in for a real ip2region
    table (same schema: lo, hi, key)."""
    return spark.range(N_RANGES).select(
        (F.col("id") * RANGE_WIDTH).alias("ip_lo"),
        (F.col("id") * RANGE_WIDTH + (RANGE_WIDTH - 1)).alias("ip_hi"),
        F.pmod(F.col("id"), F.lit(N_REGIONS)).cast("int").alias("r_regionkey"),
    )


def ip_region_counts(events: DataFrame, region: DataFrame, spark: SparkSession) -> DataFrame:
    """Events enriched with their IP's region via the bucketed interval
    join; counts per (region name, event_type).

    The exploded range table is ranges × buckets-per-range rows (4096
    here — KBs) and broadcasts; the fact side computes one bucket per
    row and never shuffles for the join.
    """
    buckets = ip_ranges(spark).select(
        "ip_lo",
        "ip_hi",
        "r_regionkey",
        F.explode(
            F.sequence(
                (F.col("ip_lo") / BUCKET_WIDTH).cast("long"),
                (F.col("ip_hi") / BUCKET_WIDTH).cast("long"),
            )
        ).alias("bucket"),
    )
    ev = events.select(
        "event_type",
        synth_ip().alias("ip"),
    ).withColumn("bucket", (F.col("ip") / BUCKET_WIDTH).cast("long"))
    return (
        ev.join(F.broadcast(buckets), "bucket")
        .filter(F.col("ip").between(F.col("ip_lo"), F.col("ip_hi")))
        .join(F.broadcast(region), "r_regionkey")
        .groupBy("r_name", "event_type")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# Oracle-checked query registry
# ---------------------------------------------------------------------------

def q_ip_region_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ip_region_counts(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "region"), spark
    )


QUERIES = {"ip_region_counts": q_ip_region_counts}

ORACLE = {
    "ip_region_counts": f"""
        WITH ranges AS (
            SELECT i * {RANGE_WIDTH} AS ip_lo,
                   i * {RANGE_WIDTH} + {RANGE_WIDTH - 1} AS ip_hi,
                   CAST(i % {N_REGIONS} AS INTEGER) AS r_regionkey
            FROM (SELECT unnest(range(0, {N_RANGES})) AS i)
        ),
        ev AS (
            SELECT event_type,
                   ((user_id % 2147483647) * 2654435761) % 4294967296 AS ip
            FROM events
        )
        SELECT r_name, event_type, count(*) AS cnt
        FROM ev
        JOIN ranges ON ip BETWEEN ip_lo AND ip_hi
        JOIN region USING (r_regionkey)
        GROUP BY r_name, event_type
    """,
}
