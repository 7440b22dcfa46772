"""Sessionization + dimension enrichment over the events stream.

The reference's PageStreaming extracted prev/next page ids
(PageStreaming.scala:82-84) and shipped an unused ip2region dependency
(SparkStreamingModule/pom.xml:60-64) — the analyses it was building
toward. Here they are, batch-first:

  sessionize          gaps-and-islands: a new session starts after a
                      30-min silence; one lag + one running sum + one
                      groupBy — two shuffles total, both partitioned by
                      user_id (high-cardinality, uniform).
  region_enrichment   the dim-lookup join: events ⋈ broadcast(region) —
                      zero shuffle of the fact side, the exact shape an
                      ip→region lookup takes at 100 TB.

Streaming note: the same sessionize semantics in Structured Streaming
is `groupBy(session_window(ts, '30 minutes'), user_id)` — Spark's
native session windows; the batch form here is the oracle-checkable
rendering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table

SESSION_GAP_SEC = 1800


def sessionize(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Per-user sessions split on gaps > gap_sec.

    Deterministic order within user: (ts, event_id). Epoch seconds via
    timestamp→double cast (UTC session tz) so the oracle's epoch()
    matches exactly.
    """
    epoch = F.col("ts").cast("timestamp").cast("double")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (epoch - F.lag(epoch).over(order)) > gap_sec, 1
        ).otherwise(F.when(F.lag(epoch).over(order).isNull(), 1).otherwise(0)).alias(
            "new_session"
        ),
    )
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_sid = flagged.select(
        "user_id",
        "ts",
        F.sum("new_session").over(running).alias("session_id"),
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .withColumn(
            "duration_sec",
            F.col("session_end").cast("timestamp").cast("double")
            - F.col("session_start").cast("timestamp").cast("double"),
        )
    )


def session_stats(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Roll-up: sessions per user + mean session size."""
    s = sessionize(events, gap_sec)
    return s.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        (F.sum("n_events") / F.count("*")).alias("avg_events_per_session"),
    )


def region_enrichment(events: DataFrame, region: DataFrame) -> DataFrame:
    """Dim-lookup join: every event tagged with a region (synthesized key
    pmod(user_id, 5) — the testdata has no IP column), counts per
    (region, event_type). The region side broadcasts: no fact shuffle."""
    keyed = events.select(
        F.pmod("user_id", F.lit(5)).cast("int").alias("r_regionkey"), "event_type"
    )
    return (
        keyed.join(F.broadcast(region), "r_regionkey")
        .groupBy("r_name", "event_type")
        .agg(F.count("*").alias("cnt"))
    )


def purchase_attribution(events: DataFrame) -> DataFrame:
    """As-of join within the event stream: each purchase attributed to
    the user's most recent prior view.

    Spark has no ASOF JOIN; the scalable rendering is a conditional
    running max over the user's ordered event stream — one shuffle on
    user_id, no self-join, no range explosion. (DuckDB's native ASOF
    JOIN is the oracle's shorthand for the same semantics.)
    """
    # frame ends one row before current: a purchase can't attribute to
    # a view at the same instant (same row)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_view = events.withColumn(
        "last_view_ts",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    purchases = with_view.filter(F.col("event_type") == "purchase")
    return purchases.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "last_view_ts",
        (
            F.col("ts").cast("timestamp").cast("double")
            - F.col("last_view_ts").cast("timestamp").cast("double")
        ).alias("gap_sec"),
    )


# ---------------------------------------------------------------------------
# Oracle-checked query registry
# ---------------------------------------------------------------------------

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"))


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_stats(load_table(spark, sf_dir, "events"))


def q_region_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return region_enrichment(
        load_table(spark, sf_dir, "events"), load_table(spark, sf_dir, "region")
    )


def q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return purchase_attribution(load_table(spark, sf_dir, "events"))


QUERIES = {
    "events_sessionize": q_sessionize,
    "events_session_stats": q_session_stats,
    "events_region_enrich": q_region_enrichment,
    "purchase_attribution": q_purchase_attribution,
}

_SESSIONS_SQL = f"""
    flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(epoch(ts)) OVER w IS NULL THEN 1
                    WHEN epoch(ts) - lag(epoch(ts)) OVER w > {SESSION_GAP_SEC} THEN 1
                    ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    with_sid AS (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, session_id,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events,
               epoch(max(ts)) - epoch(min(ts)) AS duration_sec
        FROM with_sid GROUP BY user_id, session_id
    )
"""

ORACLE = {
    "events_sessionize": f"WITH {_SESSIONS_SQL} SELECT * FROM sessions",
    "events_session_stats": f"""
        WITH {_SESSIONS_SQL}
        SELECT user_id, count(*) AS n_sessions,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               CAST(sum(n_events) AS DOUBLE) / count(*) AS avg_events_per_session
        FROM sessions GROUP BY user_id
    """,
    "events_region_enrich": """
        SELECT r_name, event_type, count(*) AS cnt
        FROM (SELECT CAST(user_id % 5 AS INTEGER) AS k, event_type FROM events) e
        JOIN region ON e.k = r_regionkey
        GROUP BY 1, 2
    """,
    "purchase_attribution": """
        WITH w AS (
            SELECT event_id, user_id, ts, event_type,
                   max(CASE WHEN event_type = 'view' THEN ts END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS last_view_ts
            FROM events
        )
        SELECT event_id, user_id, ts AS purchase_ts, last_view_ts,
               epoch(ts) - epoch(last_view_ts) AS gap_sec
        FROM w WHERE event_type = 'purchase'
    """,
}
