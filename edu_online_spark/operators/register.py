"""Registration analytics (SURVEY §2.4 A1/A2, RegisterStreaming.scala).

Batch-first forms of the reference's two streaming aggregations:
 - A1 `reduceByKeyAndWindow(_+_, Seconds(60), Seconds(6))`
   (RegisterStreaming.scala:91) → event-time `window()` aggregation.
 - A2 `updateStateByKey` all-time counts (RegisterStreaming.scala:95-101)
   → plain groupBy count (batch) / update-mode streaming agg.

Scale notes: one hash aggregation with map-side partial combine; the
shuffle key (platform — 3 values) is low-cardinality, but partial agg
reduces each map task's output to ≤3 rows, so skew is irrelevant. The
windowed variants shuffle on (window, platform) — cardinality grows
with time range, stays uniform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .synth import REGISTER_SQL_VIEW, register_view


def platform_counts(register: DataFrame) -> DataFrame:
    """All-time registrations per platform (A2 batch analog)."""
    return register.groupBy("platform").agg(F.count("*").alias("cnt"))


def windowed_counts(register: DataFrame, window: str = "60 seconds") -> DataFrame:
    """Tumbling event-time window counts per platform."""
    return (
        register.groupBy(F.window("ts", window).alias("w"), F.col("platform"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "platform", "cnt")
    )


def sliding_counts(
    register: DataFrame, window: str = "60 seconds", slide: str = "6 seconds"
) -> DataFrame:
    """Sliding-window counts (A1): 60s window / 6s slide, event-time."""
    return (
        register.groupBy(F.window("ts", window, slide).alias("w"), F.col("platform"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "platform", "cnt")
    )


def cumulative_daily_counts(register: DataFrame) -> DataFrame:
    """Running all-time total per platform by day — the batch rendering of
    updateStateByKey's monotone counters (A2): what the state store would
    hold at each day boundary."""
    daily = register.groupBy(
        F.date_format("ts", "yyyyMMdd").alias("day"), "platform"
    ).agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    w = Window.partitionBy("platform").orderBy("day")
    return daily.select(
        "day", "platform", F.sum("cnt").over(w).alias("running_cnt")
    )


# ---------------------------------------------------------------------------
# Oracle-checked query registry
# ---------------------------------------------------------------------------

def q_platform_counts(spark, sf_dir):
    from ..sources import load_table

    return platform_counts(register_view(load_table(spark, sf_dir, "events")))


def q_windowed_counts(spark, sf_dir):
    from ..sources import load_table

    return windowed_counts(register_view(load_table(spark, sf_dir, "events")))


def q_sliding_counts(spark, sf_dir):
    from ..sources import load_table

    return sliding_counts(register_view(load_table(spark, sf_dir, "events")))


def q_cumulative_daily(spark, sf_dir):
    from ..sources import load_table

    return cumulative_daily_counts(register_view(load_table(spark, sf_dir, "events")))


QUERIES = {
    "register_platform_counts": q_platform_counts,
    "register_windowed_counts": q_windowed_counts,
    "register_sliding_counts": q_sliding_counts,
    "register_cumulative_daily": q_cumulative_daily,
}

ORACLE = {
    "register_platform_counts": f"""
        WITH register AS ({REGISTER_SQL_VIEW})
        SELECT platform, count(*) AS cnt FROM register GROUP BY platform
    """,
    "register_windowed_counts": f"""
        WITH register AS ({REGISTER_SQL_VIEW})
        SELECT time_bucket(INTERVAL '60 seconds', ts) AS window_start,
               platform, count(*) AS cnt
        FROM register GROUP BY 1, 2
    """,
    # Sliding 60s/6s: every event belongs to the 10 slide-aligned windows
    # whose start is in (ts-60, ts]; enumerate them with a 0..9 offset join.
    "register_sliding_counts": f"""
        WITH register AS ({REGISTER_SQL_VIEW}),
        k AS (SELECT unnest(range(0, 10)) AS k)
        SELECT make_timestamp(CAST((floor(epoch(ts) / 6) * 6 - 6 * k.k) * 1000000 AS BIGINT))
                   AS window_start,
               platform, count(*) AS cnt
        FROM register, k GROUP BY 1, 2
    """,
    "register_cumulative_daily": f"""
        WITH register AS ({REGISTER_SQL_VIEW}),
        daily AS (
            SELECT strftime(ts, '%Y%m%d') AS day, platform, count(*) AS cnt
            FROM register GROUP BY 1, 2
        )
        SELECT day, platform,
               CAST(SUM(cnt) OVER (PARTITION BY platform ORDER BY day) AS BIGINT)
                   AS running_cnt
        FROM daily
    """,
}
