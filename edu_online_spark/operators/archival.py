"""Raw-log archival (RawLogSparkStreaming.scala:21-122, SURVEY §2.2 K4).

The reference hand-rolled an appendable Hadoop OutputFormat
(AppendTextOutputFormat.scala:12-71) to write Snappy text into
`base/topic/yyyyMMdd` directories. On Spark the whole mechanism is one
partitioned parquet write: `partitionBy(event_type, day)` gives the
same directory layout, snappy compression is an option, and append is
native — no custom OutputFormat, and readers get columnar scans +
partition pruning for free (a date-filtered query at 100 TB touches
only its day's files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import day_bucket


def with_day(events: DataFrame) -> DataFrame:
    return events.withColumn("day", day_bucket("ts"))


def write_archive(events: DataFrame, path: str, mode: str = "append") -> None:
    """Batch/foreachBatch archival write: day+type partitioned parquet."""
    (
        with_day(events)
        .write.mode(mode)
        .partitionBy("event_type", "day")
        .option("compression", "snappy")
        .parquet(path)
    )


def daily_counts(events: DataFrame) -> DataFrame:
    """Audit query over the archive layout: rows per (day, type)."""
    return with_day(events).groupBy("day", "event_type").agg(
        F.count("*").alias("cnt")
    )


def q_daily_counts(spark, sf_dir):
    from ..sources import load_table

    return daily_counts(load_table(spark, sf_dir, "events"))


QUERIES = {"archival_daily_counts": q_daily_counts}

ORACLE = {
    "archival_daily_counts": """
        SELECT strftime(ts, '%Y%m%d') AS day, event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2
    """,
}
