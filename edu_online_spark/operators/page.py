"""Page-view analytics (PageStreaming.scala:23-93 + the analysis it left
unfinished at its `//todo`, PageStreaming.scala:89).

P5/P6: JSON decode with defaults — `from_json` + coalesce (no UDF).
Page-flow: the prev→current transition counts the reference extracted
fields for (last_page_id/page_id/next_page_id, PageStreaming.scala:82-84)
but never aggregated. We derive transitions from event order per user
with `lag()` — the event-time rendering of the same analysis.

Scale notes: the lag window partitions by user_id (high cardinality,
uniform) — one shuffle, no skew; the transition count then reshuffles
on a small (prev, curr) key space with partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def props_decode_counts(events: DataFrame) -> DataFrame:
    """Decode the JSON `props` payload (missing key → '' like
    PageStreaming.scala:78-84) and count by value."""
    k = F.coalesce(F.get_json_object("props", "$.k"), F.lit(""))
    return events.select(k.alias("k")).groupBy("k").agg(F.count("*").alias("cnt"))


def page_flow(events: DataFrame) -> DataFrame:
    """prev_event → event transition counts per user journey.

    Deterministic order within a user: (ts, event_id) — event_id is
    unique, so lag() is well-defined and oracle-reproducible."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flows = events.select(
        F.coalesce(F.lag("event_type").over(w), F.lit("")).alias("prev_type"),
        F.col("event_type"),
    )
    return flows.groupBy("prev_type", "event_type").agg(F.count("*").alias("cnt"))


# ---------------------------------------------------------------------------
# Oracle-checked query registry
# ---------------------------------------------------------------------------

def q_props_decode(spark, sf_dir):
    from ..sources import load_table

    return props_decode_counts(load_table(spark, sf_dir, "events"))


def q_page_flow(spark, sf_dir):
    from ..sources import load_table

    return page_flow(load_table(spark, sf_dir, "events"))


QUERIES = {
    "page_props_decode": q_props_decode,
    "page_flow": q_page_flow,
}

ORACLE = {
    "page_props_decode": """
        SELECT coalesce(json_extract_string(props, '$.k'), '') AS k,
               count(*) AS cnt
        FROM events GROUP BY 1
    """,
    "page_flow": """
        WITH flows AS (
            SELECT coalesce(
                       lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       '') AS prev_type,
                   event_type
            FROM events
        )
        SELECT prev_type, event_type, count(*) AS cnt
        FROM flows GROUP BY 1, 2
    """,
}
