"""Synthesized log views over the driver's `events` table.

FIXTURES.md §5: the testdata has no register/quiz log files, so the
oracle-checked queries derive those streams deterministically from
`events` columns. The SAME arithmetic appears in the DuckDB oracle SQL,
so both engines see identical inputs.

Mapping (documented here, mirrored in every oracle string):
  register:  signup events; platform_code = user_id % 3 ("1"→PC,
             "2"→APP, else Other — RegisterStreaming.scala:80-84)
  quiz:      all events; uid=user_id, courseid=event_id%5,
             pointid=event_id%7, questionid='q'||event_id%30,
             istrue = value>10 → '1' else '0', createtime=fmt(ts)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import fmt_ts
from ..sources.logs import platform_name

# SQL fragments kept in lockstep with the column expressions below.
REGISTER_SQL_VIEW = """
    SELECT user_id,
           CAST(user_id % 3 AS VARCHAR) AS platform_code,
           CASE WHEN user_id % 3 = 1 THEN 'PC'
                WHEN user_id % 3 = 2 THEN 'APP'
                ELSE 'Other' END AS platform,
           ts
    FROM events WHERE event_type = 'signup'
"""

QUIZ_SQL_VIEW = """
    SELECT user_id AS uid,
           event_id % 5 AS courseid,
           event_id % 7 AS pointid,
           'q' || CAST(event_id % 30 AS VARCHAR) AS questionid,
           CASE WHEN value > 10 THEN '1' ELSE '0' END AS istrue,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS createtime
    FROM events
"""


def register_view(events: DataFrame) -> DataFrame:
    code = F.pmod(F.col("user_id"), F.lit(3)).cast("string")
    return events.filter(F.col("event_type") == "signup").select(
        F.col("user_id"),
        code.alias("platform_code"),
        platform_name(code).alias("platform"),
        F.col("ts"),
    )


def quiz_view(events: DataFrame) -> DataFrame:
    return events.select(
        F.col("user_id").alias("uid"),
        F.pmod(F.col("event_id"), F.lit(5)).alias("courseid"),
        F.pmod(F.col("event_id"), F.lit(7)).alias("pointid"),
        F.concat(F.lit("q"), F.pmod(F.col("event_id"), F.lit(30)).cast("string")).alias(
            "questionid"
        ),
        F.when(F.col("value") > 10, "1").otherwise("0").alias("istrue"),
        fmt_ts("ts").alias("createtime"),
    )
