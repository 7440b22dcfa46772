"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``edu_online_spark`` package; this module is
the thin adapter the driver imports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from edu_online_spark import registry
from edu_online_spark.operators.quiz import mastery_agg
from edu_online_spark.operators.synth import quiz_view
from edu_online_spark.sources import load_table

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: quiz knowledge-point mastery (the reference's richest
    pipeline — QzPointStreaming.scala:124-184) over sf0.001 events."""
    return mastery_agg(quiz_view(load_table(spark, SMOKE_SF_DIR, "events")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
