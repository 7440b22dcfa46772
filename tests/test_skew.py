"""Salted aggregation (A10) equals the plain aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from edu_online_spark.functions.skew import salted_count


def test_salted_count_matches_plain(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    plain = {
        r["event_type"]: r["cnt"]
        for r in events.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    salted = {
        r["event_type"]: r["cnt"]
        for r in salted_count(events, ["event_type"]).collect()
    }
    assert salted == plain
