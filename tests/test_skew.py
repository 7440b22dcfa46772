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


def test_salt_assignment_is_partitioning_invariant(spark, sf_dir):
    """The salt must be a pure function of row content: the stage-1
    (key, salt) groups have to come out identical no matter how the
    input is partitioned, or a stage retry could re-bucket rows."""
    from edu_online_spark.functions.skew import salted_agg

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type"
    )

    def stage1_groups(df):
        out = salted_agg(
            df,
            ["event_type"],
            {"cnt": F.count("*")},
            lambda n: F.sum(n).cast("long"),
            salt=8,
            salt_cols=["event_id"],
        )
        # peek at stage-1 by rebuilding it the same way the helper does
        s = df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("event_id")), F.lit(8))
        )
        groups = {
            (r["event_type"], r["_salt"]): r["cnt"]
            for r in s.groupBy("event_type", "_salt")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        totals = {r["event_type"]: r["cnt"] for r in out.collect()}
        return groups, totals

    g1, t1 = stage1_groups(events.repartition(4))
    g2, t2 = stage1_groups(events.repartition(17, "event_type"))
    assert g1 == g2  # identical sub-key assignment under both layouts
    assert t1 == t2


def test_salted_join_matches_plain_join(spark, sf_dir):
    """salted_join ≡ plain inner join, any input partitioning."""
    from edu_online_spark.functions.skew import salted_join

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "user_id"
    )
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 3), ("error", 4), ("signup", 5)],
        ["event_type", "weight"],
    )
    plain = {
        (r["event_id"], r["weight"])
        for r in events.join(dim, ["event_type"]).collect()
    }
    salted = {
        (r["event_id"], r["weight"])
        for r in salted_join(
            events.repartition(7), dim, ["event_type"], salt=8
        ).collect()
    }
    assert salted == plain and len(plain) > 0


def test_salted_agg_refuses_degenerate_salt(spark):
    """A frame with only the key columns has no content to salt from —
    the old fallback hashed the key itself, a constant per key (zero
    spreading). That degenerate case must raise, not silently no-op."""
    import pytest

    from edu_online_spark.functions.skew import salted_agg, salted_join

    df = spark.createDataFrame([("a",), ("a",), ("b",)], ["k"])
    with pytest.raises(ValueError, match="non-key"):
        salted_agg(df, ["k"], {"cnt": F.count("*")}, lambda n: F.sum(n))
    small = spark.createDataFrame([("a", 1)], ["k", "dim"])
    with pytest.raises(ValueError, match="non-join"):
        salted_join(df, small, ["k"])
    # explicit salt_cols is the caller's informed override — allowed
    out = salted_agg(
        df, ["k"], {"cnt": F.count("*")}, lambda n: F.sum(n), salt_cols=["k"]
    )
    assert {(r["k"], r["cnt"]) for r in out.collect()} == {("a", 2), ("b", 1)}
