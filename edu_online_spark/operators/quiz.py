"""Quiz knowledge-point mastery (SURVEY §2.4 A3-A9, QzPointStreaming.scala).

The reference computes, per (uid, courseid, pointid):
  questionids  distinct attempted question ids, kept as CSV
               (QzPointStreaming.scala:135,160,176)
  qz_count     number of distinct questions attempted (:161)
  qz_sum       total attempts (:137,162)
  qz_istrue    correct attempts (:138,163)
  correct_rate qz_istrue / qz_sum (:168)
  mastery_rate (qz_count / 30) * correct_rate (:170-172; 30 = fixed
               questions-per-point constant at :171)
  createtime   earliest attempt time (:139)

It does this with one MySQL SELECT + UPSERT per key per batch (A8). Our
batch form is ONE hash aggregation; the streaming form (streaming/jobs)
keeps history in Spark's state store and upserts once per trigger.

Scale notes: groupBy(uid, courseid, pointid) — high-cardinality
composite key, uniform by construction; partial aggregation collapses
each map task to one row per key before shuffle. `collect_set` is the
only unbounded-per-key state; the reference semantics cap it at 30
questions per point, so state is bounded. For truly unbounded domains
use `approx_count_distinct` (offered in quiz_mastery_approx).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT
from .synth import QUIZ_SQL_VIEW, quiz_view


def mastery_agg(qz: DataFrame, questions_per_point: int = DEFAULT.questions_per_point) -> DataFrame:
    """One-shot batch mastery aggregation (A3-A9)."""
    return (
        qz.groupBy("uid", "courseid", "pointid")
        .agg(
            # one set aggregate feeds both the CSV and the distinct count:
            # count_distinct alongside other aggs would trigger Spark's
            # two-exchange distinct-expand plan (verified in test_plans)
            F.array_sort(F.collect_set("questionid")).alias("qset"),
            F.count("*").alias("qz_sum"),
            F.sum(F.when(F.col("istrue") == "1", 1).otherwise(0)).alias("qz_istrue"),
            F.min("createtime").alias("createtime"),
        )
        .withColumn("questionids", F.array_join("qset", ","))
        .withColumn("qz_count", F.size("qset").cast("long"))
        .drop("qset")
        .withColumn("correct_rate", F.col("qz_istrue") / F.col("qz_sum"))
        .withColumn(
            "mastery_rate",
            (F.col("qz_count") / F.lit(float(questions_per_point)))
            * F.col("correct_rate"),
        )
    )


def mastery_agg_approx(qz: DataFrame, questions_per_point: int = DEFAULT.questions_per_point) -> DataFrame:
    """Sketch variant for unbounded question domains: HLL++ distinct count,
    no per-key set state — constant memory per key at any scale."""
    return (
        qz.groupBy("uid", "courseid", "pointid")
        .agg(
            F.approx_count_distinct("questionid").alias("qz_count"),
            F.count("*").alias("qz_sum"),
            F.sum(F.when(F.col("istrue") == "1", 1).otherwise(0)).alias("qz_istrue"),
            F.min("createtime").alias("createtime"),
        )
        .withColumn("correct_rate", F.col("qz_istrue") / F.col("qz_sum"))
        .withColumn(
            "mastery_rate",
            (F.col("qz_count") / F.lit(float(questions_per_point)))
            * F.col("correct_rate"),
        )
    )


def merge_with_history(batch: DataFrame, history: DataFrame) -> DataFrame:
    """Merge a batch aggregate with accumulated history (A8,
    QzPointStreaming.scala:142-163) — the reference's per-key
    SELECT+merge, re-expressed as one outer join + array_union.

    `history` has the same shape as mastery_agg output. Used by the
    streaming job's foreachBatch upsert; also useful for incremental
    batch refreshes.
    """
    b, h = batch.alias("b"), history.alias("h")
    key = ["uid", "courseid", "pointid"]
    joined = b.join(h, key, "full_outer")
    merged_qids = F.array_sort(
        F.array_union(
            F.split(F.coalesce(F.col("b.questionids"), F.lit("")), ","),
            F.split(F.coalesce(F.col("h.questionids"), F.lit("")), ","),
        )
    )
    merged_qids = F.array_join(F.filter(merged_qids, lambda x: x != ""), ",")
    qz_sum = F.coalesce(F.col("b.qz_sum"), F.lit(0)) + F.coalesce(
        F.col("h.qz_sum"), F.lit(0)
    )
    qz_istrue = F.coalesce(F.col("b.qz_istrue"), F.lit(0)) + F.coalesce(
        F.col("h.qz_istrue"), F.lit(0)
    )
    out = joined.select(
        *key,
        merged_qids.alias("questionids"),
        qz_sum.alias("qz_sum"),
        qz_istrue.alias("qz_istrue"),
        F.least(F.col("b.createtime"), F.col("h.createtime")).alias("_lc"),
        F.coalesce(F.col("b.createtime"), F.col("h.createtime")).alias("_cc"),
    )
    out = out.withColumn("createtime", F.coalesce(F.col("_lc"), F.col("_cc"))).drop(
        "_lc", "_cc"
    )
    out = out.withColumn(
        "qz_count", F.size(F.when(F.col("questionids") == "", F.array()).otherwise(F.split("questionids", ",")))
    )
    return (
        out.withColumn("correct_rate", F.col("qz_istrue") / F.col("qz_sum"))
        .withColumn(
            "mastery_rate",
            (F.col("qz_count") / F.lit(float(DEFAULT.questions_per_point)))
            * F.col("correct_rate"),
        )
    )


# ---------------------------------------------------------------------------
# Oracle-checked query registry
# ---------------------------------------------------------------------------

def q_quiz_mastery(spark, sf_dir):
    from ..sources import load_table

    return mastery_agg(quiz_view(load_table(spark, sf_dir, "events")))


def q_quiz_mastery_approx(spark, sf_dir):
    """Certified form of the sketch variant (boolean-tolerance oracle,
    see operators/sketches.py for the pattern): exact per-key counts
    hash-checked cross-engine, plus a pinned boolean asserting the
    HLL++ distinct estimate sits within max(1, 5%) of the exact count —
    so the driver certifies the sketch path, not just its row count.
    `mastery_agg_approx` remains the production operator."""
    from ..sources import load_table

    qz = quiz_view(load_table(spark, sf_dir, "events"))
    agg = qz.groupBy("uid", "courseid", "pointid").agg(
        F.count_distinct("questionid").alias("qz_count"),
        F.approx_count_distinct("questionid").alias("_approx"),
        F.count("*").alias("qz_sum"),
        F.sum(F.when(F.col("istrue") == "1", 1).otherwise(0)).alias("qz_istrue"),
        F.min("createtime").alias("createtime"),
    )
    tol = F.greatest(F.lit(1.0), F.lit(0.05) * F.col("qz_count"))
    return agg.select(
        "uid", "courseid", "pointid", "qz_count", "qz_sum", "qz_istrue",
        "createtime",
        (F.abs(F.col("_approx") - F.col("qz_count")) <= tol).alias(
            "approx_within_tol"
        ),
    )


QUERIES = {
    "quiz_mastery": q_quiz_mastery,
    # boolean-tolerance oracle: exact columns hash-checked, the HLL++
    # estimate pinned to its accuracy envelope (the sketch form is the
    # unbounded-question-domain variant of quiz_mastery)
    "quiz_mastery_approx": q_quiz_mastery_approx,
}

ORACLE = {
    "quiz_mastery": f"""
        WITH qz AS ({QUIZ_SQL_VIEW}),
        agg AS (
            SELECT uid, courseid, pointid,
                   array_to_string(list_sort(list_distinct(list(questionid))), ',')
                       AS questionids,
                   count(DISTINCT questionid) AS qz_count,
                   count(*) AS qz_sum,
                   CAST(sum(CASE WHEN istrue = '1' THEN 1 ELSE 0 END) AS BIGINT)
                       AS qz_istrue,
                   min(createtime) AS createtime
            FROM qz GROUP BY uid, courseid, pointid
        )
        SELECT uid, courseid, pointid, questionids, qz_count, qz_sum, qz_istrue,
               createtime,
               qz_istrue / qz_sum AS correct_rate,
               (qz_count / 30.0) * (qz_istrue / qz_sum) AS mastery_rate
        FROM agg
    """,
    "quiz_mastery_approx": f"""
        WITH qz AS ({QUIZ_SQL_VIEW})
        SELECT uid, courseid, pointid,
               count(DISTINCT questionid) AS qz_count,
               count(*) AS qz_sum,
               CAST(sum(CASE WHEN istrue = '1' THEN 1 ELSE 0 END) AS BIGINT)
                   AS qz_istrue,
               min(createtime) AS createtime,
               TRUE AS approx_within_tol
        FROM qz GROUP BY uid, courseid, pointid
    """,
}
