"""Mergeable-sketch operators: HLL distinct-count rollups and Theta set
operations (Apache DataSketches, built into Spark 3.5+ as
`hll_sketch_agg` / `theta_sketch_agg` families — JVM-side, codegen'd,
zero Python).

Why sketches are first-class in a 100 TB engine: an exact
COUNT(DISTINCT) shuffles every distinct key once per query, and a
day→month→year rollup of distinct users CANNOT reuse the daily result
(distincts don't add). A sketch is a small mergeable state: daily
sketches union associatively into monthly/yearly estimates without
rescanning the fact table, and partial sketches merge map-side like any
algebraic aggregate. Theta sketches additionally support INTERSECTION
and DIFFERENCE — audience-overlap questions that exact SQL needs a
self-join for, answered from two per-segment sketches.

The reference has no sketches (its distinct logic is exact per-key
state, QzPointStreaming.scala:160-161); these extend the engine the
same way the ANN/dedup modules do.

Oracle strategy ("boolean tolerance"): sketch ESTIMATES are
implementation-specific, so a cross-engine value hash on the estimate
itself is impossible. Instead each query outputs (a) the EXACT answer,
computed in the same Spark job, hash-checked against DuckDB exactly,
and (b) a boolean per estimate asserting |est − exact| ≤ tol·exact,
which the oracle pins to TRUE. The driver's hash therefore fails if
either engine's exact arithmetic drifts OR Spark's estimate leaves its
accuracy envelope — a non-vacuous certification of both paths. The
exact column exists to power that proof; a production rollup would
carry only the sketches.

Tolerances: HLL lgConfigK=12 → RSE ≈ 1.04/√2¹² ≈ 1.6%; theta
lgNomEntries=12 similar. Testdata cardinalities (≤ thousands) sit in
the sketches' exact (sparse) range, so 5% is generous headroom while
still catching any real regression (a broken merge typically over- or
under-counts by far more).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

_TOL = 0.05


def _within(est: F.Column, exact: F.Column, tol: float = _TOL) -> F.Column:
    return (F.abs(est - exact) <= tol * exact) | (exact == 0)


def distinct_users_sketch_rollup(events: DataFrame) -> DataFrame:
    """Per event_type: daily HLL user sketches, merged into the all-time
    estimate via `hll_union_agg` — the hierarchical-rollup pattern
    (day→total here; day→month→year identically). The merge consumes
    the DAILY SKETCHES, not the fact table: at scale the second stage
    reads (event_type × day) rows of ~2 KB state.

    Output: exact distinct users (oracle-checked) + the merged
    estimate's tolerance boolean + n_days as the rollup's fan-in.
    """
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            "exact_users",
            _within(F.col("est"), F.col("exact_users")).alias("est_within_5pct"),
        )
    )


def audience_overlap_sketch(events: DataFrame) -> DataFrame:
    """Theta-sketch set algebra: |viewers ∩ purchasers| and
    |viewers \\ purchasers| estimated from ONE scan building two
    per-segment sketches, where exact SQL needs DISTINCT + self-join
    (users_view_and_purchase does exactly that; this is its sketch
    twin). At 100 TB the two sketches are ~32 KB each and the set ops
    are scalar functions on them.

    Conditional sketch inputs via when(): non-matching rows yield NULL,
    which the aggregate skips — one pass, no pre-filtering join.
    """
    sks = events.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "view", F.col("user_id")), 12
        ).alias("sk_v"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id")), 12
        ).alias("sk_p"),
    )
    ests = sks.select(
        F.theta_sketch_estimate(
            F.theta_intersection("sk_v", "sk_p")
        ).alias("est_overlap"),
        F.theta_sketch_estimate(
            F.theta_difference("sk_v", "sk_p")
        ).alias("est_view_only"),
    )
    viewers = events.filter(F.col("event_type") == "view").select("user_id").distinct()
    purchasers = (
        events.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    exact = (
        viewers.intersect(purchasers)
        .agg(F.count("*").alias("exact_overlap"))
        .crossJoin(
            viewers.exceptAll(purchasers).agg(F.count("*").alias("exact_view_only"))
        )
    )
    return ests.crossJoin(exact).select(
        "exact_overlap",
        "exact_view_only",
        _within(F.col("est_overlap"), F.col("exact_overlap")).alias("overlap_within_5pct"),
        _within(F.col("est_view_only"), F.col("exact_view_only")).alias(
            "view_only_within_5pct"
        ),
    )


def _q(fn, *tables):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(*[load_table(spark, sf_dir, t) for t in tables])

    return runner


QUERIES = {
    "events_hll_rollup": _q(distinct_users_sketch_rollup, "events"),
    "events_theta_overlap": _q(audience_overlap_sketch, "events"),
}

ORACLE = {
    # Exact columns hash-checked value-for-value; estimate booleans pinned
    # TRUE (see module docstring — this is the non-vacuous form for
    # engine-specific estimators).
    "events_hll_rollup": """
        SELECT event_type,
               COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS est_within_5pct
        FROM events
        GROUP BY event_type
    """,
    "events_theta_overlap": """
        WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
             p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        SELECT (SELECT COUNT(*) FROM v WHERE user_id IN (SELECT user_id FROM p))
                   AS exact_overlap,
               (SELECT COUNT(*) FROM v WHERE user_id NOT IN (SELECT user_id FROM p))
                   AS exact_view_only,
               TRUE AS overlap_within_5pct,
               TRUE AS view_only_within_5pct
    """,
}
