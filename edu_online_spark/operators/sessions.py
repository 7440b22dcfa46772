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


def purchase_view_window_counts(events: DataFrame, window_sec: int = 3600) -> DataFrame:
    """Range join, scale-shaped: views within the hour before each
    purchase, counted per purchase.

    A naive time-range join (`v.ts BETWEEN p.ts - 1h AND p.ts` with only
    the user as equi-key) degenerates into a per-user cross join. The
    100 TB rendering BINS time: every view carries its hour bucket, each
    purchase probes exactly two buckets (its own + the previous — a
    1-hour window can only span two), so the join is pure equi on
    (user_id, bin) with the precise range as a residual filter. Join
    fan-out is bounded by events-per-user-per-hour, not events-per-user.
    Purchases with no prior views are kept via the final left join
    (count 0).
    """
    epoch = F.col("ts").cast("timestamp").cast("double")
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        epoch.alias("v_epoch"),
        F.floor(epoch / window_sec).alias("bin"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts"), epoch.alias("p_epoch")
    )
    probes = purchases.withColumn(
        "bin",
        F.explode(
            F.array(
                F.floor(F.col("p_epoch") / window_sec) - 1,
                F.floor(F.col("p_epoch") / window_sec),
            )
        ),
    )
    matched = probes.join(
        views,
        (probes.user_id == views.v_user)
        & (probes.bin == views.bin)
        & (views.v_epoch >= probes.p_epoch - window_sec)
        & (views.v_epoch < probes.p_epoch),
    )
    counts = matched.groupBy("event_id").agg(F.count("*").alias("n_views_1h"))
    return (
        purchases.join(counts, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            "purchase_ts",
            F.coalesce(F.col("n_views_1h"), F.lit(0)).alias("n_views_1h"),
        )
    )


def purchases_minutely_gapfill(events: DataFrame) -> DataFrame:
    """Time-series resample + gap-fill + LOCF over the purchase stream.

    A dense minute spine (sequence/explode of the observed min..max —
    the spine is arithmetic, it never touches storage) left-joined to
    per-minute purchase counts; missing minutes become cnt 0, and a
    last-observation-carried-forward column (window `last(ignorenulls)`)
    shows the canonical imputation shape. One shuffle for the counts,
    one window pass for LOCF. The unpartitioned LOCF window is safe at
    any data scale because it runs over the SPINE, whose row count is
    calendar-bounded (~526k minutes/year) regardless of corpus size —
    only the per-minute aggregate sees the raw events.
    """
    minute = F.date_trunc("minute", F.col("ts"))
    purchases = events.filter(F.col("event_type") == "purchase")
    per_min = purchases.groupBy(minute.alias("minute")).agg(
        F.count("*").alias("observed")
    )
    spine = (
        purchases.agg(
            F.min(minute).alias("lo"), F.max(minute).alias("hi")
        )
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 MINUTE"))
            ).alias("minute")
        )
    )
    w = Window.orderBy("minute").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(per_min, "minute", "left")
        .select(
            "minute",
            F.coalesce(F.col("observed"), F.lit(0)).alias("n_purchases"),
            F.last("observed", ignorenulls=True).over(w).alias("locf_purchases"),
        )
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


def q_purchase_view_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return purchase_view_window_counts(load_table(spark, sf_dir, "events"))


def q_purchases_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return purchases_minutely_gapfill(load_table(spark, sf_dir, "events"))


def scd2_user_status(events: DataFrame) -> DataFrame:
    """SCD2 (type-2 slowly-changing-dimension) history build: each
    user's event_type sequence collapsed into validity intervals —
    the warehouse shape for "what was X's status over time", built
    from an append-only event log in one pass.

    Gaps-and-islands again: a change row starts a new interval
    (lag != current), `valid_to` is the NEXT change's timestamp (lead
    over the change rows), open intervals carry NULL + is_current.
    Windows partition by user_id — high-cardinality, uniform; no
    global sort anywhere. Ties on ts break by event_id (deterministic
    across engines).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_user_status(load_table(spark, sf_dir, "events"))


def purchase_training_examples(events: DataFrame) -> DataFrame:
    """Leakage-free training-set construction (the feature-store
    point-in-time join): one example row per purchase, every feature
    computed ONLY from the user's events STRICTLY BEFORE that purchase.

    The naive rendering re-aggregates the user's history per example
    (a per-label self-join — quadratic in events-per-user and a
    different scan per cutoff). The scale rendering is the same trick
    as purchase_attribution: running window frames ending at -1 row
    over the (ts, event_id)-ordered stream — ONE shuffle on user_id,
    each feature an incremental aggregate, label rows filtered at the
    end. Adding a feature is adding a window column, not a join.

    Monetary feature sums run in decimal (exact, order-independent)
    and surface as double — a running double sum's value would depend
    on accumulation order and break cross-engine certification.
    """
    hist = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    feats = events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.count(F.when(F.col("event_type") == "view", True)).over(hist).alias(
            "n_prior_views"
        ),
        F.count(F.when(F.col("event_type") == "purchase", True)).over(hist).alias(
            "n_prior_purchases"
        ),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).cast("decimal(18,6)")
            ).over(hist),
            F.lit(0).cast("decimal(18,6)"),
        )
        .cast("double")
        .alias("prior_purchase_value"),
        F.count(F.when(F.col("event_type") == "error", True)).over(hist).alias(
            "n_prior_errors"
        ),
        (
            F.col("ts").cast("timestamp").cast("double")
            - F.lag("ts").over(seq).cast("timestamp").cast("double")
        ).alias("secs_since_prev_event"),
    )
    return feats.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "n_prior_views",
        "n_prior_purchases",
        "prior_purchase_value",
        "n_prior_errors",
        "secs_since_prev_event",
        F.col("value").alias("label_value"),
    )


def q_training_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return purchase_training_examples(load_table(spark, sf_dir, "events"))


def purchase_status_asof(events: DataFrame) -> DataFrame:
    """Temporal dimension enrichment: each purchase tagged with the
    user's state AS OF that instant — the last non-purchase event type
    strictly before it and when that state began. The point-in-time
    join against an SCD2-style status history, rendered without
    building or range-joining the interval table: a conditional
    running MAX of (ts, event_id, event_type) structs over the ordered
    event stream picks the latest prior state in one user_id shuffle
    (struct comparison is lexicographic, so the max is the latest
    (ts, event_id) — deterministic under ties).
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.max(
        F.when(
            F.col("event_type") != "purchase",
            F.struct("ts", "event_id", "event_type"),
        )
    ).over(w)
    return (
        events.withColumn("prior", prior)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("prior.event_type").alias("status_asof"),
            F.col("prior.ts").alias("status_since"),
        )
    )


def q_status_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    return purchase_status_asof(load_table(spark, sf_dir, "events"))


QUERIES = {
    "events_sessionize": q_sessionize,
    "events_scd2_status": q_scd2,
    "events_session_stats": q_session_stats,
    "events_region_enrich": q_region_enrichment,
    "purchase_attribution": q_purchase_attribution,
    "purchase_view_window_counts": q_purchase_view_window,
    "purchases_minutely_gapfill": q_purchases_gapfill,
    "purchase_training_examples": q_training_examples,
    "purchase_status_asof": q_status_asof,
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
               CAST(epoch(max(ts)) - epoch(min(ts)) AS DOUBLE)
                   AS duration_sec
        FROM with_sid GROUP BY user_id, session_id
    )
"""

ORACLE = {
    "events_scd2_status": """
        WITH changes AS (
            SELECT user_id, event_type, ts, event_id
            FROM (
                SELECT user_id, event_type, ts, event_id,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_type
                FROM events
            )
            WHERE prev_type IS NULL OR prev_type != event_type
        )
        SELECT user_id, event_type AS status, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL AS is_current
        FROM changes
    """,
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
    "purchase_view_window_counts": """
        SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
               (SELECT count(*) FROM events v
                WHERE v.event_type = 'view' AND v.user_id = p.user_id
                  AND epoch(v.ts) >= epoch(p.ts) - 3600
                  AND epoch(v.ts) <  epoch(p.ts)) AS n_views_1h
        FROM events p WHERE p.event_type = 'purchase'
    """,
    "purchases_minutely_gapfill": """
        WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        per_min AS (
            SELECT date_trunc('minute', ts) AS minute, count(*) AS observed
            FROM p GROUP BY 1
        ),
        spine AS (
            SELECT unnest(generate_series(min(date_trunc('minute', ts)),
                                          max(date_trunc('minute', ts)),
                                          INTERVAL 1 MINUTE)) AS minute
            FROM p
        )
        SELECT s.minute,
               coalesce(m.observed, 0) AS n_purchases,
               last_value(m.observed IGNORE NULLS)
                   OVER (ORDER BY s.minute ROWS UNBOUNDED PRECEDING)
                   AS locf_purchases
        FROM spine s LEFT JOIN per_min m ON s.minute = m.minute
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
               CAST(epoch(ts) - epoch(last_view_ts) AS DOUBLE) AS gap_sec
        FROM w WHERE event_type = 'purchase'
    """,
    # Same strictly-prior ROWS frame, same (ts, event_id) total order;
    # the money sum runs in DECIMAL then surfaces as DOUBLE (see the
    # operator docstring — running double sums are order-dependent).
    "purchase_training_examples": """
        WITH feat AS (
            SELECT event_id, user_id, ts, event_type, value,
                   count(CASE WHEN event_type = 'view' THEN 1 END)
                       OVER hist AS n_prior_views,
                   count(CASE WHEN event_type = 'purchase' THEN 1 END)
                       OVER hist AS n_prior_purchases,
                   CAST(coalesce(
                       sum(CASE WHEN event_type = 'purchase'
                                THEN CAST(value AS DECIMAL(18,6)) END)
                           OVER hist,
                       0) AS DOUBLE) AS prior_purchase_value,
                   count(CASE WHEN event_type = 'error' THEN 1 END)
                       OVER hist AS n_prior_errors,
                   CAST(epoch(ts) - epoch(lag(ts) OVER seq) AS DOUBLE)
                       AS secs_since_prev_event
            FROM events
            WINDOW hist AS (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING),
                   seq AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT event_id, user_id, ts AS purchase_ts,
               n_prior_views, n_prior_purchases, prior_purchase_value,
               n_prior_errors, secs_since_prev_event,
               value AS label_value
        FROM feat WHERE event_type = 'purchase'
    """,
    # Same lexicographic struct-max over the strictly-prior frame.
    "purchase_status_asof": """
        WITH w AS (
            SELECT event_id, user_id, ts, event_type,
                   max(CASE WHEN event_type != 'purchase'
                       THEN {'ts': ts, 'event_id': event_id,
                             'event_type': event_type} END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS prior
            FROM events
        )
        SELECT event_id, user_id, ts AS purchase_ts,
               prior.event_type AS status_asof,
               prior.ts AS status_since
        FROM w WHERE event_type = 'purchase'
    """,
}
