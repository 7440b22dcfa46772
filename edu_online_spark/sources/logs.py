"""Log-line decoders: raw text → typed DataFrames.

Re-expresses the reference's closure-based decoders (SURVEY §2.3 P1-P6)
as pure column expressions so they stay inside whole-stage codegen — no
Python executes per row:

- register TSV:  RegisterStreaming.scala:75-87 (arity filter + split + decode)
- quiz TSV:      QzPointStreaming.scala:66-77
- page JSON:     PageStreaming.scala:67-88 + JsonParseUtil.scala:15-22

Each decoder takes a DataFrame with a string ``value`` column (what a
Kafka source or text scan yields) and returns typed columns, dropping
malformed rows exactly like the reference (arity != n, unparseable JSON).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import schemas


def platform_name(code: Column) -> Column:
    """Dictionary decode "1"→PC, "2"→APP, else→Other
    (RegisterStreaming.scala:80-84, SURVEY §2.3 P4)."""
    return (
        F.when(code == "1", "PC").when(code == "2", "APP").otherwise("Other")
    )


def decode_register_log(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """TSV → (user_id, platform_code, platform, create_time).

    Arity filter (exactly 3 fields) per RegisterStreaming.scala:75; the
    filter+split+project pipeline fuses into one codegen stage.
    """
    parts = F.split(F.col(value_col), "\t")
    return (
        raw.select(parts.alias("p"))
        .filter(F.size("p") == 3)
        .select(
            F.col("p")[0].alias("user_id"),
            F.col("p")[1].alias("platform_code"),
            platform_name(F.col("p")[1]).alias("platform"),
            F.col("p")[2].cast("string").alias("create_time"),
        )
    )


def decode_register_log_ts(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """decode_register_log + a typed `event_ts` column for event-time
    operators (windows, watermarks, session windows, streaming dedup).

    ``try_to_timestamp`` + drop-on-null, same quarantine posture as
    decode_page_log_ts: one malformed create_time must not crash-loop a
    streaming query under ANSI mode, and a wall-clock fallback would
    poison the watermark on replay.
    """
    return (
        decode_register_log(raw, value_col)
        .withColumn("event_ts", F.try_to_timestamp(F.col("create_time")))
        .filter(F.col("event_ts").isNotNull())
    )


def decode_qz_log(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """TSV → 6 typed quiz columns (QzPointStreaming.scala:66-77).

    uid/courseid/pointid promoted to int (the reference defers .toInt to
    QzPointStreaming.scala:128-130; we type at the edge). ``try_cast``
    (not ``cast``) because the input is untrusted: under ANSI mode a
    6-field row with a non-numeric id would otherwise throw
    CAST_INVALID_INPUT and kill the whole job — one poison-pill record
    must quarantine the row, not halt a 100 TB stream. Rows whose ids
    fail the cast are dropped, extending the reference's drop-malformed
    posture (QzPointStreaming.scala:66) from arity to field types."""
    parts = F.split(F.col(value_col), "\t")
    return (
        raw.select(parts.alias("p"))
        .filter(F.size("p") == 6)
        .select(
            F.col("p")[0].try_cast("int").alias("uid"),
            F.col("p")[1].try_cast("int").alias("courseid"),
            F.col("p")[2].try_cast("int").alias("pointid"),
            F.col("p")[3].alias("questionid"),
            F.col("p")[4].alias("istrue"),
            F.col("p")[5].alias("createtime"),
        )
        .filter(
            F.col("uid").isNotNull()
            & F.col("courseid").isNotNull()
            & F.col("pointid").isNotNull()
        )
    )


def decode_page_log_ts(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """decode_page_log + an `event_ts` timestamp column for event-time
    operators (stream-stream joins need watermarks on both sides).

    Event time comes from the `ts` field in the JSON payload; rows
    without a parseable one are DROPPED, not defaulted. A wall-clock
    fallback (current_timestamp) would poison the watermark during
    replay/backfill: one ts-less record stamps 'now', the watermark
    jumps to now-delay, and every subsequent correctly-timestamped
    historical event becomes 'late' and is silently discarded — the
    join goes quiet with no error. Dropping the malformed row keeps the
    failure local and visible (same quarantine posture as the corrupt-
    record filter above it).
    """
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        list(schemas.PAGE_LOG.fields)
        + [StructField("ts", StringType()), StructField("_corrupt", StringType())]
    )
    parsed = F.from_json(
        F.col(value_col), schema, {"columnNameOfCorruptRecord": "_corrupt"}
    )
    df = raw.select(parsed.alias("j")).filter(F.col("j._corrupt").isNull())
    return df.select(
        *[
            F.coalesce(F.col(f"j.{f.name}"), F.lit("")).alias(f.name)
            for f in schemas.PAGE_LOG.fields
        ],
        # try_to_timestamp, not to_timestamp: under ANSI mode (the default,
        # and the driver's bare session) a malformed ts would throw
        # CAST_INVALID_INPUT before the isNotNull filter below could drop
        # the row — a poison-pill crash loop in a streaming job.
        F.try_to_timestamp(F.col("j.ts")).alias("event_ts"),
    ).filter(F.col("event_ts").isNotNull())


def decode_page_log(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON line → 7 string fields, missing keys default to "" and
    unparseable lines are dropped (PageStreaming.scala:68-85).

    Malformed lines surface in a corrupt-record column (PERMISSIVE mode)
    and are filtered — same drop semantics as the reference's try/catch
    (JsonParseUtil.scala:15-22) without a UDF. An empty-but-valid object
    `{}` is kept with all-default fields, matching fastjson behavior.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    # fresh StructType — .add() would mutate the shared module constant
    schema = StructType(
        list(schemas.PAGE_LOG.fields) + [StructField("_corrupt", StringType())]
    )
    parsed = F.from_json(
        F.col(value_col), schema, {"columnNameOfCorruptRecord": "_corrupt"}
    )
    df = raw.select(parsed.alias("j")).filter(F.col("j._corrupt").isNull())
    return df.select(
        *[
            F.coalesce(F.col(f"j.{f.name}"), F.lit("")).alias(f.name)
            for f in schemas.PAGE_LOG.fields
        ]
    )
