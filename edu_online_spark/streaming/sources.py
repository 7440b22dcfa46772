"""Streaming source adapters (SURVEY §2.1 S1-S3).

The reference's MyKafkaUtil.scala:32-53 (direct stream ± stored
offsets) maps to `readStream.format("kafka")`; its MySQL offset
recovery loops (RegisterStreaming.scala:44-64 etc.) disappear into the
checkpoint. File/rate sources cover the replay producers
(RegisterProducer.scala etc.) and tests — same `value: string` contract
as Kafka, so every job runs unchanged against any of them.

Kafka integration needs the spark-sql-kafka package on the classpath;
this container doesn't ship it, so kafka_stream() constructs the reader
but is exercised only in environments that have the connector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Normalized projection over Kafka's wire schema (key/value arrive as
# binary). Every downstream job consumes exactly these columns, which is
# the contract the file/rate adapters also satisfy.
KAFKA_PROJECTION = [
    "CAST(key AS STRING) AS key",
    "CAST(value AS STRING) AS value",
    "topic",
    "partition",
    "offset",
    "timestamp",
]


def kafka_reader_options(
    topics: str,
    brokers: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The option map for the Kafka reader, exposed as a pure function
    so the plumbing is unit-testable without the spark-sql-kafka
    connector on the classpath (tests/test_sources.py)."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_stream(
    spark: SparkSession,
    topics: str,
    brokers: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S1/S2: Kafka direct stream. Resume-from-offset (the reference's
    offset_manager table) is the checkpoint's job, so `startingOffsets`
    only matters on first start. maxOffsetsPerTrigger replaces the
    reference's maxRatePerPartition ingest caps (BASELINE.md)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(
        topics, brokers, starting_offsets, max_offsets_per_trigger
    ).items():
        reader = reader.option(k, v)
    return reader.load().selectExpr(*KAFKA_PROJECTION)


def kafka_writer_options(topic: str, brokers: str) -> dict[str, str]:
    """K5 (RegisterProducer.scala:30-43): the option map for writing a
    stream/batch back to Kafka. Pure function for connector-free unit
    testing; the frame must carry a `value` (and optionally `key`)
    column, which `to_kafka_payload` prepares."""
    return {"kafka.bootstrap.servers": brokers, "topic": topic}


def to_kafka_payload(df: DataFrame, value_col: str, key_col: str | None = None) -> DataFrame:
    """Project a DataFrame to Kafka's writer contract: CAST value (and
    key) to STRING under the canonical column names."""
    cols = [F.col(value_col).cast("string").alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def write_kafka_stream(df: DataFrame, topic: str, brokers: str, checkpoint: str):
    """K5 writer, assembled but not started — returns the
    DataStreamWriter so environments with the connector call .start().
    (This container ships no spark-sql-kafka; the option plumbing and
    payload projection are unit-tested without it.)"""
    writer = df.writeStream.format("kafka").option("checkpointLocation", checkpoint)
    for k, v in kafka_writer_options(topic, brokers).items():
        writer = writer.option(k, v)
    return writer


# ---------------------------------------------------------------------------
# File-backed Kafka stub (S1/S2 end-to-end without the connector jar)
# ---------------------------------------------------------------------------
#
# The container ships no spark-sql-kafka package and has no network to
# fetch one, so the real `format("kafka")` path can never execute here.
# The stub renders a broker as a DIRECTORY: each produced batch is one
# atomically-published JSONL file under <broker_dir>/<topic>/, each
# record carrying the full Kafka wire row (key, value, topic,
# partition, offset, timestamp). kafka_stub_stream() then honors the
# SAME option map kafka_reader_options() builds — bootstrap servers
# (the directory), subscribe (topic filter), maxOffsetsPerTrigger
# (file-granularity trigger cap) — and exposes the SAME wire schema
# (key/value as BINARY), so KAFKA_PROJECTION and every downstream job
# run against it unchanged. Swapping in a real broker is a one-line
# format change; everything downstream is already exercised.
#
# Deliberate deltas from a real broker, documented not hidden:
#   * startingOffsets='latest' is not supported (the file source reads
#     all files on first start; resume-from-checkpoint — the S2
#     behavior the reference implements by hand — works natively);
#   * maxOffsetsPerTrigger caps FILES per trigger, not records: a
#     produced file is the stub's offset range unit.

import json as _json
import os as _os


def kafka_stub_produce(
    broker_dir: str,
    topic: str,
    records: list[tuple[str | None, str]],
    partition: int = 0,
) -> int:
    """Publish one batch of (key, value) records to a stub topic,
    assigning contiguous per-(topic, partition) offsets by scanning the
    published filenames (part-<partition>-<start>-<n>.jsonl). The file
    is staged and renamed so the streaming file source never sees a
    half-written batch. Returns the first offset assigned."""
    import time as _time

    tdir = _os.path.join(broker_dir, topic)
    _os.makedirs(tdir, exist_ok=True)
    start = 0
    for name in _os.listdir(tdir):
        parts = name.split("-")
        if len(parts) == 4 and parts[0] == "part" and int(parts[1]) == partition:
            start = max(start, int(parts[2]) + int(parts[3].split(".")[0]))
    ts = _time.strftime("%Y-%m-%dT%H:%M:%S.000Z", _time.gmtime())
    fname = f"part-{partition}-{start}-{len(records)}.jsonl"
    staging = _os.path.join(tdir, "." + fname + ".tmp")
    with open(staging, "w") as f:
        for i, (key, value) in enumerate(records):
            f.write(
                _json.dumps(
                    {
                        "key": key,
                        "value": value,
                        "topic": topic,
                        "partition": partition,
                        "offset": start + i,
                        "timestamp": ts,
                    }
                )
                + "\n"
            )
    _os.rename(staging, _os.path.join(tdir, fname))
    return start


def kafka_stub_stream(
    spark: SparkSession,
    topics: str,
    brokers: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S1/S2 through the stub broker: consumes the SAME option map as
    kafka_stream (built by kafka_reader_options) and emits the SAME
    projected columns, so any job wired for Kafka runs against it
    verbatim."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    opts = kafka_reader_options(
        topics, brokers, starting_offsets, max_offsets_per_trigger
    )
    if opts["startingOffsets"] != "earliest":
        raise ValueError(
            "kafka_stub_stream supports startingOffsets='earliest' only "
            "(resume is the checkpoint's job, as with the real source)"
        )
    broker_dir = opts["kafka.bootstrap.servers"]
    subscribed = [t.strip() for t in opts["subscribe"].split(",") if t.strip()]
    wire = StructType(
        [
            StructField("key", StringType()),
            StructField("value", StringType()),
            StructField("topic", StringType()),
            StructField("partition", IntegerType()),
            StructField("offset", LongType()),
            StructField("timestamp", TimestampType()),
        ]
    )
    reader = spark.readStream.format("json").schema(wire)
    if "maxOffsetsPerTrigger" in opts:
        # file-granularity rendering of the record cap (see module note)
        reader = reader.option("maxFilesPerTrigger", "1")
    raw = (
        reader.option("pathGlobFilter", "part-*.jsonl")
        .option("recursiveFileLookup", "true")
        .load(broker_dir)
        .filter(F.col("topic").isin(subscribed))
    )
    # present Kafka's BINARY key/value wire types, then apply the shared
    # projection — the cast round-trip is exact for UTF-8 payloads
    return raw.select(
        F.encode("key", "UTF-8").alias("key"),
        F.encode("value", "UTF-8").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    ).selectExpr(*KAFKA_PROJECTION)


def write_kafka_stub_stream(
    df: DataFrame, topic: str, brokers: str, checkpoint: str
):
    """K5 through the stub broker: the producer-sink counterpart of
    kafka_stub_stream. Consumes the SAME payload contract as the real
    writer (a `value` column and optional `key`, as prepared by
    to_kafka_payload + kafka_writer_options) and publishes each trigger
    as one atomic offset file, so a downstream kafka_stub_stream
    consumer sees exactly what a real topic would carry
    (RegisterProducer.scala:30-43 parity at the contract level).
    Returns the started StreamingQuery."""
    opts = kafka_writer_options(topic, brokers)
    broker_dir, target = opts["kafka.bootstrap.servers"], opts["topic"]
    has_key = "key" in df.columns

    def publish(batch: DataFrame, batch_id: int) -> None:
        rows = batch.collect()  # producer batches are trigger-sized
        if not rows:
            return
        records = [
            (r["key"] if has_key else None, r["value"]) for r in rows
        ]
        kafka_stub_produce(broker_dir, target, records)

    return (
        df.writeStream.outputMode("append")
        .foreachBatch(publish)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def file_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """S3 / test source: line-per-record text files dropped into a dir.
    Emits the same `value: string` column as the Kafka adapter."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path).withColumnRenamed("value", "value")


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic load source for soak tests."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
