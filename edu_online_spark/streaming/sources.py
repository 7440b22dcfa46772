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
