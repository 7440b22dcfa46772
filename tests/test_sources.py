"""Source-adapter plumbing: Kafka option map + wire-schema projection
(unit-level — the container has no spark-sql-kafka connector), and the
topic-partitioned archive layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from edu_online_spark.streaming import jobs
from edu_online_spark.streaming.sources import (
    KAFKA_PROJECTION,
    file_stream,
    kafka_reader_options,
)


def test_kafka_reader_options_plumbing():
    opts = kafka_reader_options(
        "register_topic,qz_log", "b-1:9092,b-2:9092",
        starting_offsets="latest", max_offsets_per_trigger=10000,
    )
    assert opts == {
        "kafka.bootstrap.servers": "b-1:9092,b-2:9092",
        "subscribe": "register_topic,qz_log",
        "startingOffsets": "latest",
        "maxOffsetsPerTrigger": "10000",
    }
    # rate cap omitted unless requested (reference default: uncapped)
    assert "maxOffsetsPerTrigger" not in kafka_reader_options("t", "b")


def test_kafka_projection_normalizes_wire_schema(spark):
    """The projection must turn Kafka's binary key/value into the
    `value: string` contract every job consumes, preserving the
    metadata columns."""
    import datetime

    rows = [
        (
            b"k1",
            b"u1\t1\t2026-08-13 10:00:01",
            "register_topic",
            0,
            42,
            datetime.datetime(2026, 8, 13, 10, 0, 1),
        )
    ]
    wire = spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )
    out = wire.selectExpr(*KAFKA_PROJECTION)
    assert [f.name for f in out.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp",
    ]
    r = out.collect()[0]
    assert r["key"] == "k1" and r["value"].startswith("u1\t")
    assert r["topic"] == "register_topic" and r["offset"] == 42


def test_rawlog_archive_partitions_by_topic_and_day(spark, tmp_path):
    """Two topics in one stream must land in disjoint topic=/day= dirs
    (RawLogSparkStreaming.scala:83-89 layout parity)."""
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "b1.txt"), "w") as f:
        f.write("reg-payload-1\nqz-payload-1\nreg-payload-2\n")

    raw = file_stream(spark, src).withColumn(
        "topic",
        F.when(F.col("value").startswith("reg"), "register_topic").otherwise("qz_log"),
    )
    q = jobs.rawlog_archive_job(raw, out, ckpt, available_now=True)
    q.awaitTermination(120)

    topics = sorted(d for d in os.listdir(out) if d.startswith("topic="))
    assert topics == ["topic=qz_log", "topic=register_topic"]
    for t in topics:
        days = os.listdir(os.path.join(out, t))
        assert any(d.startswith("day=") for d in days)
    df = spark.read.parquet(out)
    assert df.filter(F.col("topic") == "register_topic").count() == 2
    assert df.filter(F.col("topic") == "qz_log").count() == 1


def test_max_files_per_trigger_splits_batches(spark, tmp_path):
    """T5 plumbing: the rate cap actually limits each micro-batch —
    three files with maxFilesPerTrigger=1 must take three triggers."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    os.makedirs(src, exist_ok=True)
    for i in range(3):
        with open(os.path.join(src, f"b{i}.txt"), "w") as f:
            f.write(f"u{i}\t1\t2026-08-13 10:00:0{i}\n")

    stream = file_stream(spark, src, max_files_per_trigger=1)
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(batches) == 3
    assert all(p["numInputRows"] == 1 for p in batches)
    assert spark.read.parquet(out).count() == 3


def test_console_debug_job_runs(spark, tmp_path, capfd):
    """K1 console sink: starts, drains, and prints the batch table."""
    from edu_online_spark.streaming import jobs

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "b1.txt"), "w") as f:
        f.write("hello-console\n")
    q = jobs.console_debug_job(file_stream(spark, src), ckpt, available_now=True)
    q.awaitTermination(120)
    # console output is emitted by the JVM; assert the query drained
    assert q.lastProgress["numInputRows"] >= 0 and not q.isActive


def test_kafka_writer_plumbing(spark):
    """K5: payload projection meets the Kafka writer contract and the
    option map carries topic + brokers (connector-free)."""
    from edu_online_spark.streaming.sources import (
        kafka_writer_options,
        to_kafka_payload,
    )

    assert kafka_writer_options("register_topic", "b:9092") == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "register_topic",
    }
    df = spark.createDataFrame([(1, "payload")], ["id", "line"])
    out = to_kafka_payload(df, "line", key_col="id")
    assert [f.name for f in out.schema.fields] == ["key", "value"]
    r = out.collect()[0]
    assert r["key"] == "1" and r["value"] == "payload"


def test_register_views_sql_equals_dataframe(spark, sf_dir):
    """The SQL surface: after register_views, a plain spark.sql query
    returns exactly what the DataFrame twin returns (same relations,
    same Catalyst planning)."""
    from pyspark.sql import functions as F

    from edu_online_spark.sources.tables import register_views

    names = register_views(spark, sf_dir)
    assert set(names) >= {"documents", "events", "lineitem"}
    via_sql = spark.sql(
        "SELECT source, count(*) AS n FROM documents GROUP BY source"
    )
    via_df = (
        __import__("edu_online_spark.sources", fromlist=["load_table"])
        .load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )
    # ts conversion applied inside the view too (nanos -> timestamp_ntz)
    t = spark.sql("SELECT ts FROM events LIMIT 1").schema["ts"].dataType.typeName()
    assert t == "timestamp_ntz"


def test_gzip_log_input_decodes_identically(spark, tmp_path):
    """Compressed replay logs: Spark's text reader handles .gz
    transparently, and the decode pipeline produces the same rows as
    the plain file — the archival format costs nothing in the code
    path. (gz is non-splittable: one file = one task, so archives
    should be many moderate files, not one giant one — that layout
    note lives in SCALE.md.)"""
    import gzip
    import os

    from edu_online_spark.sources.logs import decode_register_log

    lines = [
        "u1\t1\t2026-08-13 10:00:01",
        "u2\t2\t2026-08-13 10:00:02",
        "corrupt line",
        "u3\t9\t2026-08-13 10:00:03",
    ]
    plain_dir, gz_dir = str(tmp_path / "plain"), str(tmp_path / "gz")
    os.makedirs(plain_dir), os.makedirs(gz_dir)
    with open(os.path.join(plain_dir, "b.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with gzip.open(os.path.join(gz_dir, "b.txt.gz"), "wt") as f:
        f.write("\n".join(lines) + "\n")

    def rows(d):
        return sorted(
            map(tuple, decode_register_log(spark.read.text(d)).collect())
        )

    assert rows(gz_dir) == rows(plain_dir)
    assert len(rows(gz_dir)) == 3  # corrupt line quarantined in both
