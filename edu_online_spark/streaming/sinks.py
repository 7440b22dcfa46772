"""Streaming sinks.

The reference commits offsets to MySQL after business logic
(at-least-once, RegisterStreaming.scala:121-137) and upserts results
row-by-row from executors (QzPointStreaming.scala:179-182). Here
offsets live in the checkpoint and sinks are idempotent-by-key
`foreachBatch` upserts — replayed batches overwrite the same keys, so
the end-to-end effect is exactly-once (fixing the replay-doubling bug,
SURVEY §2.8 T7).

`parquet_upsert` is the local-filesystem rendering (read, anti-join,
swap). On a cluster the same foreachBatch body becomes a Delta MERGE or
JDBC `INSERT ... ON CONFLICT` — the contract (keyed overwrite) is
identical, which is why the jobs take the sink as a parameter.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def parquet_upsert(path: str, key_cols: list[str]):
    """foreachBatch function: keyed upsert into a parquet directory.

    Merge = existing rows whose key is absent from the batch + the
    batch (new values win). The staging-dir swap keeps readers from
    seeing partial writes on the local FS; production storage with
    atomic MERGE (Delta/Iceberg/JDBC) replaces this mechanism, not the
    semantics.
    """

    def write(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        batch = batch.dropDuplicates(key_cols)
        if os.path.exists(path):
            old = spark.read.parquet(path)
            merged = old.join(batch.select(*key_cols), key_cols, "left_anti").unionByName(
                batch
            )
        else:
            merged = batch
        staging = f"{path}.staging"
        merged.write.mode("overwrite").parquet(staging)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(staging, path)

    return write


def parquet_append(path: str, partition_by: list[str] | None = None):
    """foreachBatch function: append-only partitioned parquet (archival)."""

    def write(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        w = batch.write.mode("append").option("compression", "snappy")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)

    return write
