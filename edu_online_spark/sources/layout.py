"""Data-layout writers: clustering for scan pruning.

Parquet pruning at 100 TB is only as good as the layout: footer
min/max stats prune a file ONLY if the file's value range is narrow.
An unsorted write spreads every key range across every file (stats
cover everything → nothing prunes); a range-repartitioned, sorted
write gives each file a disjoint slice, so a point/range predicate
touches O(1) files instead of all of them. This is the single cheapest
scan optimization a pipeline controls — no engine feature required,
just write order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Range-cluster + sort + write.

    repartitionByRange samples the cluster columns and assigns each
    output file a DISJOINT value range; sortWithinPartitions orders
    rows inside each file so row-group stats are narrow too (row-group
    skipping within a file). Downstream filtered scans prune both
    levels from footer stats alone.
    """
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def _morton_interleave(df: DataFrame, col_a: str, col_b: str, bits: int = 8):
    """Column expression: Morton (Z-order) code over two NORMALIZED
    dimensions.

    Raw bit-interleave degenerates when the columns' domains differ in
    magnitude (a 4-bit user_id interleaved with a 20-bit event_id gives
    a code whose high bits are all event_id — stripes, not rectangles).
    So each column is first min-max scaled onto [0, 2^bits) — the same
    reason production Z-ORDER implementations interleave range-bucket
    IDs, not raw values. The min/max pass is one 4-scalar aggregate;
    the interleave itself is shifts and masks, all codegen."""
    from pyspark.sql import functions as F

    mn_a, mx_a, mn_b, mx_b = (
        df.agg(
            F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
        ).first()
    )
    if mn_a is None or mn_b is None:  # empty input: no range to scale
        return F.lit(0).cast("long")
    top = (1 << bits) - 1

    def scaled(col, mn, mx):
        span = max(float(mx - mn), 1.0)
        return (
            ((F.col(col).cast("double") - float(mn)) * top / span)
            .cast("long")
        )

    a = scaled(col_a, mn_a, mx_a)
    b = scaled(col_b, mn_b, mx_b)
    code = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftrightunsigned(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftrightunsigned(b, i).bitwiseAND(F.lit(1))
        code = (
            code
            .bitwiseOR(F.shiftleft(bit_a, 2 * i))
            .bitwiseOR(F.shiftleft(bit_b, 2 * i + 1))
        )
    return code


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 8,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton) clustering over TWO columns.

    Linear clustering (write_clustered) makes the FIRST column's file
    ranges disjoint but leaves the second column full-range in every
    file — a predicate on it alone prunes nothing. Interleaving the
    bits makes each file cover a small rectangle of the 2-D value
    space, so footer stats narrow on BOTH columns and either
    single-column predicate skips most files. The standard layout for
    multi-predicate scan keys (Delta/Iceberg expose the same idea as
    OPTIMIZE ZORDER BY); here it's one derived column + range
    repartition — no engine extension.

    Each dimension is min-max normalized onto `bits` bits before the
    interleave (see _morton_interleave — raw bits degenerate to stripes
    when domains are unbalanced); 8 bits = 256 buckets per dimension is
    plenty for file-level pruning, and cost is linear in bits."""
    code = _morton_interleave(df, col_a, col_b, bits)
    (
        df.withColumn("_zorder", code)
        .repartitionByRange(num_files, "_zorder")
        .sortWithinPartitions("_zorder")
        .drop("_zorder")
        .write.mode(mode)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (and bucket-sorted) table write — the co-located
    join layout.

    Two tables bucketed on the same key into the same bucket count are
    ALREADY partitioned the way a shuffle would partition them, so a
    join between them needs no Exchange at all — and with `sort=True`
    each bucket file is pre-sorted on the key, so the sort-merge join
    needs no Sort either. At 100 TB this turns the nightly
    fact-to-fact join from the cluster's biggest shuffle into a
    zero-movement merge. The price is paid ONCE at write time (the
    bucketing write shuffles), then every downstream join rides free —
    the right trade for any join run more often than the data is
    rewritten.

    Bucket metadata lives in the catalog (`saveAsTable`; in-memory
    catalog locally, Hive metastore / Iceberg in production) — a plain
    `.parquet(path)` write cannot carry it.
    """
    if sort:
        # One file per bucket: the planner only trusts a bucket's sort
        # order (and can skip the SMJ Sort) when the bucket is a single
        # file, so align the write's partitioning with the bucket hash —
        # repartition(n, cols) and bucketBy(n, cols) use the same
        # Murmur3 HashPartitioning, making each task own exactly one
        # bucket.
        df = df.repartition(num_buckets, *bucket_cols)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.format("parquet").saveAsTable(table)


def write_training_shards(
    documents: DataFrame,
    path: str,
    shard_tokens: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Physically write the training-shard layout that
    operators/textops.assign_training_shards computes: one
    `shard_id=K/` parquet directory per ~shard_tokens-token shard,
    rows inside each shard ordered by their global epoch offset, and
    the shard manifest (doc counts, token masses, offsets, xor
    checksums) beside the data at `<path>.manifest`.

    This is the WebDataset-style export step a training run reads:
    the reader streams shards in shard_id order and rows in cum_tokens
    order and sees exactly the deterministic epoch permutation —
    reproducible across rewrites because nothing here uses rand().
    `repartition(shard_id)` co-locates each shard's rows into the task
    that writes its directory, so file count = shard count, not
    shards × tasks; sortWithinPartitions orders rows without any
    global sort. The manifest is written FIRST so a reader that sees
    the data dir can always verify it (a crash between the two writes
    leaves manifest-without-data, which fails loudly, never
    silently-unverifiable data).
    """
    from ..operators.textops import (
        SHARD_TOKEN_TARGET,
        assign_training_shards,
        shard_manifest,
    )

    shard_tokens = SHARD_TOKEN_TARGET if shard_tokens is None else shard_tokens
    shard_manifest(documents, shard_tokens).coalesce(1).write.mode(
        mode
    ).parquet(path + ".manifest")
    assigned = assign_training_shards(documents, shard_tokens)
    (
        assigned.join(documents.select("doc_id", "text"), "doc_id")
        .repartition("shard_id")
        .sortWithinPartitions("shard_id", "cum_tokens")
        .write.partitionBy("shard_id")
        .mode(mode)
        .parquet(path)
    )
