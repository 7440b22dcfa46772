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
