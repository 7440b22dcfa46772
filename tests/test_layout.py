"""Clustered-layout writer: each output file must own a disjoint key
range (that's what makes footer-stat pruning work)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from edu_online_spark.sources.layout import write_clustered


def test_write_clustered_produces_disjoint_file_ranges(spark, sf_dir, tmp_path):
    out = str(tmp_path / "clustered")
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    write_clustered(events, out, ["event_id"], num_files=6)

    ranges = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "event_id"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))

    assert len(ranges) > 1  # actually split into multiple files
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"

    # same rows, just reordered
    assert spark.read.parquet(out).count() == events.count()
