"""Clustered-layout writer: each output file must own a disjoint key
range (that's what makes footer-stat pruning work)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from edu_online_spark.plans import explain_str

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


def _file_ranges(out: str, col: str):
    ranges = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == col
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    return ranges


def test_write_zordered_narrows_both_columns(spark, sf_dir, tmp_path):
    """Z-order: every file covers a small rectangle of the 2-D key
    space, so footer stats narrow on BOTH columns — linear clustering
    on the first column leaves the second full-range in every file."""
    from edu_online_spark.sources.layout import write_zordered

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    n_rows = events.count()
    lin, zord = str(tmp_path / "lin"), str(tmp_path / "zord")
    write_clustered(events, lin, ["event_id"], num_files=8)
    write_zordered(events, zord, "event_id", "user_id", num_files=8)

    def avg_width(ranges):
        return sum(hi - lo for lo, hi in ranges) / len(ranges)

    global_user = _file_ranges(lin, "user_id")
    z_user = _file_ranges(zord, "user_id")
    assert len(z_user) > 1
    # linear layout: user_id ~full-range per file; z-order: much narrower
    assert avg_width(z_user) < 0.6 * avg_width(global_user)
    # and event_id is still narrowed too (each file a rectangle, not a
    # stripe): every z-file's event_id width far below the global span
    z_event = _file_ranges(zord, "event_id")
    global_span = max(hi for _, hi in z_event) - min(lo for lo, _ in z_event)
    assert avg_width(z_event) < 0.6 * global_span
    # same rows, just reordered
    assert spark.read.parquet(zord).count() == n_rows


def test_write_zordered_empty_input_is_safe(spark, tmp_path):
    """An empty frame (everything gated out upstream) writes an empty
    dataset instead of raising TypeError on the None min/max."""
    from edu_online_spark.sources.layout import write_zordered

    empty = spark.createDataFrame([], "event_id long, user_id long")
    out = str(tmp_path / "empty_z")
    write_zordered(empty, out, "event_id", "user_id", num_files=2)
    assert spark.read.parquet(out).count() == 0


def test_bucketed_join_needs_no_exchange_or_sort(spark, sf_dir, tmp_path):
    """Co-located join: both sides bucketed+sorted on the join key →
    the physical plan has NO Exchange and NO Sort. This is the layout
    that deletes the biggest shuffle at scale; if bucketing metadata
    stopped reaching the planner this test fails."""
    from edu_online_spark.sources.layout import write_bucketed

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_order = spark.conf.get("spark.sql.legacy.bucketedTableScan.outputOrdering")
    try:
        # force a real (non-broadcast) join so the assertion is about
        # bucketing, not about one side being tiny
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # let the scan advertise per-bucket sort order (safe because
        # write_bucketed guarantees ONE file per bucket; Spark disables
        # this by default to avoid merging multi-file buckets)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        write_bucketed(orders, "t_orders_b", ["o_orderkey"], num_buckets=4)
        write_bucketed(lineitem, "t_lineitem_b", ["l_orderkey"], num_buckets=4)
        joined = spark.table("t_orders_b").join(
            spark.table("t_lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = explain_str(joined, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert "Sort " not in plan.replace("SortMergeJoin", "SMJ"), plan
        # and it still computes the right thing
        expected = orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", old_order
        )
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_write_training_shards_layout_and_manifest(spark, tmp_path):
    """The written tree must have one shard_id directory per manifest
    row, per-shard token masses and xor checksums must match the data,
    and rows within a shard must be readable in epoch (cum_tokens)
    order."""
    import os

    from edu_online_spark.sources.layout import write_training_shards

    rows = [(i, f"s{i % 3}", " ".join(["w"] * (4 + i % 9))) for i in range(90)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, shard_tokens=60)

    man = {r["shard_id"]: r for r in spark.read.parquet(out + ".manifest").collect()}
    dirs = sorted(
        int(d.split("=")[1])
        for d in os.listdir(out)
        if d.startswith("shard_id=")
    )
    assert dirs == sorted(man)
    data = spark.read.parquet(out)
    for sid, m in man.items():
        part = [r for r in data.collect() if r["shard_id"] == sid]
        assert len(part) == m["n_docs"]
        assert sum(r["n_tokens"] for r in part) == m["shard_token_mass"]
        x = 0
        for r in part:
            x ^= r["doc_id"]
        assert x == m["id_xor"]
    # epoch order within shard: cum_tokens strictly increasing
    first = min(man)
    ordered = (
        data.filter(data.shard_id == first).orderBy("cum_tokens").collect()
    )
    cums = [r["cum_tokens"] for r in ordered]
    assert cums == sorted(cums) and len(set(cums)) == len(cums)
