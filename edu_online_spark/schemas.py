"""Explicit StructTypes for every source.

The reference has no schema system — row shapes exist only as positional
conventions inside closures ("split on \\t, expect 3 fields",
RegisterStreaming.scala:75-85; "6 fields", QzPointStreaming.scala:66-76;
"JSON with 7 optional keys", PageStreaming.scala:78-84). We make every
schema explicit and typed (SURVEY §1.3), which is what lets Catalyst
prune columns and push filters into the scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# ---------------------------------------------------------------------------
# Reference log streams (FIXTURES.md §1-3)
# ---------------------------------------------------------------------------

# register log: TSV, 3 fields (RegisterStreaming.scala:75-85)
REGISTER_LOG = StructType(
    [
        StructField("user_id", StringType()),
        StructField("platform_code", StringType()),
        StructField("create_time", StringType()),  # yyyy-MM-dd HH:mm:ss
    ]
)

# quiz log: TSV, 6 fields (QzPointStreaming.scala:66-76)
QZ_LOG = StructType(
    [
        StructField("uid", IntegerType()),
        StructField("courseid", IntegerType()),
        StructField("pointid", IntegerType()),
        StructField("questionid", StringType()),
        StructField("istrue", StringType()),
        StructField("createtime", StringType()),
    ]
)

# page log: JSON, 7 optional string keys (PageStreaming.scala:78-84)
PAGE_LOG = StructType(
    [
        StructField("uid", StringType()),
        StructField("app_id", StringType()),
        StructField("device_id", StringType()),
        StructField("ip", StringType()),
        StructField("last_page_id", StringType()),
        StructField("page_id", StringType()),
        StructField("next_page_id", StringType()),
    ]
)

# qz_point_detail sink table (QzPointStreaming.scala:179-182, FIXTURES.md §4)
QZ_POINT_DETAIL = StructType(
    [
        StructField("userid", IntegerType()),
        StructField("courseid", IntegerType()),
        StructField("pointid", IntegerType()),
        StructField("questionids", StringType()),  # CSV, reference parity
        StructField("qz_sum", LongType()),
        StructField("qz_count", LongType()),
        StructField("qz_istrue", LongType()),
        StructField("correct_rate", DoubleType()),
        StructField("mastery_rate", DoubleType()),
        StructField("createtime", StringType()),
        StructField("updatetime", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md)
# ---------------------------------------------------------------------------

EVENTS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),  # JSON
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

# Multimodal asset table (extension surface): opaque payload + typed
# metadata. No binary testdata ships, so sources/multimodal synthesizes it.
MEDIA_ASSETS = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("byte_len", LongType()),
        StructField("meta", StringType()),  # JSON sidecar metadata
    ]
)

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)

ALL_TABLES = TPCH_TABLES + ("events", "documents", "embeddings")
