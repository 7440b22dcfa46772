"""Scalar column helpers (SURVEY §2.7 F1-F10).

All pure Column expressions — JVM-side, codegen-friendly, zero Python
per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def csv_to_array(col: Column | str) -> Column:
    """CSV string → array (QzPointStreaming.scala:150, F4)."""
    return F.split(F.col(col) if isinstance(col, str) else col, ",")


def array_to_csv(col: Column | str) -> Column:
    """array → CSV string (mkString(",") at QzPointStreaming.scala:176, F3)."""
    return F.array_join(F.col(col) if isinstance(col, str) else col, ",")


def fmt_ts(col: Column | str) -> Column:
    """Timestamp → 'yyyy-MM-dd HH:mm:ss' string (QzPointStreaming.scala:177, F6)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


def day_bucket(col: Column | str) -> Column:
    """Timestamp → 'yyyyMMdd' daily partition key
    (RawLogSparkStreaming.scala:83-89, F7)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd")
