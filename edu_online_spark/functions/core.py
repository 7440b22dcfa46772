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


def hash_bucket(col: Column | str, modulus: int) -> Column:
    """Deterministic bucket in [0, modulus) via multiplicative hashing:
    Knuth's 2^32 golden-ratio multiplier over the key, domain-reduced
    mod 2^31-1 BEFORE the multiply so the product is bounded by
    (2^31-2)·2654435761 < 2^63 — a raw BIGINT product overflows long
    for keys ≳ 3.47e9 (plausible at 100 TB), throwing under ANSI mode
    and silently wrapping otherwise. No rand(): the same row lands in
    the same bucket on every run, engine, and partitioning, which is
    what makes sampling/bucketing retry- and replay-stable. Mirrors as
    `(key % 2147483647) * 2654435761 % modulus` in oracle SQL."""
    c = F.col(col) if isinstance(col, str) else col
    reduced = F.pmod(c, F.lit(2147483647))
    return F.pmod(reduced * F.lit(2654435761), F.lit(modulus))


def day_bucket(col: Column | str) -> Column:
    """Timestamp → 'yyyyMMdd' daily partition key
    (RawLogSparkStreaming.scala:83-89, F7)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd")
