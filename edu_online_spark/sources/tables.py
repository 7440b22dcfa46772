"""Batch table loaders for the driver testdata (TESTDATA.md).

Parquet scans are the 100 TB entry point: column pruning and predicate
pushdown happen here or nowhere. Loaders never .cache() by default —
callers decide, because at scale an unwanted cache is a regression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import ALL_TABLES

# events.ts is physically TIMESTAMP(NANOS); Spark reads it as int64
# (spark.sql.legacy.parquet.nanosAsLong) and we convert to TIMESTAMP_NTZ
# here. Integer `div` keeps full precision (ns-since-epoch overflows the
# 53-bit double mantissa); truncation to micros matches DuckDB's
# ns→us cast of the same column.
_NANOS_TS_COLS = {"events": ("ts",)}

# Runtime confs every scan depends on. The session factory sets them,
# but queries may run under an externally created SparkSession (e.g.
# the verification driver's); these are all runtime-settable SQL confs,
# so the loader pins them defensively.
_REQUIRED_CONFS = {
    # deterministic wall-clock semantics (NTZ casts, date_format)
    "spark.sql.session.timeZone": "UTC",
    # events.ts is TIMESTAMP(NANOS): read raw int64, convert below
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # ms/us parquet timestamps with isAdjustedToUTC=false → NTZ
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
}


def _ensure_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # non-modifiable in this deployment; session.py set it


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Schema comes from parquet footers (already
    typed); filters/projections applied by callers push down into this scan."""
    if name not in ALL_TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {ALL_TABLES}")
    _ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"{c} div 1000")).cast("timestamp_ntz")
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or ALL_TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> list[str]:
    """Expose the testdata tables as temp views so users can drive the
    engine through plain `spark.sql(...)` — the SQL half of the
    DataFrame/SQL dual surface. Views go through load_table, so the
    nanos-ts conversion and defensive conf pinning apply identically;
    a SQL query and its DataFrame twin therefore see byte-identical
    relations (and compile to the same Catalyst plans).

    Returns the registered view names. Temp views are metadata only —
    nothing is scanned or cached at registration.
    """
    registered = []
    for n in names or ALL_TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
        registered.append(n)
    return registered
