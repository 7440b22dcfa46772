"""Physical-plan inspection helpers.

"Would this survive 100×?" is a property of the plan, not the output:
filters must reach the parquet scan (PushedFilters), projections must
prune the read schema (ReadSchema), dimension joins must broadcast, and
hot expressions must sit inside WholeStageCodegen spans. These helpers
turn those properties into assertable strings so tests/test_plans.py
can pin them — a regression that silently un-pushes a filter fails CI,
not the 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    txt = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", txt):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    txt = explain_str(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", txt):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider fused spans, fewer ids).
    Uses formatted mode: AQE's pre-execution simple plan omits the
    *(n) markers."""
    txt = explain_str(df)
    ids = set(re.findall(r"codegen id : (\d+)", txt))
    return len(ids)
