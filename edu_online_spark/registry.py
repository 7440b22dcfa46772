"""Central query registry: merges each operator module's QUERIES/ORACLE.

The driver contract (__spark_entry__.py) and the local parity tests both
read from here, so "implemented" has exactly one definition.

Queries present in QUERIES but absent from ORACLE are deliberately
rows-only (non-SQL-expressible ops: LSH candidate generation, iterative
algorithms, stateful streaming).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import archival, page, quiz, register

_MODULES = [register, quiz, page, archival]


_EXTENSION_NAMES = [
    "tpch",
    "analytics",
    "sessions",
    "iplookup",
    "dedup",
    "similarity",
    "textops",
    "multimodal",
]


def _extended_modules():
    """Extension operator modules are appended as they land; import errors
    must never take down the core registry, so each import is isolated —
    a broken extension is skipped (with a stderr note) and the core
    register/quiz/page/archival queries keep working."""
    import importlib
    import sys

    mods = []
    for name in _EXTENSION_NAMES:
        try:
            mods.append(importlib.import_module(f".operators.{name}", __package__))
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            print(
                f"edu_online_spark: skipping extension module {name!r}: {exc}",
                file=sys.stderr,
            )
    return mods


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for m in _MODULES + _extended_modules():
        for name, fn in m.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name!r}")
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES + _extended_modules():
        out.update(getattr(m, "ORACLE", {}))
    return out
