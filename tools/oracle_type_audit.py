"""Mechanical oracle output-type audit (VERDICT r6 #4).

DuckDB widens integer aggregates — `SUM(BIGINT)` / windowed SUM /
`product` return HUGEINT, and `bit_xor` keeps its input's width — and
those defaults have drifted across releases. The driver's correctness
gate canonicalizes Spark and DuckDB results before hashing, so an
oracle output column whose DuckDB type is not one Spark can produce
(HUGEINT, unsigned ints, sub-INTEGER ints) hash-mismatches even when
the values are identical: the round-6 red rows were exactly this.

This audit DESCRIBEs every registry oracle (binding only, no
execution) and flags any output column with a non-portable type.
COVERAGE.md's standing rule requires explicit CAST on every exposed
integer aggregate; this makes the rule mechanical.

Usage: python tools/oracle_type_audit.py [sf_dir]
Exit code 0 = clean; 1 = flagged columns (printed).
"""

from __future__ import annotations

import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# Types Spark's row canonicalization cannot reproduce bit-for-bit.
_BAD = (
    "HUGEINT",  # 128-bit: DuckDB's SUM/product widening default
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
    "UBIGINT",
    "TINYINT",
    "SMALLINT",  # Spark emits these only from explicit casts we never use
    "DECIMAL",  # a bare SQL decimal literal binds DECIMAL(p,s); the
    # Spark side always produces double — portable oracles CAST to
    # DOUBLE (caught live: the yield-curve threshold dim, round 10)
)


def audit(sf_dir: str) -> dict[str, list[tuple[str, str]]]:
    # repo root derived from this file, not the process CWD — the tool
    # (and tests importing it) must work from any directory
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from edu_online_spark import registry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    # queued promotion oracles (ORACLE_R<N+1> dicts) are audited the
    # round they are WRITTEN, not the round they enter the registry —
    # the round-7 rule
    queued: dict[str, str] = {}
    for mod_name in (
        "dedup", "analytics", "similarity", "textops", "pii", "multimodal",
    ):
        try:
            mod = __import__(
                f"edu_online_spark.operators.{mod_name}", fromlist=["_"]
            )
        except ImportError:
            continue
        for attr in dir(mod):
            if attr.startswith("ORACLE_R") and attr[8:].isdigit():
                queued.update(getattr(mod, attr))
    flagged: dict[str, list[tuple[str, str]]] = {}
    for name, sql in {**registry.oracle_sql(), **queued}.items():
        cols = con.execute(f"DESCRIBE {sql}").fetchall()
        hits = [
            (c, ty)
            for c, ty, *_ in cols
            if any(ty == b or ty.startswith(b + "(") for b in _BAD)
        ]
        if hits:
            flagged[name] = hits
    return flagged


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    bad = audit(sf)
    for name, hits in bad.items():
        print(f"FLAG {name}: {hits}")
    n = len(bad)
    print(f"{n} flagged oracle(s)" if n else "all oracle output types portable")
    sys.exit(1 if bad else 0)
