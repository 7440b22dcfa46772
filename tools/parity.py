"""Local replica of the driver's correctness gate.

Runs every registry query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column-name set, and
order-insensitive values (exact for ints/strings/timestamps; exact-first
with a reported max-abs-diff for floats so near-misses are visible).

Usage: python tools/parity.py [sf_dir] [query ...]
       python tools/parity.py [sf_dir] --window   # the driver's 50-slot window
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    s = spark_df.toPandas()
    o = oracle_pdf
    if sorted(s.columns) != sorted(o.columns):
        problems.append(f"columns: spark={sorted(s.columns)} oracle={sorted(o.columns)}")
        return problems
    if len(s) != len(o):
        problems.append(f"rowcount: spark={len(s)} oracle={len(o)}")
        return problems
    cs, co = canon(s), canon(o)
    for c in cs.columns:
        a, b = cs[c], co[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a = pd.to_numeric(a, errors="coerce").astype(float)
            b = pd.to_numeric(b, errors="coerce").astype(float)
            eq = (a.eq(b) | (a.isna() & b.isna())).all()
            if not eq:
                mad = (a - b).abs().max()
                problems.append(f"col {c}: float mismatch, max_abs_diff={mad!r}")
        else:
            try:
                eq = a.eq(b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str).eq(b.astype(str))
            if not eq.all():
                i = int((~eq).idxmax())
                problems.append(
                    f"col {c}: {( ~eq ).sum()} mismatches, first at row {i}: "
                    f"spark={a.iloc[i]!r} oracle={b.iloc[i]!r}"
                )
    return problems


def main() -> int:
    sys.path.insert(0, ".")
    from edu_online_spark import registry
    from edu_online_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    args = sys.argv[2:]
    spark = get_spark()
    qs, oracles = registry.queries(), registry.oracle_sql()
    # --window = the driver's 50-certification-slot window (the first
    # 50 registry entries) — the pre-rotation-commit rehearsal every
    # round runs
    only = set(args)
    if "--window" in only:
        only.discard("--window")
        only |= set(list(qs)[:50])
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                probs = compare(name, sdf, run_oracle(oracles[name], sf_dir))
            else:
                n = sdf.count()
                probs = [] if n >= 0 else ["negative rowcount?!"]
                print(f"  [rows-only] {name}: {n} rows")
        except Exception as e:  # surface, keep going
            probs = [f"EXCEPTION {type(e).__name__}: {e}"]
        status = "OK " if not probs else "FAIL"
        print(f"{status} {name}")
        for p in probs:
            print(f"     - {p}")
        if probs:
            failed.append(name)
    n_run = len(only & set(qs)) if only else len(qs)
    print(f"\n{n_run - len(failed)}/{n_run} queries pass parity")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
