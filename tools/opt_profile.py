"""Optimization-round profiler (r16; plans dir now r17).

Times registry queries in isolation with the noop sink (guide §1.4 —
computes every column, discards the write) and captures
``.explain("formatted")`` into plans/r17/. Jobs are labelled
(guide §1.5) so the history server / logs attribute stages correctly.

Usage:
    python tools/opt_profile.py [--sf DIR] [--runs N] [--action noop|count]
        [--plans SUFFIX] query [query ...]

With --plans before|after the formatted plan is written to
plans/r17/<query>_<suffix>.txt (the judge-facing artifact).

Prints one line per run and a summary line per query:
    <query> min=<s> times=[...] jobs=<n-spark-jobs>
The job count per timed run comes from the status tracker job-id delta —
eager localCheckpoint / persist materializations show up here even when
the final action is a single noop write.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from edu_online_spark import registry
from edu_online_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--action", choices=["noop", "count"], default="noop")
    ap.add_argument("--plans", default=None, help="write plans/r17/<q>_<suffix>.txt")
    args = ap.parse_args()

    spark = get_spark()
    sc = spark.sparkContext
    qs = registry.queries()
    # session warm-up: codegen + parquet reader paths, same as bench.py
    warm = spark.read.parquet(f"{args.sf}/region.parquet")
    warm.write.format("noop").mode("overwrite").save()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17")
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    for name in args.queries:
        fn = qs[name]
        times = []
        jobs_last = 0
        for r in range(args.runs):
            sc.setJobDescription(f"opt_profile:{name}")
            j0 = sc.statusTracker().getJobIdsForGroup(None)
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if args.action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            t = time.perf_counter() - t0
            j1 = sc.statusTracker().getJobIdsForGroup(None)
            jobs_last = len(set(j1) - set(j0))
            sc.setJobDescription(None)
            times.append(round(t, 3))
        if args.plans:
            df = fn(spark, args.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            path = os.path.join(plans_dir, f"{name}_{args.plans}.txt")
            with open(path, "w") as f:
                f.write(txt)
        print(f"{name} min={min(times):.3f} times={times} jobs~={jobs_last}", flush=True)


if __name__ == "__main__":
    main()
