"""Per-trigger profile of the core streaming jobs (optimization r17,
guide §1 applied to micro-batch plans — VERDICT r16 #6).

Drives each job availableNow with max_files_per_trigger=1 over N
pre-produced files (so every micro-batch pays its own state commit and
sink publish), then reads query.recentProgress: per-trigger input
rows, the durationMs breakdown (addBatch = plan execution,
stateCommit etc.), and each stateful operator's state-store metrics
(rows total/updated/removed, memory, the shuffle-partition count the
store is keyed by). The per-trigger numbers are what multiplies at
real scale: a fixed per-trigger overhead is latency floor, state rows
that grow without eviction are the OOM shape.

Usage: python tools/stream_trigger_profile.py [out.json] [n_files] [rows_per_file]
Writes one JSON object per job and prints a compact table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from edu_online_spark.config import EngineConfig  # noqa: E402
from edu_online_spark.session import get_spark  # noqa: E402
from edu_online_spark.streaming import jobs  # noqa: E402
from edu_online_spark.streaming.sources import file_stream  # noqa: E402


def _produce(d: str, name: str, lines: list[str]) -> None:
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{name}.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.rename(tmp, os.path.join(d, name))


def _register_lines(i: int, n: int) -> list[str]:
    # id \t platform \t ts — event time advances per file so watermarks move
    return [
        f"{i * n + r}\t{r % 3 + 1}\t2026-08-13 10:{i:02d}:{r % 60:02d}"
        for r in range(n)
    ]


def _qz_lines(i: int, n: int) -> list[str]:
    return [
        f"{1000 + (r % 500)}\t504\t7\tq{i * n + r}\t{r % 2}\t2026-08-13 10:{i:02d}:{r % 60:02d}"
        for r in range(n)
    ]


def _page_lines(i: int, n: int) -> list[str]:
    return [
        json.dumps(
            {
                "uid": str(1000 + (r % 500)),
                "last_page_id": str(r % 7),
                "page_id": str(r % 7 + 1),
                "next_page_id": str(r % 7 + 2),
                "ts": f"2026-08-13 10:{i:02d}:{r % 60:02d}",
            }
        )
        for r in range(n)
    ]


def _raw_lines(i: int, n: int) -> list[str]:
    return [f"raw-payload-{i}-{r}" for r in range(n)]


def profile(q, label: str) -> dict:
    q.awaitTermination(300)
    triggers = []
    for p in q.recentProgress:
        if p is None:
            continue
        if p.get("numInputRows", 0) == 0 and not p.get("stateOperators"):
            continue
        triggers.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
                "stateOperators": [
                    {
                        "operatorName": so.get("operatorName"),
                        "numRowsTotal": so.get("numRowsTotal"),
                        "numRowsUpdated": so.get("numRowsUpdated"),
                        "numRowsRemoved": so.get("numRowsRemoved"),
                        "memoryUsedBytes": so.get("memoryUsedBytes"),
                        "numShufflePartitions": so.get("numShufflePartitions"),
                        "commitTimeMs": (so.get("customMetrics") or {}).get(
                            "stateOnCurrentVersionSizeBytes"
                        ),
                    }
                    for so in (p.get("stateOperators") or [])
                ],
            }
        )
    return {"job": label, "triggers": triggers}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "plans/r17/streaming_trigger_profile.json"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n_rows = int(sys.argv[3]) if len(sys.argv) > 3 else 3000

    work = tempfile.mkdtemp(prefix="stream-profile-")
    spark = get_spark(EngineConfig(app_name="stream-trigger-profile"))
    topics = {t: f"{work}/topics/{t}" for t in ("register", "qz", "page", "raw")}
    for i in range(n_files):
        _produce(topics["register"], f"b{i}.log", _register_lines(i, n_rows))
        _produce(topics["qz"], f"b{i}.log", _qz_lines(i, n_rows))
        _produce(topics["page"], f"b{i}.log", _page_lines(i, n_rows))
        _produce(topics["raw"], f"b{i}.log", _raw_lines(i, n_rows))

    region = spark.createDataFrame(
        [(i, f"REGION_{i}") for i in range(5)], ["r_regionkey", "r_name"]
    )
    ck = lambda name: f"{work}/ck/{name}"  # noqa: E731
    out = lambda name: f"{work}/out/{name}"  # noqa: E731
    src = lambda t: file_stream(spark, topics[t], max_files_per_trigger=1)  # noqa: E731

    runs = [
        ("register_windowed", lambda: jobs.register_windowed_job(
            src("register"), out("win"), ck("win"), available_now=True)),
        ("register_totals", lambda: jobs.register_totals_job(
            src("register"), out("tot"), ck("tot"), available_now=True)),
        ("quiz_mastery", lambda: jobs.quiz_mastery_job(
            src("qz"), out("qz"), ck("qz"), available_now=True)),
        ("page_flow", lambda: jobs.page_flow_job(
            src("page"), out("flow"), ck("flow"), available_now=True)),
        ("rawlog_archive", lambda: jobs.rawlog_archive_job(
            src("raw"), out("raw"), ck("raw"), available_now=True)),
        ("page_transition_join", lambda: jobs.page_transition_join_job(
            src("page"), out("trans"), ck("trans"), available_now=True)),
        ("register_dedup", lambda: jobs.register_dedup_job(
            src("register"), out("dedup"), ck("dedup"), available_now=True)),
        ("register_region_enrich", lambda: jobs.register_region_enrich_job(
            src("register"), region, out("enrich"), ck("enrich"),
            available_now=True)),
    ]
    results = []
    for label, mk in runs:
        spark.sparkContext.setJobDescription(f"trigger_profile:{label}")
        results.append(profile(mk(), label))
        spark.sparkContext.setJobDescription(None)

    with open(out_path, "w") as f:
        json.dump(
            {"n_files": n_files, "rows_per_file": n_rows, "jobs": results},
            f,
            indent=1,
        )
    for r in results:
        ts = r["triggers"]
        if not ts:
            print(f"{r['job']}: no triggers captured")
            continue
        add = [t["durationMs"].get("addBatch", 0) for t in ts]
        rows = [t["numInputRows"] for t in ts]
        st = ts[-1]["stateOperators"]
        state = (
            f" state[{st[0]['operatorName']}] rows={st[0]['numRowsTotal']}"
            f" parts={st[0]['numShufflePartitions']}"
            if st
            else ""
        )
        print(
            f"{r['job']}: {len(ts)} triggers, rows/trigger={rows[0]},"
            f" addBatch ms first={add[0]} last={add[-1]}"
            f" min={min(add)}{state}"
        )
    shutil.rmtree(work, ignore_errors=True)
    print(f"written: {out_path}")


if __name__ == "__main__":
    main()
