"""Streaming throughput benchmark — the reference comparison bench.py
cannot make: the reference engine CAPS its ingest at a configured
100 rec/s/partition (BASELINE.md "ingest cap" rows — its real-time
budget on the course-ware cluster), so matching-or-beating its
single-node throughput means demonstrating sustained rec/s well above
those caps through the SAME job semantics.

Measures end-to-end micro-batch throughput (parse → operator → state →
sink, availableNow over pre-produced files — so scheduling, state
commits, and sink writes are all inside the measured window) for:
  register_totals    the reference's flagship A2 job (TSV decode →
                     running per-platform counts → keyed upsert)
  quiz_mastery       the heaviest reference job (A3-A9 composite state)
  curation_ingest    the round-7 composed LLM pipeline (gate → budget
                     → shard, three state machines in one trigger)
  winnow_index       the round-7 fingerprint-index job — reported as a
                     TRIGGER-LATENCY profile (batch 1 vs batch N, then
                     compact_winnow_index, then the post-compaction
                     tail) because its state grows with the corpus

Usage: python tools/stream_bench.py [n_rows] [n_files] [job ...]
Prints one JSON line per job: {"job", "rows", "secs", "rows_per_sec"}.
Defaults: 200k rows across 20 files (10k-row micro-batches), all jobs;
naming jobs (e.g. `2000000 20 stickiness latency_quantiles`) runs the
10×-step subset the second-decade rows are measured from.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from edu_online_spark.session import get_spark  # noqa: E402
from edu_online_spark.streaming import jobs  # noqa: E402
from edu_online_spark.streaming.sources import file_stream  # noqa: E402


def _produce(d: str, name: str, lines: list[str]) -> None:
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{name}.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.rename(tmp, os.path.join(d, name))


def _run(job_fn, spark, src, out, ckpt, **kw):
    # one file per trigger: every micro-batch pays its own state
    # commit + sink publish, the reference-comparable cadence (its
    # 3-second batches) — NOT one availableNow mega-batch
    q = job_fn(
        file_stream(spark, src, max_files_per_trigger=1),
        out,
        ckpt,
        available_now=True,
        **kw,
    )
    q.awaitTermination(600)


def bench_job(spark, work, name, job_fn, make_line, n_rows, n_files, **kw):
    src = os.path.join(work, name, "src")
    per = n_rows // n_files
    for f in range(n_files):
        _produce(
            src,
            f"b{f:04d}.log",
            [make_line(f * per + i) for i in range(per)],
        )
    out = os.path.join(work, name, "out")
    ckpt = os.path.join(work, name, "ck")
    t0 = time.monotonic()
    _run(job_fn, spark, src, out, ckpt, **kw)
    secs = time.monotonic() - t0
    print(
        json.dumps(
            {
                "job": name,
                "rows": per * n_files,
                "secs": round(secs, 2),
                "rows_per_sec": int(per * n_files / secs),
            }
        )
    )


def bench_winnow_index(spark, work, n_docs, n_files, tail_files=3):
    """Trigger-latency profile for the append-only fingerprint index
    (winnow_index_job) — the one streaming state in the repo that
    GROWS with the corpus, so the number to watch is not rec/s but
    how per-trigger cost moves as batch partitions accumulate:
    batch 1 vs batch N, then compact_winnow_index, then `tail_files`
    more triggers to show the post-compaction cost. Emits three JSON
    lines: the accumulation run (first/median/last trigger ms), the
    compaction itself, and the post-compaction tail run."""
    name = "winnow_index"
    src = os.path.join(work, name, "src")
    per = n_docs // n_files

    def line(i: int) -> str:
        # distinct 40-word docs: every doc contributes fresh prints, so
        # the index grows linearly — the worst (= honest) growth case
        words = " ".join(f"tok{i}w{j}" for j in range(40))
        return json.dumps({"doc_id": i, "text": words, "source": f"s{i % 8}"})

    for f in range(n_files):
        _produce(src, f"b{f:04d}.log", [line(f * per + i) for i in range(per)])
    out = os.path.join(work, name, "out")
    ckpt = os.path.join(work, name, "ck")

    # recentProgress is a ring buffer capped at numRecentProgressUpdates
    # (default 100): with n_files above that, trigger_s_first would
    # silently report a LATER batch and flatten the growth profile this
    # bench exists to measure (ADVICE r8). Size the buffer to the run.
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(max(n_files + tail_files + 16, 100)),
    )

    def run_wave() -> list[tuple[int, int, float]]:
        q = jobs.winnow_index_job(
            file_stream(spark, src, max_files_per_trigger=1),
            out,
            ckpt,
            available_now=True,
        )
        q.awaitTermination(600)
        return sorted(
            (p.batchId, p.numInputRows, p.batchDuration / 1000.0)
            for p in q.recentProgress
            if p.numInputRows > 0
        )

    t0 = time.monotonic()
    prog = run_wave()
    secs = time.monotonic() - t0
    durs = [d for _, _, d in prog]
    if not durs:  # no batch reported input rows — surface it, don't crash
        print(json.dumps({"job": name, "error": "no data-bearing batches"}))
        return
    print(
        json.dumps(
            {
                "job": name,
                "rows": per * n_files,
                "secs": round(secs, 2),
                "rows_per_sec": int(per * n_files / secs),
                "batches": len(prog),
                "trigger_s_first": round(durs[0], 2),
                "trigger_s_median": round(sorted(durs)[len(durs) // 2], 2),
                "trigger_s_last": round(durs[-1], 2),
            }
        )
    )
    t0 = time.monotonic()
    folded = jobs.compact_winnow_index(spark, out + ".fpindex", checkpoint=ckpt)
    print(
        json.dumps(
            {
                "job": name + "_compact",
                "folded_partitions": folded,
                "secs": round(time.monotonic() - t0, 2),
            }
        )
    )
    for f in range(tail_files):
        i0 = (n_files + f) * per
        _produce(src, f"b{n_files + f:04d}.log", [line(i0 + i) for i in range(per)])
    prog = run_wave()
    durs = [d for _, _, d in prog]
    if not durs:
        print(json.dumps({"job": name + "_postcompact",
                          "error": "no data-bearing batches"}))
        return
    print(
        json.dumps(
            {
                "job": name + "_postcompact",
                "batches": len(prog),
                "trigger_s_first": round(durs[0], 2),
                "trigger_s_last": round(durs[-1], 2),
            }
        )
    )


def bench_minhash_dedup(spark, work, n_docs, n_files, tail_files=3):
    """Trigger-latency profile for minhash_dedup_job's signature index
    — the winnow bench's twin (the other corpus-growing streaming
    state): accumulation run, compact_minhash_index, post-compaction
    tail. Distinct docs, so the index grows linearly and every trigger
    pays the honest probe cost."""
    name = "minhash_dedup"
    src = os.path.join(work, name, "src")
    per = n_docs // n_files

    def line(i: int) -> str:
        words = " ".join(f"mh{i}w{j}" for j in range(40))
        return json.dumps({"doc_id": i, "text": words, "source": f"s{i % 8}"})

    for f in range(n_files):
        _produce(src, f"b{f:04d}.log", [line(f * per + i) for i in range(per)])
    out = os.path.join(work, name, "out")
    ckpt = os.path.join(work, name, "ck")
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(max(n_files + tail_files + 16, 100)),
    )

    def run_wave() -> list[tuple[int, int, float]]:
        q = jobs.minhash_dedup_job(
            file_stream(spark, src, max_files_per_trigger=1),
            out,
            ckpt,
            available_now=True,
        )
        q.awaitTermination(600)
        return sorted(
            (p.batchId, p.numInputRows, p.batchDuration / 1000.0)
            for p in q.recentProgress
            if p.numInputRows > 0
        )

    t0 = time.monotonic()
    prog = run_wave()
    secs = time.monotonic() - t0
    durs = [d for _, _, d in prog]
    if not durs:
        print(json.dumps({"job": name, "error": "no data-bearing batches"}))
        return
    print(
        json.dumps(
            {
                "job": name,
                "rows": per * n_files,
                "secs": round(secs, 2),
                "rows_per_sec": int(per * n_files / secs),
                "batches": len(prog),
                "trigger_s_first": round(durs[0], 2),
                "trigger_s_median": round(sorted(durs)[len(durs) // 2], 2),
                "trigger_s_last": round(durs[-1], 2),
            }
        )
    )
    t0 = time.monotonic()
    folded = jobs.compact_minhash_index(spark, out + ".sigindex", checkpoint=ckpt)
    print(
        json.dumps(
            {
                "job": name + "_compact",
                "folded_partitions": folded,
                "secs": round(time.monotonic() - t0, 2),
            }
        )
    )
    for f in range(tail_files):
        i0 = (n_files + f) * per
        _produce(src, f"b{n_files + f:04d}.log", [line(i0 + i) for i in range(per)])
    prog = run_wave()
    durs = [d for _, _, d in prog]
    if not durs:
        print(json.dumps({"job": name + "_postcompact",
                          "error": "no data-bearing batches"}))
        return
    print(
        json.dumps(
            {
                "job": name + "_postcompact",
                "batches": len(prog),
                "trigger_s_first": round(durs[0], 2),
                "trigger_s_last": round(durs[-1], 2),
            }
        )
    )


def bench_weighted_sample(spark, work, n_docs, n_files):
    """Throughput + trigger-latency profile for weighted_sample_job
    (seed-set-on-ingest) — the round-10 streaming job without a
    BASELINE.md row (VERDICT r10 #7). State is k rows by construction,
    so unlike the index jobs the per-trigger cost must be FLAT in the
    total corpus seen; first/median/last trigger durations make that
    claim measurable rather than argued."""
    name = "weighted_sample"
    src = os.path.join(work, name, "src")
    per = n_docs // n_files

    def line(i: int) -> str:
        # variable-length docs so the weight distribution is non-trivial
        words = " ".join(f"ws{i}w{j}" for j in range(10 + i % 50))
        return json.dumps({"doc_id": str(i), "text": words, "source": f"s{i % 8}"})

    for f in range(n_files):
        _produce(src, f"b{f:04d}.log", [line(f * per + i) for i in range(per)])
    out = os.path.join(work, name, "out")
    ckpt = os.path.join(work, name, "ck")
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(max(n_files + 16, 100)),
    )
    q = jobs.weighted_sample_job(
        file_stream(spark, src, max_files_per_trigger=1),
        out,
        ckpt,
        available_now=True,
    )
    t0 = time.monotonic()
    q.awaitTermination(600)
    secs = time.monotonic() - t0
    durs = sorted(
        (p.batchId, p.batchDuration / 1000.0)
        for p in q.recentProgress
        if p.numInputRows > 0
    )
    ds = [d for _, d in durs]
    if not ds:
        print(json.dumps({"job": name, "error": "no data-bearing batches"}))
        return
    print(
        json.dumps(
            {
                "job": name,
                "rows": per * n_files,
                "secs": round(secs, 2),
                "rows_per_sec": int(per * n_files / secs),
                "batches": len(ds),
                "trigger_s_first": round(ds[0], 2),
                "trigger_s_median": round(sorted(ds)[len(ds) // 2], 2),
                "trigger_s_last": round(ds[-1], 2),
            }
        )
    )


def bench_stickiness(spark, work, n_rows, n_files):
    """Throughput + trigger-latency profile for stickiness_job (live
    DAU/WAU). State is the distinct (day, user) relation inside the
    7+late_days horizon — bounded by population × horizon, NOT event
    volume, so per-trigger cost must be flat as the stream ages;
    first/median/last trigger durations make that measurable. The
    workload advances event time ~1 day per trigger, so the horizon
    population saturates after ~9 triggers. The user population scales
    with the workload (n_rows/100: 2,000 users at the standard 200k
    rows, 20,000 at the 10× 2M-row step — VERDICT r11 #7) so a larger
    run grows the state bound too, not just the volume."""
    name = "stickiness"
    src = os.path.join(work, name, "src")
    per = n_rows // n_files
    n_users = max(2_000, n_rows // 100)

    def line(i: int) -> str:
        day = 1 + (i // per)  # ~one day per trigger file
        sec = (i % per) % 86_400
        return json.dumps({
            "event_id": i, "user_id": i % n_users,
            "ts": f"2026-07-{day:02d} {sec // 3600:02d}:"
                  f"{(sec // 60) % 60:02d}:{sec % 60:02d}",
        })

    for f in range(n_files):
        _produce(src, f"b{f:04d}.log", [line(f * per + i) for i in range(per)])
    out = os.path.join(work, name, "out")
    ckpt = os.path.join(work, name, "ck")
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(max(n_files + 16, 100)),
    )
    q = jobs.stickiness_job(
        file_stream(spark, src, max_files_per_trigger=1),
        out,
        ckpt,
        available_now=True,
    )
    t0 = time.monotonic()
    q.awaitTermination(600)
    secs = time.monotonic() - t0
    ds = sorted(
        p.batchDuration / 1000.0
        for p in q.recentProgress
        if p.numInputRows > 0
    )
    if not ds:
        print(json.dumps({"job": name, "error": "no data-bearing batches"}))
        return
    order = [
        p.batchDuration / 1000.0
        for p in sorted(q.recentProgress, key=lambda p: p.batchId)
        if p.numInputRows > 0
    ]
    print(
        json.dumps(
            {
                "job": name,
                "rows": per * n_files,
                "secs": round(secs, 2),
                "rows_per_sec": int(per * n_files / secs),
                "batches": len(ds),
                "trigger_s_first": round(order[0], 2),
                "trigger_s_median": round(ds[len(ds) // 2], 2),
                "trigger_s_last": round(order[-1], 2),
            }
        )
    )


def bench_latency_quantiles(spark, work, n_rows, n_files):
    """Throughput + trigger-latency profile for latency_quantiles_job
    (live SLA quantiles). State is the (priority, days) histogram —
    DOMAIN-bounded (hundreds of rows however many lineitems flow), so
    the per-trigger cost must be flat; the stream-static dim join is
    the per-trigger cost driver."""
    name = "latency_quantiles"
    src = os.path.join(work, name, "src")
    per = n_rows // n_files
    n_orders = 100_000
    orders = spark.range(n_orders).selectExpr(
        "id AS o_orderkey",
        "date_add(DATE '2026-01-01', CAST(id % 90 AS INT)) AS o_orderdate",
        "concat(CAST(id % 5 + 1 AS STRING), '-PRI') AS o_orderpriority",
    )

    def line(i: int) -> str:
        okey = i % n_orders
        ship = 1 + (okey % 90 + i % 60) // 30  # days after a base month
        return json.dumps({
            "l_orderkey": okey,
            "l_shipdate": f"2026-{4 + ship % 3:02d}-{1 + i % 28:02d}",
        })

    for f in range(n_files):
        _produce(src, f"b{f:04d}.log", [line(f * per + i) for i in range(per)])
    out = os.path.join(work, name, "out")
    ckpt = os.path.join(work, name, "ck")
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(max(n_files + 16, 100)),
    )
    q = jobs.latency_quantiles_job(
        file_stream(spark, src, max_files_per_trigger=1),
        orders,
        out,
        ckpt,
        available_now=True,
    )
    t0 = time.monotonic()
    q.awaitTermination(600)
    secs = time.monotonic() - t0
    order = [
        p.batchDuration / 1000.0
        for p in sorted(q.recentProgress, key=lambda p: p.batchId)
        if p.numInputRows > 0
    ]
    if not order:
        print(json.dumps({"job": name, "error": "no data-bearing batches"}))
        return
    print(
        json.dumps(
            {
                "job": name,
                "rows": per * n_files,
                "secs": round(secs, 2),
                "rows_per_sec": int(per * n_files / secs),
                "batches": len(order),
                "trigger_s_first": round(order[0], 2),
                "trigger_s_median": round(sorted(order)[len(order) // 2], 2),
                "trigger_s_last": round(order[-1], 2),
            }
        )
    )


def bench_daily_mad(spark, work, n_rows, n_files):
    """Throughput + trigger-latency profile for daily_mad_job (live
    robust volume tripwire). State is CALENDAR-bounded — one count per
    day (365 here, any volume) — and the per-trigger re-screen runs
    over that tiny relation, so trigger cost must be flat from the
    first trigger."""
    _bench_daily_count(spark, work, n_rows, n_files,
                       "daily_mad", jobs.daily_mad_job)


def bench_activation_survival(spark, work, n_rows, n_files):
    """Throughput + trigger-latency profile for activation_survival_job
    (live KM curve). State is POPULATION-bounded — one (first, first
    purchase, last) row per user (20k here) — and the per-trigger
    re-estimate is one pass over that state plus a <=horizon+1-row KM
    table, so trigger cost must flatten once the population is seen."""
    name = "activation_survival"
    src = os.path.join(work, name, "src")
    per = n_rows // n_files

    def line(i: int) -> str:
        uid = (i * 7919) % 20_000
        day = (i // 50_000) % 28 + 1
        return json.dumps({
            "event_id": str(i),
            "user_id": str(uid),
            "event_type": "purchase" if i % 5 == 0 else "view",
            "ts": f"2026-07-{day:02d} 12:00:{i % 60:02d}",
        })

    for f in range(n_files):
        _produce(src, f"s{f:04d}.log", [line(f * per + i) for i in range(per)])
    out = os.path.join(work, name, "out")
    ckpt = os.path.join(work, name, "ck")
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(max(n_files + 16, 100)),
    )
    q = jobs.activation_survival_job(
        file_stream(spark, src, max_files_per_trigger=1),
        out,
        ckpt,
        available_now=True,
    )
    t0 = time.monotonic()
    q.awaitTermination(600)
    secs = time.monotonic() - t0
    order = [
        p.batchDuration / 1000.0
        for p in sorted(q.recentProgress, key=lambda p: p.batchId)
        if p.numInputRows > 0
    ]
    if not order:
        print(json.dumps({"job": name, "error": "no data-bearing batches"}))
        return
    print(
        json.dumps(
            {
                "job": name,
                "rows": per * n_files,
                "secs": round(secs, 2),
                "rows_per_sec": int(per * n_files / secs),
                "batches": len(order),
                "trigger_s_first": round(order[0], 2),
                "trigger_s_median": round(sorted(order)[len(order) // 2], 2),
                "trigger_s_last": round(order[-1], 2),
            }
        )
    )


def bench_ols_monitor(spark, work, n_rows, n_files):
    """Throughput + trigger-latency profile for ols_monitor_job (live
    feed regression). State is SIX NUMBERS regardless of volume — the
    textbook constant-memory streaming statistic — so trigger cost is
    the micro-batch moment pass alone and must be flat from trigger 1."""
    name = "ols_monitor"
    src = os.path.join(work, name, "src")
    per = n_rows // n_files

    def line(i: int) -> str:
        q = 1 + i % 50
        return json.dumps({
            "rid": str(i),
            "quantity": str(q),
            "price": str(q * 3.17 + (i % 13) * 0.01),
        })

    for f in range(n_files):
        _produce(src, f"o{f:04d}.log", [line(f * per + i) for i in range(per)])
    out = os.path.join(work, name, "out")
    ckpt = os.path.join(work, name, "ck")
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(max(n_files + 16, 100)),
    )
    q = jobs.ols_monitor_job(
        file_stream(spark, src, max_files_per_trigger=1),
        out,
        ckpt,
        available_now=True,
    )
    t0 = time.monotonic()
    q.awaitTermination(600)
    secs = time.monotonic() - t0
    order = [
        p.batchDuration / 1000.0
        for p in sorted(q.recentProgress, key=lambda p: p.batchId)
        if p.numInputRows > 0
    ]
    if not order:
        print(json.dumps({"job": name, "error": "no data-bearing batches"}))
        return
    print(
        json.dumps(
            {
                "job": name,
                "rows": per * n_files,
                "secs": round(secs, 2),
                "rows_per_sec": int(per * n_files / secs),
                "batches": len(order),
                "trigger_s_first": round(order[0], 2),
                "trigger_s_median": round(sorted(order)[len(order) // 2], 2),
                "trigger_s_last": round(order[-1], 2),
            }
        )
    )


def bench_heavy_hitters(spark, work, n_rows, n_files):
    """Throughput + trigger-latency profile for heavy_hitters_job
    (live Misra-Gries tracker). State is CAPACITY-bounded (<=256
    counters, any vocabulary), so trigger cost must be flat; the
    deterministic generator mixes 7 hot tokens (~3.2% each) with a
    50k-token uniform tail to force real decrements."""
    name = "heavy_hitters"
    src = os.path.join(work, name, "src")
    per = n_rows // n_files

    def line(i: int) -> str:
        words = []
        for j in range(8):
            x = i * 8 + j
            if x % 4 != 0:
                words.append(f"hot{x % 7}")
            else:
                words.append(f"t{x % 50000}")
        return json.dumps({"doc_id": str(i), "text": " ".join(words)})

    for f in range(n_files):
        _produce(src, f"h{f:04d}.log", [line(f * per + i) for i in range(per)])
    out = os.path.join(work, name, "out")
    ckpt = os.path.join(work, name, "ck")
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(max(n_files + 16, 100)),
    )
    q = jobs.heavy_hitters_job(
        file_stream(spark, src, max_files_per_trigger=1),
        out,
        ckpt,
        available_now=True,
    )
    t0 = time.monotonic()
    q.awaitTermination(600)
    secs = time.monotonic() - t0
    order = [
        p.batchDuration / 1000.0
        for p in sorted(q.recentProgress, key=lambda p: p.batchId)
        if p.numInputRows > 0
    ]
    if not order:
        print(json.dumps({"job": name, "error": "no data-bearing batches"}))
        return
    print(
        json.dumps(
            {
                "job": name,
                "rows": per * n_files,
                "secs": round(secs, 2),
                "rows_per_sec": int(per * n_files / secs),
                "batches": len(order),
                "trigger_s_first": round(order[0], 2),
                "trigger_s_median": round(sorted(order)[len(order) // 2], 2),
                "trigger_s_last": round(order[-1], 2),
            }
        )
    )


def bench_daily_cusum(spark, work, n_rows, n_files):
    """Same harness for daily_cusum_job (live level-shift tripwire) —
    identical calendar-bounded state via the shared snapshot job; the
    report stage swaps median/MAD for the closed-form CUSUM windows."""
    _bench_daily_count(spark, work, n_rows, n_files,
                       "daily_cusum", jobs.daily_cusum_job)


def _bench_daily_count(spark, work, n_rows, n_files, name, job_fn):
    src = os.path.join(work, name, "src")
    per = n_rows // n_files

    def line(i: int) -> str:
        d = (i * 7919) % 365
        return json.dumps({
            "event_id": i,
            "ts": f"2026-{d // 31 + 1:02d}-{d % 28 + 1:02d} 12:00:00",
        })

    for f in range(n_files):
        _produce(src, f"m{f:04d}.log", [line(f * per + i) for i in range(per)])
    out = os.path.join(work, name, "out")
    ckpt = os.path.join(work, name, "ck")
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(max(n_files + 16, 100)),
    )
    q = job_fn(
        file_stream(spark, src, max_files_per_trigger=1),
        out,
        ckpt,
        available_now=True,
    )
    t0 = time.monotonic()
    q.awaitTermination(600)
    secs = time.monotonic() - t0
    order = [
        p.batchDuration / 1000.0
        for p in sorted(q.recentProgress, key=lambda p: p.batchId)
        if p.numInputRows > 0
    ]
    if not order:
        print(json.dumps({"job": name, "error": "no data-bearing batches"}))
        return
    print(
        json.dumps(
            {
                "job": name,
                "rows": per * n_files,
                "secs": round(secs, 2),
                "rows_per_sec": int(per * n_files / secs),
                "batches": len(order),
                "trigger_s_first": round(order[0], 2),
                "trigger_s_median": round(sorted(order)[len(order) // 2], 2),
                "trigger_s_last": round(order[-1], 2),
            }
        )
    )


def bench_activity_gini(spark, work, n_rows, n_files):
    """Throughput + trigger-latency profile for activity_gini_job
    (live traffic concentration). State is POPULATION-bounded — one
    count per (type, user): 5 types × 20k users here — and the
    per-trigger report runs over the state's (type, count) histogram,
    so trigger cost must be flat once the population has been seen."""
    name = "activity_gini"
    src = os.path.join(work, name, "src")
    per = n_rows // n_files
    n_users = 20_000

    def line(i: int) -> str:
        return json.dumps({
            "event_id": i,
            # zipf-ish skew: low user ids fire far more often
            "user_id": (i * 7919) % ((i % 97) + 1) % n_users
            if i % 3 else i % 200,
            "event_type": f"T{i % 5}",
        })

    for f in range(n_files):
        _produce(src, f"a{f:04d}.log", [line(f * per + i) for i in range(per)])
    out = os.path.join(work, name, "out")
    ckpt = os.path.join(work, name, "ck")
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(max(n_files + 16, 100)),
    )
    q = jobs.activity_gini_job(
        file_stream(spark, src, max_files_per_trigger=1),
        out,
        ckpt,
        available_now=True,
    )
    t0 = time.monotonic()
    q.awaitTermination(600)
    secs = time.monotonic() - t0
    order = [
        p.batchDuration / 1000.0
        for p in sorted(q.recentProgress, key=lambda p: p.batchId)
        if p.numInputRows > 0
    ]
    if not order:
        print(json.dumps({"job": name, "error": "no data-bearing batches"}))
        return
    print(
        json.dumps(
            {
                "job": name,
                "rows": per * n_files,
                "secs": round(secs, 2),
                "rows_per_sec": int(per * n_files / secs),
                "batches": len(order),
                "trigger_s_first": round(order[0], 2),
                "trigger_s_median": round(sorted(order)[len(order) // 2], 2),
                "trigger_s_last": round(order[-1], 2),
            }
        )
    )


def bench_revenue_gini(spark, work, n_rows, n_files):
    """Throughput + trigger-latency profile for revenue_gini_job (live
    per-nation supplier-revenue concentration). State is POPULATION-
    bounded — one row per supplier that ever shipped (10k here, over
    25 nations) no matter how many lines flow — so per-trigger cost
    must be flat once the supplier population has been seen; the
    generator cycles the full population in the first file."""
    name = "revenue_gini"
    src = os.path.join(work, name, "src")
    per = n_rows // n_files
    n_sup = 10_000

    def line(i: int) -> str:
        return json.dumps({
            "l_suppkey": (i * 7919) % n_sup,
            "l_extendedprice": f"{100 + (i % 90000) / 100.0:.2f}",
            "l_discount": f"0.{i % 10:02d}",
        })

    for f in range(n_files):
        _produce(src, f"g{f:04d}.log", [line(f * per + i) for i in range(per)])
    dim = spark.range(n_sup).selectExpr(
        "id as s_suppkey", "concat('NAT', id % 25) as nation"
    )
    out = os.path.join(work, name, "out")
    ckpt = os.path.join(work, name, "ck")
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(max(n_files + 16, 100)),
    )
    q = jobs.revenue_gini_job(
        file_stream(spark, src, max_files_per_trigger=1),
        out,
        ckpt,
        supplier_dim=dim,
        available_now=True,
    )
    t0 = time.monotonic()
    q.awaitTermination(600)
    secs = time.monotonic() - t0
    order = [
        p.batchDuration / 1000.0
        for p in sorted(q.recentProgress, key=lambda p: p.batchId)
        if p.numInputRows > 0
    ]
    if not order:
        print(json.dumps({"job": name, "error": "no data-bearing batches"}))
        return
    print(
        json.dumps(
            {
                "job": name,
                "rows": per * n_files,
                "secs": round(secs, 2),
                "rows_per_sec": int(per * n_files / secs),
                "batches": len(order),
                "trigger_s_first": round(order[0], 2),
                "trigger_s_median": round(sorted(order)[len(order) // 2], 2),
                "trigger_s_last": round(order[-1], 2),
            }
        )
    )


def bench_balance_deciles(spark, work, n_rows, n_files, saturate=False):
    """Throughput + trigger-latency profile for balance_deciles_job
    (live credit-risk banding). State is the (segment, balance)
    histogram — cents-granular DOMAIN-bounded (caps at ~1.1M distinct
    balances x |segments| however many customers flow), so per-trigger
    cost must be flat. Two generators:

    - default: every row a FRESH (segment, balance) pair (balances
      cycle the full cents range) — the pre-saturation worst case,
      state growing linearly toward the domain ceiling;
    - saturate=True (VERDICT r12 #5): a REALISTIC repeated-balance
      population — whole-dollar balances over an 11k-value range ×
      5 segments = 55k possible state rows, which the first triggers
      fill; every later trigger folds into the already-full
      histogram, so the trigger profile must flatten POST-SATURATION
      (the domain-bound argument, measured)."""
    name = "balance_deciles_sat" if saturate else "balance_deciles"
    src = os.path.join(work, name, "src")
    per = n_rows // n_files

    def line(i: int) -> str:
        bal = (
            float((i * 7919) % 11_000 - 999)          # repeats fast
            if saturate
            else round(-999.99 + ((i * 7919) % 1_100_000) / 100.0, 2)
        )
        return json.dumps({
            "c_custkey": i,
            "c_mktsegment": f"SEG{i % 5}",
            "c_acctbal": bal,
        })

    for f in range(n_files):
        _produce(src, f"b{f:04d}.log", [line(f * per + i) for i in range(per)])
    out = os.path.join(work, name, "out")
    ckpt = os.path.join(work, name, "ck")
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates",
        str(max(n_files + 16, 100)),
    )
    q = jobs.balance_deciles_job(
        file_stream(spark, src, max_files_per_trigger=1),
        out,
        ckpt,
        available_now=True,
    )
    t0 = time.monotonic()
    q.awaitTermination(600)
    secs = time.monotonic() - t0
    order = [
        p.batchDuration / 1000.0
        for p in sorted(q.recentProgress, key=lambda p: p.batchId)
        if p.numInputRows > 0
    ]
    if not order:
        print(json.dumps({"job": name, "error": "no data-bearing batches"}))
        return
    print(
        json.dumps(
            {
                "job": name,
                "rows": per * n_files,
                "secs": round(secs, 2),
                "rows_per_sec": int(per * n_files / secs),
                "batches": len(order),
                "trigger_s_first": round(order[0], 2),
                "trigger_s_median": round(sorted(order)[len(order) // 2], 2),
                "trigger_s_last": round(order[-1], 2),
            }
        )
    )


KNOWN_JOBS = {
    "register_totals", "quiz_mastery", "minhash_dedup", "winnow_index",
    "curation_ingest", "burst_flags", "weighted_sample", "stickiness",
    "latency_quantiles", "balance_deciles", "balance_deciles_sat",
    "revenue_gini", "activity_gini", "daily_mad", "daily_cusum",
    "heavy_hitters", "activation_survival", "ols_monitor",
}


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    subset = set(sys.argv[3:])  # optional: bench only the named jobs
    # ADVICE r12: a misspelled subset entry used to be silently ignored
    # (want() returned False for every real job and the run "completed"
    # having benched nothing) — exit loudly instead.
    unknown = subset - KNOWN_JOBS
    if unknown:
        raise SystemExit(
            f"unknown job name(s) {sorted(unknown)}; "
            f"known: {sorted(KNOWN_JOBS)}"
        )

    def want(name: str) -> bool:
        return not subset or name in subset

    spark = get_spark()
    work = tempfile.mkdtemp(prefix="stream-bench-")
    try:
        if want("register_totals"):
            bench_job(
                spark, work, "register_totals", jobs.register_totals_job,
                lambda i: f"{8000 + i}\t{i % 3 + 1}\t2026-08-13 10:{(i // 6000) % 60:02d}:{(i // 100) % 60:02d}",
                n_rows, n_files,
            )
        if want("quiz_mastery"):
            bench_job(
                spark, work, "quiz_mastery", jobs.quiz_mastery_job,
                lambda i: (
                    f"{1000 + i % 500}\t{500 + i % 7}\t{i % 11}\tq{i % 30}\t"
                    f"{i % 2}\t2026-08-13 10:{(i // 6000) % 60:02d}:{(i // 100) % 60:02d}"
                ),
                n_rows, n_files,
            )
        words = " ".join(f"w{j}xyz{j}" for j in range(24)) + " the and of to"
        if want("curation_ingest"):
            bench_job(
                spark, work, "curation_ingest", jobs.curation_ingest_job,
                lambda i: json.dumps(
                    {"doc_id": i, "text": words, "source": f"s{i % 8}"}
                ),
                n_rows // 10, n_files,  # doc rows are ~30 tokens each
                budget=1 << 60,
            )
        if want("burst_flags"):
            bench_job(
                spark, work, "burst_flags", jobs.burst_flags_job,
                # 100 events/s of stream time, 500 users: trailing-60s
                # frames stay ~12 events/user; the state table is horizon-
                # trimmed (window+late) so per-trigger cost is flat in the
                # TOTAL events seen — only the horizon population matters
                lambda i: json.dumps({
                    "event_id": i, "user_id": i % 500,
                    "ts": f"2026-08-13 {10 + i // 360000:02d}:"
                          f"{(i // 6000) % 60:02d}:{(i // 100) % 60:02d}",
                }),
                n_rows, n_files,
            )
        if want("weighted_sample"):
            bench_weighted_sample(spark, work, n_rows // 10, n_files)
        if want("stickiness"):
            bench_stickiness(spark, work, n_rows, n_files)
        if want("latency_quantiles"):
            bench_latency_quantiles(spark, work, n_rows, n_files)
        if want("balance_deciles"):
            bench_balance_deciles(spark, work, n_rows, n_files)
        if want("balance_deciles_sat"):
            bench_balance_deciles(spark, work, n_rows, n_files, saturate=True)
        if want("revenue_gini"):
            bench_revenue_gini(spark, work, n_rows, n_files)
        if want("activity_gini"):
            bench_activity_gini(spark, work, n_rows, n_files)
        if want("daily_mad"):
            bench_daily_mad(spark, work, n_rows, n_files)
        if want("daily_cusum"):
            bench_daily_cusum(spark, work, n_rows, n_files)
        if want("heavy_hitters"):
            bench_heavy_hitters(spark, work, n_rows, n_files)
        if want("activation_survival"):
            bench_activation_survival(spark, work, n_rows, n_files)
        if want("ols_monitor"):
            bench_ols_monitor(spark, work, n_rows, n_files)
        if want("winnow_index"):
            bench_winnow_index(spark, work, n_rows // 10, n_files)
        if want("minhash_dedup"):
            bench_minhash_dedup(spark, work, n_rows // 10, n_files)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
