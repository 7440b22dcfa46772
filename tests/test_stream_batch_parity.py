"""Streaming ↔ batch parity: the streaming twins must produce the BATCH
operator's answer when fed the same input through a file replay.

The batch operators read the synth views over `events`; here the same
views are rendered to TSV log lines, replayed in TWO waves through the
availableNow streaming jobs (so the state store actually carries
cross-trigger state), and the final sink is compared row-for-row with
the batch aggregation over the full table. This closes the loop the
per-job tests leave open: those check each job's own invariants, this
checks the two execution modes agree on the same data."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from edu_online_spark.operators.quiz import mastery_agg
from edu_online_spark.operators.register import platform_counts
from edu_online_spark.operators.synth import quiz_view, register_view
from edu_online_spark.sources import load_table
from edu_online_spark.streaming import jobs
from edu_online_spark.streaming.sources import file_stream


def _write_waves(src_dir: str, lines: list[str], n_waves: int = 2) -> list[str]:
    """Split lines into n_waves replay files; returns the file names."""
    os.makedirs(src_dir, exist_ok=True)
    per = (len(lines) + n_waves - 1) // n_waves
    names = []
    for w in range(n_waves):
        chunk = lines[w * per : (w + 1) * per]
        if not chunk:
            continue
        name = f"wave{w}.log"
        with open(os.path.join(src_dir, name), "w") as f:
            f.write("\n".join(chunk) + "\n")
        names.append(name)
    return names


def _replay(job_fn, spark, src_dir, out, ckpt, waves: list[list[str]], **kw):
    """Write each wave then run the job availableNow — one trigger per
    wave, state carried in the checkpoint between runs."""
    for w, lines in enumerate(waves):
        with open(os.path.join(src_dir, f"wave{w}.log"), "w") as f:
            f.write("\n".join(lines) + "\n")
        q = job_fn(file_stream(spark, src_dir), out, ckpt, available_now=True, **kw)
        q.awaitTermination(120)


def test_register_totals_streaming_equals_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    lines = [
        f"{r['user_id']}\t{r['platform_code']}\t{r['create_time']}"
        for r in register_view(events)
        .select(
            "user_id",
            "platform_code",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("create_time"),
        )
        .collect()
    ]
    assert len(lines) > 100
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(src, exist_ok=True)
    half = len(lines) // 2
    _replay(
        jobs.register_totals_job, spark, src, out, ckpt,
        [lines[:half], lines[half:]],
    )

    streamed = {
        r["platform"]: r["total"] for r in spark.read.parquet(out).collect()
    }
    batch = {
        r["platform"]: r["cnt"]
        for r in platform_counts(register_view(events)).collect()
    }
    assert streamed == batch


def test_quiz_mastery_streaming_equals_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    qv = quiz_view(events)
    lines = [
        "\t".join(
            str(r[c]) for c in
            ("uid", "courseid", "pointid", "questionid", "istrue", "createtime")
        )
        for r in qv.collect()
    ]
    assert len(lines) > 500
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(src, exist_ok=True)
    half = len(lines) // 2
    _replay(
        jobs.quiz_mastery_job, spark, src, out, ckpt,
        [lines[:half], lines[half:]],
    )

    cols = [
        "uid", "courseid", "pointid", "questionids", "qz_sum", "qz_istrue",
        "qz_count", "createtime", "correct_rate", "mastery_rate",
    ]

    def key(r):
        return (r["uid"], r["courseid"], r["pointid"])

    streamed = {
        key(r): tuple(r[c] for c in cols)
        for r in spark.read.parquet(out)
        .select(*cols[:6], F.col("qz_count").cast("long").alias("qz_count"),
                *cols[7:])
        .collect()
    }
    batch = {
        key(r): tuple(r[c] for c in cols)
        for r in mastery_agg(qv).collect()
    }
    assert set(streamed) == set(batch)
    mismatched = [k for k in batch if streamed[k] != batch[k]]
    assert not mismatched, f"{len(mismatched)} keys differ, e.g. {mismatched[:3]}"
