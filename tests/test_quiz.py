"""Quiz mastery arithmetic — including the ÷30 questions-per-point
constant (QzPointStreaming.scala:171) and history merge (A8)."""

from __future__ import annotations

import pytest

from edu_online_spark.operators.quiz import mastery_agg, merge_with_history

COLS = ["uid", "courseid", "pointid", "questionid", "istrue", "createtime"]


def _qz(spark, rows):
    return spark.createDataFrame(rows, COLS)


def test_mastery_rates(spark):
    df = _qz(
        spark,
        [
            (1, 5, 7, "q1", "1", "2026-08-13 10:00:01"),
            (1, 5, 7, "q1", "0", "2026-08-13 10:00:02"),  # retry, wrong
            (1, 5, 7, "q2", "1", "2026-08-13 10:00:00"),
            (1, 5, 7, "q3", "0", "2026-08-13 10:00:03"),
        ],
    )
    r = mastery_agg(df).collect()[0]
    assert r["questionids"] == "q1,q2,q3"
    assert r["qz_count"] == 3  # distinct questions
    assert r["qz_sum"] == 4  # attempts
    assert r["qz_istrue"] == 2  # correct
    assert r["createtime"] == "2026-08-13 10:00:00"  # min
    assert r["correct_rate"] == pytest.approx(0.5)
    # (3/30) * 0.5 — the fixed 30-question denominator
    assert r["mastery_rate"] == pytest.approx(0.05)


def test_merge_with_history_accumulates(spark):
    batch = mastery_agg(
        _qz(
            spark,
            [
                (1, 5, 7, "q2", "1", "2026-08-13 11:00:00"),
                (1, 5, 7, "q4", "0", "2026-08-13 11:00:01"),
                (2, 5, 7, "q1", "1", "2026-08-13 11:00:02"),  # new key
            ],
        )
    )
    history = mastery_agg(
        _qz(
            spark,
            [
                (1, 5, 7, "q1", "1", "2026-08-13 10:00:00"),
                (1, 5, 7, "q2", "0", "2026-08-13 10:00:01"),
            ],
        )
    )
    merged = {(r["uid"], r["courseid"], r["pointid"]): r for r in merge_with_history(batch, history).collect()}
    r = merged[(1, 5, 7)]
    assert r["questionids"] == "q1,q2,q4"  # union + distinct (:160)
    assert r["qz_count"] == 3
    assert r["qz_sum"] == 4  # 2 + 2 (:162)
    assert r["qz_istrue"] == 2  # 1 + 1 (:163)
    assert r["createtime"] == "2026-08-13 10:00:00"
    assert r["correct_rate"] == pytest.approx(0.5)
    assert r["mastery_rate"] == pytest.approx((3 / 30.0) * 0.5)
    # key only in batch passes through unchanged
    r2 = merged[(2, 5, 7)]
    assert r2["qz_sum"] == 1 and r2["qz_istrue"] == 1
