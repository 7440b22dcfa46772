"""Decode edge cases — the reference's malformed-row semantics
(SURVEY §2.3 P1-P6): wrong arity dropped, unparseable JSON dropped,
missing JSON keys default to ''."""

from __future__ import annotations

from edu_online_spark.sources.logs import (
    decode_page_log,
    decode_qz_log,
    decode_register_log,
)


def _raw(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], ["value"])


def test_register_decode_arity_and_platform(spark):
    rows = decode_register_log(
        _raw(
            spark,
            [
                "8001\t1\t2026-08-13 10:00:03",
                "8002\t2\t2026-08-13 10:00:04",
                "8003\t9\t2026-08-13 10:00:05",
                "bad-row",  # arity 1 → dropped (RegisterStreaming.scala:75)
                "a\tb",  # arity 2 → dropped
                "x\t1\ty\tz",  # arity 4 → dropped
            ],
        )
    ).collect()
    assert len(rows) == 3
    by_user = {r["user_id"]: r for r in rows}
    assert by_user["8001"]["platform"] == "PC"
    assert by_user["8002"]["platform"] == "APP"
    assert by_user["8003"]["platform"] == "Other"


def test_qz_decode_types(spark):
    rows = decode_qz_log(
        _raw(
            spark,
            [
                "1001\t504\t7\tq-17\t1\t2026-08-13 10:00:05",
                "only\ttwo\tfields\tnot\tsix",  # arity 5 → dropped
            ],
        )
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["uid"], r["courseid"], r["pointid"]) == (1001, 504, 7)
    assert r["istrue"] == "1" and r["questionid"] == "q-17"


def test_page_decode_defaults_and_malformed(spark):
    rows = decode_page_log(
        _raw(
            spark,
            [
                '{"uid":"1001","page_id":"2","next_page_id":"3"}',
                "not json at all {{{",
                '{"app_id":"7"}',
            ],
        )
    ).collect()
    assert len(rows) == 2
    full = next(r for r in rows if r["uid"] == "1001")
    # missing keys default to '' (PageStreaming.scala:78-84)
    assert full["app_id"] == "" and full["last_page_id"] == ""
    assert full["page_id"] == "2" and full["next_page_id"] == "3"
    sparse = next(r for r in rows if r["uid"] == "")
    assert sparse["app_id"] == "7"


def test_qz_decode_garbage_int_fields_dropped(spark):
    """A 6-field row with a non-numeric id must be QUARANTINED, not
    throw: under ANSI mode a plain cast() raises CAST_INVALID_INPUT and
    one poison-pill record would kill the whole streaming query
    (the reference drops malformed rows — QzPointStreaming.scala:66)."""
    rows = decode_qz_log(
        _raw(
            spark,
            [
                "1001\t504\t7\tq-17\t1\t2026-08-13 10:00:05",
                "not-a-uid\t504\t7\tq-17\t1\t2026-08-13 10:00:06",  # bad uid
                "1002\tNaNcourse\t7\tq-17\t0\t2026-08-13 10:00:07",  # bad courseid
                "1003\t504\t9.5e\tq-17\t1\t2026-08-13 10:00:08",  # bad pointid
            ],
        )
    ).collect()
    assert [r["uid"] for r in rows] == [1001]


def test_register_decode_ts_garbage_dropped(spark):
    from edu_online_spark.sources.logs import decode_register_log_ts

    rows = decode_register_log_ts(
        _raw(
            spark,
            [
                "8001\t1\t2026-08-13 10:00:03",
                "8002\t2\tnot-a-timestamp",  # bad ts → dropped, not thrown
            ],
        )
    ).collect()
    assert [r["user_id"] for r in rows] == ["8001"]
    assert rows[0]["event_ts"] is not None


def test_decoders_under_bare_ansi_session(spark):
    """The driver runs queries under a BARE SparkSession (no engine
    confs); round 2's red test only fired because the engine session's
    defaults drifted from the driver's. Pin the poison-pill semantics
    under an explicit ANSI-on session so conf drift can't hide them."""
    from edu_online_spark.sources.logs import (
        decode_page_log_ts,
        decode_register_log_ts,
    )

    bare = spark.newSession()
    bare.conf.set("spark.sql.ansi.enabled", "true")

    def raw(lines):
        return bare.createDataFrame([(l,) for l in lines], ["value"])

    qz = decode_qz_log(
        raw(["1\t2\t3\tq\t1\t2026-01-01 00:00:00", "x\t2\t3\tq\t1\tt"])
    ).collect()
    assert [r["uid"] for r in qz] == [1]

    reg = decode_register_log_ts(
        raw(["1\t1\t2026-01-01 00:00:00", "2\t2\tgarbage"])
    ).collect()
    assert [r["user_id"] for r in reg] == ["1"]

    page = decode_page_log_ts(
        raw(['{"uid":"1","ts":"2026-01-01 00:00:00"}', '{"uid":"2","ts":"garbage"}'])
    ).collect()
    assert [r["uid"] for r in page] == ["1"]


def test_page_decode_ts_quarantines_tsless_rows(spark):
    """Rows without a parseable event time are DROPPED, never defaulted
    to wall-clock: a current_timestamp fallback would advance the
    watermark to 'now' during a replay/backfill and silently expire
    every older correctly-timestamped event on both sides of a
    stream-stream join."""
    from edu_online_spark.sources.logs import decode_page_log_ts

    rows = decode_page_log_ts(
        _raw(
            spark,
            [
                '{"uid":"1","page_id":"2","ts":"2026-08-13 10:00:01"}',
                '{"uid":"2","page_id":"3"}',              # no ts → dropped
                '{"uid":"3","page_id":"4","ts":"garbage"}',  # bad ts → dropped
            ],
        )
    ).collect()
    assert [r["uid"] for r in rows] == ["1"]
    assert rows[0]["event_ts"] is not None
