"""Round-18 promotion queue: library ops + audited oracles, landed
five rounds ahead of their window slot. Oracle parity at sf0.001 plus
fixtures pinning the semantics the oracle alone can't distinguish."""

from __future__ import annotations

from pyspark.sql import functions as F

from edu_online_spark.sources import load_table
from tools.parity import compare, run_oracle


# -- lineitem_price_qty_ols (ORACLE_R18) --------------------------------------


def test_price_qty_ols_matches_r18_oracle(spark, sf_dir):
    from edu_online_spark.operators.analytics import (
        ORACLE_R18,
        price_qty_ols,
    )

    problems = compare(
        "lineitem_price_qty_ols",
        price_qty_ols(load_table(spark, sf_dir, "lineitem")),
        run_oracle(ORACLE_R18["lineitem_price_qty_ols"], sf_dir),
    )
    assert not problems, problems


def test_price_qty_ols_perfect_fit(spark):
    """y = 3x + 5 exactly (in cents): slope 3.0, intercept 5.0,
    r-squared exactly 1.0 — small exact integers convert to doubles
    exactly, so the closed form is exact too."""
    from edu_online_spark.operators.analytics import price_qty_ols

    rows = [(i, float(q), (3 * q + 5) / 100.0) for i, q in enumerate([1, 2, 3, 4, 10])]
    li = spark.createDataFrame(
        rows, "rid long, l_quantity double, l_extendedprice double"
    )
    r = price_qty_ols(li).first()
    assert (r["n"], r["slope_cents_per_unit"], r["intercept_cents"], r["r2"]) == (
        5, 3.0, 5.0, 1.0,
    )


def test_price_qty_ols_degenerate_design_is_null(spark):
    """Constant x: den = 0 -> slope/intercept/r2 all NULL."""
    from edu_online_spark.operators.analytics import price_qty_ols

    li = spark.createDataFrame(
        [(i, 7.0, float(i)) for i in range(4)],
        "rid long, l_quantity double, l_extendedprice double",
    )
    r = price_qty_ols(li).first()
    assert r["slope_cents_per_unit"] is None
    assert r["intercept_cents"] is None
    assert r["r2"] is None


# -- source_token_tvd ---------------------------------------------------------


def test_source_token_tvd_matches_r18_oracle(spark, sf_dir):
    from edu_online_spark.operators.textops import (
        ORACLE_R18,
        source_token_tvd,
    )

    problems = compare(
        "source_token_tvd",
        source_token_tvd(load_table(spark, sf_dir, "documents")),
        run_oracle(ORACLE_R18["source_token_tvd"], sf_dir),
    )
    assert not problems, problems


def test_source_token_tvd_fixture(spark):
    """Hand-computable: src A = {x,x,y}, src B = {y,z}. For A vs rest:
    n=3, m=2; |c·m − d·n| over x (4), y (1), z (3) → sd = 8,
    tvd = 8/12. Disjoint vocabularies give tvd = 1.0; identical
    distributions give 0.0."""
    from edu_online_spark.operators.textops import source_token_tvd

    docs = spark.createDataFrame(
        [(0, "x x y", "A"), (1, "y z", "B")],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in source_token_tvd(docs).collect()}
    assert got["A"]["tvd"] == 8.0 / 12.0
    assert got["B"]["tvd"] == 8.0 / 12.0  # symmetric for two sources

    disjoint = spark.createDataFrame(
        [(0, "aa aa", "A"), (1, "bb bb", "B")],
        "doc_id long, text string, source string",
    )
    assert all(
        r["tvd"] == 1.0 for r in source_token_tvd(disjoint).collect()
    )
    same = spark.createDataFrame(
        [(0, "x y", "A"), (1, "x y", "B")],
        "doc_id long, text string, source string",
    )
    assert all(
        r["tvd"] == 0.0 for r in source_token_tvd(same).collect()
    )


# -- users_activation_survival ------------------------------------------------


def test_activation_survival_matches_r18_oracle(spark, sf_dir):
    from edu_online_spark.operators.analytics import (
        ORACLE_R18,
        activation_survival,
    )

    problems = compare(
        "users_activation_survival",
        activation_survival(load_table(spark, sf_dir, "events")),
        run_oracle(ORACLE_R18["users_activation_survival"], sf_dir),
    )
    assert not problems, problems


def test_activation_survival_censoring_fixture(spark):
    """The case the naive conversion histogram gets wrong: u4 joins on
    day 2 and is only observable for 1 day — KM censors them at t=1
    instead of counting a non-conversion. Hand-computed table:
    t=0 (d1/n4), t=1 (c1/n3), t=2 (d1/n2), t=3 (c1/n1) → survival
    0.75, 0.75, 0.375, 0.375 (exact doubles)."""
    import datetime

    from edu_online_spark.operators.analytics import activation_survival

    d0 = datetime.datetime(2024, 5, 1, 12, 0, 0)

    def day(n):
        return d0 + datetime.timedelta(days=n)

    rows = [
        (0, 1, "view", day(0)), (1, 1, "purchase", day(0)),
        (2, 2, "view", day(0)), (3, 2, "purchase", day(2)),
        (4, 3, "view", day(0)), (5, 3, "click", day(3)),
        (6, 4, "view", day(2)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz"
    )
    got = sorted(
        activation_survival(ev).collect(), key=lambda r: r["t_days"]
    )
    table = [
        (r["t_days"], r["n_at_risk"], r["d_events"], r["c_censored"],
         r["survival"])
        for r in got
    ]
    assert table == [
        (0, 4, 1, 0, 0.75),
        (1, 3, 0, 1, 0.75),
        (2, 2, 1, 0, 0.375),
        (3, 1, 0, 1, 0.375),
    ]


def test_activation_survival_horizon_truncates(spark):
    """A purchase past the horizon does NOT count as an event: the
    user is censored at the horizon day instead."""
    import datetime

    from edu_online_spark.operators.analytics import activation_survival

    d0 = datetime.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        (0, 1, "view", d0),
        (1, 1, "purchase", d0 + datetime.timedelta(days=20)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz"
    )
    got = activation_survival(ev, horizon_days=14).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["t_days"], r["d_events"], r["c_censored"]) == (14, 0, 1)
    assert r["survival"] == 1.0


# -- events_ab_mannwhitney / events_ab_srm_check ------------------------------


def test_ab_mannwhitney_matches_r18_oracle(spark, sf_dir):
    from edu_online_spark.operators.analytics import (
        ORACLE_R18,
        ab_value_mannwhitney,
    )

    problems = compare(
        "events_ab_mannwhitney",
        ab_value_mannwhitney(load_table(spark, sf_dir, "events")),
        run_oracle(ORACLE_R18["events_ab_mannwhitney"], sf_dir),
    )
    assert not problems, problems


def test_ab_mannwhitney_fixture(spark):
    """Interleaved values 1<2<3<4 across variants: R_a = 1+3 = 4,
    U_a = 1, mu = 2, var = 5/3 — z matches the same-order Python
    arithmetic exactly and the tiny sample is not significant."""
    import datetime
    import math

    from edu_online_spark.operators.analytics import ab_value_mannwhitney

    t0 = datetime.datetime(2024, 5, 1)
    rows = [
        (0, 0, "view", 1.0, t0),
        (1, 1, "view", 2.0, t0),
        (2, 0, "view", 3.0, t0),
        (3, 1, "view", 4.0, t0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, value double,"
        " ts timestamp_ntz",
    )
    r = ab_value_mannwhitney(ev).first()
    assert (r["n_a"], r["n_b"]) == (2, 2)
    u_a = 4.0 - (2.0 * (2.0 + 1.0)) / 2.0
    mu = (2.0 * 2.0) / 2.0
    var = (2.0 * 2.0 * (2.0 + 2.0 + 1.0)) / 12.0
    assert r["u_a"] == u_a
    assert r["z"] == (u_a - mu) / math.sqrt(var)
    assert r["significant"] is False


def test_ab_mannwhitney_guard_refuses_corpus_sized_input(spark):
    """The permutation form's global rank window is one task holding
    every observation — it must refuse past the cap and name the
    histogram scale path (the spearman guard playbook)."""
    import datetime

    import pytest
    from pyspark.sql import functions as F

    from edu_online_spark.operators.analytics import ab_value_mannwhitney

    t0 = datetime.datetime(2024, 5, 1)
    big = spark.range(11).select(
        F.col("id").alias("event_id"),
        F.col("id").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.col("id").cast("double").alias("value"),
        F.lit(t0).cast("timestamp_ntz").alias("ts"),
    )
    with pytest.raises(ValueError, match="ab_value_mannwhitney_histogram"):
        ab_value_mannwhitney(big, max_rows=10)


def test_ab_mannwhitney_guard_counts_rankable_rows_only(spark):
    """ADVICE r14 #2: the guard must measure the relation the rank
    window actually consumes — a corpus heavy in NULL-valued events
    (impression rows with no order value) is fine as long as the
    non-null payload fits the cap."""
    import datetime

    from pyspark.sql import functions as F

    from edu_online_spark.operators.analytics import ab_value_mannwhitney

    t0 = datetime.datetime(2024, 5, 1)
    mostly_null = spark.range(30).select(
        F.col("id").alias("event_id"),
        F.col("id").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.when(F.col("id") < 6, F.col("id").cast("double")).alias("value"),
        F.lit(t0).cast("timestamp_ntz").alias("ts"),
    )
    # 30 raw rows but only 6 rankable ones: must NOT refuse at cap 10
    r = ab_value_mannwhitney(mostly_null, max_rows=10).first()
    assert r["n_a"] + r["n_b"] == 6


def test_ab_mannwhitney_histogram_equals_permutation_when_tie_free(spark):
    """Tie-free values: the midrank and permutation forms are the SAME
    statistic — every column must match exactly, including on the
    interleaved fixture above."""
    import datetime

    from edu_online_spark.operators.analytics import (
        ab_value_mannwhitney,
        ab_value_mannwhitney_histogram,
    )

    t0 = datetime.datetime(2024, 5, 1)
    rows = [
        (i, i * 7 % 10, "view", float((i * 13) % 97), t0) for i in range(40)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, value double,"
        " ts timestamp_ntz",
    )
    perm = ab_value_mannwhitney(ev).first()
    hist = ab_value_mannwhitney_histogram(ev).first()
    assert perm.asDict() == hist.asDict()


def test_ab_mannwhitney_histogram_textbook_ties(spark):
    """Tied values use MIDRANKS and the tie-corrected variance —
    hand-computed: values A={1,2,2}, B={2,3}: midranks 1, 3, 3 (run of
    three 2s at ranks 2-4), 3, 5 → R_a = 7, U_a = 1, mu = 3,
    var = (6/12)·(6 − (3³−3)/(5·4)) = 2.4; and an all-tied corpus has
    zero rank variance → NULL, not a fake z."""
    import datetime
    import math

    from edu_online_spark.operators.analytics import (
        ab_value_mannwhitney_histogram,
    )

    t0 = datetime.datetime(2024, 5, 1)
    rows = [
        (0, 0, "view", 1.0, t0),
        (1, 2, "view", 2.0, t0),
        (2, 4, "view", 2.0, t0),
        (3, 1, "view", 2.0, t0),
        (4, 3, "view", 3.0, t0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, value double,"
        " ts timestamp_ntz",
    )
    r = ab_value_mannwhitney_histogram(ev).first()
    assert (r["n_a"], r["n_b"]) == (3, 2)
    assert r["u_a"] == 7.0 - (3.0 * 4.0) / 2.0  # = 1.0
    var = (3.0 * 2.0) / 12.0 * ((5.0 + 1.0) - (27.0 - 3.0) / (5.0 * 4.0))
    assert r["z"] == (1.0 - 3.0) / math.sqrt(var)

    tied = spark.createDataFrame(
        [(i, i, "view", 5.0, t0) for i in range(6)],
        "event_id long, user_id long, event_type string, value double,"
        " ts timestamp_ntz",
    )
    rt = ab_value_mannwhitney_histogram(tied).first()
    assert (rt["n_a"], rt["n_b"]) == (3, 3)
    assert rt["z"] is None and rt["significant"] is False


def test_ab_mannwhitney_empty_variant_is_null(spark):
    import datetime

    from edu_online_spark.operators.analytics import ab_value_mannwhitney

    t0 = datetime.datetime(2024, 5, 1)
    ev = spark.createDataFrame(
        [(i, 2 * i, "view", float(i), t0) for i in range(3)],
        "event_id long, user_id long, event_type string, value double,"
        " ts timestamp_ntz",
    )
    r = ab_value_mannwhitney(ev).first()
    assert (r["n_a"], r["n_b"]) == (3, 0)
    assert r["u_a"] is None and r["z"] is None
    assert r["significant"] is False


def test_ab_srm_matches_r18_oracle(spark, sf_dir):
    from edu_online_spark.operators.analytics import (
        ORACLE_R18,
        ab_srm_check,
    )

    problems = compare(
        "events_ab_srm_check",
        ab_srm_check(load_table(spark, sf_dir, "events")),
        run_oracle(ORACLE_R18["events_ab_srm_check"], sf_dir),
    )
    assert not problems, problems


def test_ab_srm_fixture(spark):
    """40 vs 60 users: chi2 = (10² + 10²)/50 = 4.0 > 3.8415 → SRM
    suspect. A clean 50/50 reads exactly 0.0 and passes."""
    import datetime

    from edu_online_spark.operators.analytics import ab_srm_check

    t0 = datetime.datetime(2024, 5, 1)

    def ev_for(uids):
        return spark.createDataFrame(
            [(i, u, "view", t0) for i, u in enumerate(uids)],
            "event_id long, user_id long, event_type string, ts timestamp_ntz",
        )

    skewed = ev_for([2 * i for i in range(40)] + [2 * i + 1 for i in range(60)])
    r = ab_srm_check(skewed).first()
    assert (r["n_a"], r["n_b"], r["chi2"], r["srm_suspect"]) == (
        40, 60, 4.0, True,
    )
    even = ev_for(list(range(100)))
    r = ab_srm_check(even).first()
    assert (r["chi2"], r["srm_suspect"]) == (0.0, False)
