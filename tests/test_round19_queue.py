"""Round-19 promotion queue: library ops + audited oracles, landed
six rounds ahead of their window slot. Oracle parity at sf0.001 plus
fixtures pinning the semantics the oracle alone can't distinguish."""

from __future__ import annotations

import datetime
import math

from edu_online_spark.sources import load_table
from tools.parity import compare, run_oracle


def _ev(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, value double,"
        " ts timestamp_ntz",
    )


_T0 = datetime.datetime(2024, 5, 1)


# -- events_ab_ks_test --------------------------------------------------------


def test_ab_ks_matches_r19_oracle(spark, sf_dir):
    from edu_online_spark.operators.analytics import (
        ORACLE_R19,
        ab_value_ks_test,
    )

    problems = compare(
        "events_ab_ks_test",
        ab_value_ks_test(load_table(spark, sf_dir, "events")),
        run_oracle(ORACLE_R19["events_ab_ks_test"], sf_dir),
    )
    assert not problems, problems


def test_ab_ks_fixture(spark):
    """Disjoint supports give D exactly 1.0 (every A value precedes
    every B value, so at the last A value F_a=1, F_b=0); identical
    samples give D exactly 0.0; and cross-variant TIES are evaluated
    at value grain (both ECDFs step together — a pooled sample where
    the only difference is a tie must read the exact tie-free gap)."""
    from edu_online_spark.operators.analytics import ab_value_ks_test

    disjoint = _ev(spark, [
        (0, 0, "v", 1.0, _T0), (1, 0, "v", 2.0, _T0),
        (2, 1, "v", 3.0, _T0), (3, 1, "v", 4.0, _T0),
    ])
    r = ab_value_ks_test(disjoint).first()
    assert (r["n_a"], r["n_b"], r["d_stat"]) == (2, 2, 1.0)
    assert r["significant"] is False  # crit at n=2+2 is 1.358

    same = _ev(spark, [
        (0, 0, "v", 1.0, _T0), (1, 0, "v", 2.0, _T0),
        (2, 1, "v", 1.0, _T0), (3, 1, "v", 2.0, _T0),
    ])
    r = ab_value_ks_test(same).first()
    assert r["d_stat"] == 0.0

    # tie at 2.0: after value 2.0, cum_a=2/2, cum_b=1/2 -> gap 1/2;
    # a row-grain evaluation with an unlucky tie-break would read 1.0
    tied = _ev(spark, [
        (0, 0, "v", 1.0, _T0), (1, 0, "v", 2.0, _T0),
        (2, 1, "v", 2.0, _T0), (3, 1, "v", 3.0, _T0),
    ])
    r = ab_value_ks_test(tied).first()
    assert r["d_stat"] == 0.5


def test_ab_ks_empty_variant_is_null(spark):
    from edu_online_spark.operators.analytics import ab_value_ks_test

    r = ab_value_ks_test(
        _ev(spark, [(i, 2 * i, "v", float(i), _T0) for i in range(3)])
    ).first()
    assert r["d_stat"] is None and r["ks_crit"] is None
    assert r["significant"] is False


# -- events_ab_effect_size ----------------------------------------------------


def test_ab_effect_size_matches_r19_oracle(spark, sf_dir):
    from edu_online_spark.operators.analytics import (
        ORACLE_R19,
        ab_value_effect_size,
    )

    problems = compare(
        "events_ab_effect_size",
        ab_value_effect_size(load_table(spark, sf_dir, "events")),
        run_oracle(ORACLE_R19["events_ab_effect_size"], sf_dir),
    )
    assert not problems, problems


def test_ab_effect_size_fixture(spark):
    """A = {2,4} (mean 3, var 2), B = {5,9} (mean 7, var 8): pooled
    variance (1·2 + 1·8)/2 = 5, d = 4/√5 — matched against the
    same-order Python arithmetic on the micros-exact moments."""
    from edu_online_spark.operators.analytics import ab_value_effect_size

    ev = _ev(spark, [
        (0, 0, "v", 2.0, _T0), (1, 0, "v", 4.0, _T0),
        (2, 1, "v", 5.0, _T0), (3, 1, "v", 9.0, _T0),
    ])
    r = ab_value_effect_size(ev).first()
    assert (r["n_a"], r["n_b"], r["mean_a"], r["mean_b"]) == (2, 2, 3.0, 7.0)
    micro = 1_000_000.0
    s_a, ss_a = 6_000_000.0, (2e6 ** 2 + 4e6 ** 2)
    s_b, ss_b = 14_000_000.0, (5e6 ** 2 + 9e6 ** 2)
    var_a = ((ss_a - (s_a * s_a) / 2.0) / 1.0) / (micro * micro)
    var_b = ((ss_b - (s_b * s_b) / 2.0) / 1.0) / (micro * micro)
    pooled = (1.0 * var_a + 1.0 * var_b) / 2.0
    assert r["cohens_d"] == (7.0 - 3.0) / math.sqrt(pooled)


def test_ab_effect_size_degenerate_is_null(spark):
    """Constant values: pooled variance 0 -> d NULL (an infinite
    effect size is a broken readout, not a result)."""
    from edu_online_spark.operators.analytics import ab_value_effect_size

    ev = _ev(spark, [(i, i, "v", 5.0, _T0) for i in range(4)])
    r = ab_value_effect_size(ev).first()
    assert r["cohens_d"] is None
    assert (r["mean_a"], r["mean_b"]) == (5.0, 5.0)


# -- events_ab_quantile_uplift ------------------------------------------------


def test_ab_quantile_uplift_matches_r19_oracle(spark, sf_dir):
    from edu_online_spark.operators.analytics import (
        ORACLE_R19,
        ab_quantile_uplift,
    )

    problems = compare(
        "events_ab_quantile_uplift",
        ab_quantile_uplift(load_table(spark, sf_dir, "events")),
        run_oracle(ORACLE_R19["events_ab_quantile_uplift"], sf_dir),
    )
    assert not problems, problems


def test_ab_quantile_uplift_fixture(spark):
    """B's values are exactly A's + 5 within one segment: every decile
    uplift reads exactly 5.0 (discrete selection subtracts actual data
    values — no interpolation noise anywhere)."""
    from edu_online_spark.operators.analytics import ab_quantile_uplift

    rows = []
    eid = 0
    for v in (10.0, 20.0, 30.0, 40.0):
        rows.append((eid, 0, "view", v, _T0)); eid += 1
        rows.append((eid, 1, "view", v + 5.0, _T0)); eid += 1
    ev = _ev(spark, rows)
    got = ab_quantile_uplift(ev).collect()
    assert len(got) == 9
    assert all(r["uplift"] == 5.0 for r in got)
    d50 = next(r for r in got if r["decile"] == 0.5)
    assert (d50["q_a"], d50["q_b"]) == (20.0, 25.0)


def test_ab_quantile_uplift_empty_variant_is_null(spark):
    from edu_online_spark.operators.analytics import ab_quantile_uplift

    ev = _ev(spark, [(i, 2 * i, "view", float(i), _T0) for i in range(4)])
    got = ab_quantile_uplift(ev).collect()
    assert all(r["q_b"] is None and r["uplift"] is None for r in got)
    assert all(r["q_a"] is not None for r in got)


# -- events_t_closeness (round-16 session addition) ---------------------------


def test_t_closeness_matches_r19_oracle(spark, sf_dir):
    from edu_online_spark.operators.pii import ORACLE_R19, _q_events_tclose

    problems = compare(
        "events_t_closeness",
        _q_events_tclose(spark, sf_dir),
        run_oracle(ORACLE_R19["events_t_closeness"], sf_dir),
    )
    assert not problems, problems


def test_t_closeness_hand_computed_census(spark):
    """Three hand-computed classes over global {v1: 6, v2: 2, v3: 4},
    N=12: class A {1,1,2,2} reads TVD 32/96 = 1/3 (clean); class B
    {1,1,1,1} reads 48/96 = 0.5 — exactly AT t, and the strict `>`
    must NOT flag it (integer boundary semantics); class C {3,3,3,3}
    owns its value entirely, 64/96 = 2/3, flagged."""
    from edu_online_spark.operators.pii import t_closeness_report

    rows = (
        [("A", 1), ("A", 1), ("A", 2), ("A", 2)]
        + [("B", 1), ("B", 1), ("B", 1), ("B", 1)]
        + [("C", 3), ("C", 3), ("C", 3), ("C", 3)]
    )
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {
        r["grp"]: (r["n_rows"], r["sum_abs_dev"], round(r["tvd"], 9),
                   r["violates_t"])
        for r in t_closeness_report(df, ["grp"], "v").collect()
    }
    assert got == {
        "A": (4, 32.0, round(1 / 3, 9), False),
        "B": (4, 48.0, 0.5, False),  # == t: strict inequality holds it
        "C": (4, 64.0, round(2 / 3, 9), True),
    }


def test_t_closeness_identical_distribution_is_zero(spark):
    """A class whose sensitive distribution equals the global one has
    TVD exactly 0 — the integer cross-products cancel term-for-term,
    no float residue."""
    from edu_online_spark.operators.pii import t_closeness_report

    rows = [(g, v) for g in ("X", "Y") for v in (1, 1, 2)]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = t_closeness_report(df, ["grp"], "v").collect()
    assert all(r["tvd"] == 0.0 and not r["violates_t"] for r in got)
    assert all(r["sum_abs_dev"] == 0.0 for r in got)


# -- ann_label_mrr (round-16 session addition) --------------------------------


def test_label_mrr_matches_r19_oracle(spark, sf_dir):
    from edu_online_spark.operators.similarity import ORACLE_R19, label_mrr

    problems = compare(
        "ann_label_mrr",
        label_mrr(load_table(spark, sf_dir, "embeddings")),
        run_oracle(ORACLE_R19["ann_label_mrr"], sf_dir),
    )
    assert not problems, problems


def test_label_mrr_first_hit_semantics(spark):
    """Planted 2-D geometry: qid 0's same-label neighbor sits at rank
    3 of the angle ordering (rr = 1/3); qid 1's only same-label
    neighbor is OUTSIDE k, so the query reads a 0.0 miss, not an
    absent row."""
    import math as m

    from edu_online_spark.operators.similarity import label_mrr

    def vec(deg):
        return [m.cos(m.radians(deg)), m.sin(m.radians(deg))]

    rows = [
        (0, vec(0.0), 100),    # query 0
        (1, vec(90.0), 200),   # query 1
        # neighbors of q0 by ascending angle → descending cosine
        (10, vec(5.0), 1),
        (11, vec(10.0), 2),
        (12, vec(15.0), 100),  # first same-label hit at rank 3
        (13, vec(20.0), 100),
        # q1's same-label neighbor is angularly last — outside k=3
        # (its top-3 are the 5/10/15-degree vectors via cos symmetry)
        (14, vec(178.0), 200),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    got = {
        r["qid"]: (r["first_hit_rank"], r["rr"])
        for r in label_mrr(df, k=3, n_queries=2).collect()
    }
    assert got[0] == (3, 1.0 / 3.0)
    assert got[1] == (None, 0.0)


# -- events_ab_fdr_bh (round-16 session addition) -----------------------------


def test_ab_fdr_bh_matches_r19_oracle(spark, sf_dir):
    from edu_online_spark.operators.analytics import ORACLE_R19, ab_fdr_bh

    problems = compare(
        "events_ab_fdr_bh",
        ab_fdr_bh(load_table(spark, sf_dir, "events")),
        run_oracle(ORACLE_R19["events_ab_fdr_bh"], sf_dir),
    )
    assert not problems, problems


def _fdr_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz"
    )


def test_ab_fdr_bh_planted_effect_and_degenerate_exclusion(spark):
    """200 users (100 per arm), every event at one timestamp (so
    activation = incidence). 'base' activates EVERYONE → degenerate,
    z NULL, excluded from m, never rejected. 'lift' activates 50 even
    vs 10 odd users (z ≈ 6.17 ≥ crit(1,2) = 2.2414 → rejected);
    'flat' activates 30 vs 30 (z = 0, never rejected). m counts only
    the two testable types."""
    import datetime

    from edu_online_spark.operators.analytics import ab_fdr_bh

    t0 = datetime.datetime(2024, 5, 1, 12, 0, 0)
    rows, eid = [], 0
    for u in range(200):
        rows.append((eid, u, "base", t0)); eid += 1
    for u in list(range(0, 100, 2)) + list(range(1, 20, 2)):
        rows.append((eid, u, "lift", t0)); eid += 1
    for u in list(range(0, 60, 2)) + list(range(1, 60, 2)):
        rows.append((eid, u, "flat", t0)); eid += 1
    got = {
        r["event_type"]: r
        for r in ab_fdr_bh(_fdr_events(spark, rows)).collect()
    }
    assert got["base"]["z"] is None
    assert got["base"]["m_tests"] == 2 and not got["base"]["rejected"]
    assert got["lift"]["bh_rank"] == 1 and got["lift"]["rejected"]
    assert got["lift"]["conv_a"] == 50 and got["lift"]["conv_b"] == 10
    assert got["flat"]["z"] == 0.0 and not got["flat"]["rejected"]


def test_ab_fdr_bh_step_up_rejects_below_a_failed_rank(spark):
    """THE distinguishing BH behavior (vs step-down/Bonferroni): k* is
    the LARGEST k whose threshold holds, so a rank-1 statistic that
    misses its (stricter) threshold is still rejected when rank 2
    passes its (looser) one. Planted: z₁ ≈ 2.124 < crit(1,2) = 2.2414
    but z₂ ≈ 1.980 ≥ crit(2,2) = 1.9600 → k* = 2, BOTH rejected."""
    import datetime

    from edu_online_spark.operators.analytics import ab_fdr_bh

    t0 = datetime.datetime(2024, 5, 1, 12, 0, 0)
    rows, eid = [], 0
    for u in range(200):
        rows.append((eid, u, "base", t0)); eid += 1
    # 'p': 60 even vs 45 odd activations → z ≈ 2.124
    for u in list(range(0, 120, 2)) + list(range(1, 90, 2)):
        rows.append((eid, u, "p", t0)); eid += 1
    # 'q': 58 even vs 44 odd activations → z ≈ 1.980
    for u in list(range(0, 116, 2)) + list(range(1, 88, 2)):
        rows.append((eid, u, "q", t0)); eid += 1
    got = {
        r["event_type"]: r
        for r in ab_fdr_bh(_fdr_events(spark, rows)).collect()
    }
    assert got["p"]["bh_rank"] == 1 and abs(got["p"]["z"]) < got["p"]["crit"]
    assert got["q"]["bh_rank"] == 2 and abs(got["q"]["z"]) >= got["q"]["crit"]
    assert got["p"]["rejected"] and got["q"]["rejected"]  # the step-up
