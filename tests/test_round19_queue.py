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
