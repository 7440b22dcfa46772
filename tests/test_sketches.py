"""Sketch operators: accuracy envelopes, the mergeability property that
justifies them at scale, and the all-JVM plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from edu_online_spark.operators.sketches import (
    audience_overlap_sketch,
    distinct_users_sketch_rollup,
)
from edu_online_spark.plans import explain_str
from edu_online_spark.sources import load_table


def test_hll_rollup_matches_exact_within_tolerance(spark, sf_dir):
    out = distinct_users_sketch_rollup(load_table(spark, sf_dir, "events")).collect()
    assert out, "no groups"
    for r in out:
        assert r.est_within_5pct, f"{r.event_type}: estimate outside 5% of {r.exact_users}"
        assert r.n_days >= 1


def test_theta_overlap_matches_exact_within_tolerance(spark, sf_dir):
    [r] = audience_overlap_sketch(load_table(spark, sf_dir, "events")).collect()
    assert r.overlap_within_5pct, f"overlap est off (exact {r.exact_overlap})"
    assert r.view_only_within_5pct, f"difference est off (exact {r.exact_view_only})"
    # the set algebra must be consistent: overlap + view_only = viewers
    events = load_table(spark, sf_dir, "events")
    n_viewers = (
        events.filter(F.col("event_type") == "view").select("user_id").distinct().count()
    )
    assert r.exact_overlap + r.exact_view_only == n_viewers


def test_hll_union_of_disjoint_slices_equals_whole(spark, sf_dir):
    """THE property that makes sketches the 100 TB rollup path: sketching
    two disjoint halves and unioning the sketches estimates the same
    cardinality as sketching the whole — merge is lossless relative to
    one-shot sketching (identical sketch state, not merely close)."""
    events = load_table(spark, sf_dir, "events")
    whole = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 12)).alias("est")
    ).collect()[0].est
    halves = (
        events.withColumn("half", (F.col("event_id") % 2).cast("int"))
        .groupBy("half")
        .agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    assert whole == halves, (whole, halves)


def test_sketch_plans_stay_jvm_side(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    for df in (
        distinct_users_sketch_rollup(events),
        audience_overlap_sketch(events),
    ):
        plan = explain_str(df, "simple")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan  # 1-row crossJoins broadcast


def test_tolerance_booleans_hold_at_bench_scale(spark):
    """The boolean-tolerance oracles must be scale-stable: a tolerance
    calibrated only for the tiny driver SF is a landmine (observed: the
    default-rsd HLL++ check flipped at sf0.1's 1,500 users/group before
    rsd was tightened to 0.01). Pin every certified estimate boolean at
    the largest local SF."""
    from pyspark.sql import functions as F

    from edu_online_spark.registry import queries

    qs = queries()
    for name in (
        "events_distinct_users_approx",
        "lineitem_price_quantiles_approx",
        "quiz_mastery_approx",
        "events_hll_rollup",
        "events_theta_overlap",
    ):
        df = qs[name](spark, "/root/testdata/sf0.1")
        cond = None
        for c, t in df.dtypes:
            if t == "boolean":
                cond = F.col(c) if cond is None else (cond & F.col(c))
        assert cond is not None, f"{name} lost its tolerance booleans"
        assert df.filter(~cond).count() == 0, f"{name} envelope violated at sf0.1"


def test_countmin_never_underestimates_and_detects_collisions(spark, sf_dir):
    """The CMS guarantee: est >= exact for every probe (min over d
    rows of non-negative-sum cells can never undercount), and with the
    deliberately tiny 16-cell width some probe MUST collide (31-word
    vocabulary, pigeonhole) — a zero total overestimate would mean the
    sketch silently degenerated to exact counts and certifies nothing."""
    from edu_online_spark.operators.sketches import token_countmin
    from edu_online_spark.sources import load_table

    out = token_countmin(load_table(spark, sf_dir, "documents")).collect()
    assert len(out) == 20
    assert all(r["overestimate"] >= 0 for r in out)
    assert all(r["cms_est"] == r["exact_cnt"] + r["overestimate"] for r in out)
    assert any(r["overestimate"] > 0 for r in out)


def test_bloom_membership_no_false_negatives_and_forced_fps(spark):
    """Members must ALWAYS hit (one-sided error), and a deliberately
    tiny filter must produce false positives that are flagged is_fp —
    never a member marked miss."""
    from edu_online_spark.operators.sketches import bloom_membership_audit

    customer = spark.createDataFrame(
        [(i,) for i in range(1, 201)], ["c_custkey"]
    )
    orders = spark.createDataFrame(
        [(i,) for i in range(1, 201) if i % 10 == 0], ["o_custkey"]
    )
    out = bloom_membership_audit(customer, orders, m=64).collect()
    assert len(out) == 200
    for r in out:
        if r["exact_member"]:
            assert r["bloom_hit"] and not r["is_fp"]  # no false negatives
        else:
            assert r["is_fp"] == r["bloom_hit"]
    # m=64 bits with 20 members * 3 hashes → collisions guaranteed
    assert any(r["is_fp"] for r in out)
    # default-sized filter: same guarantee, far fewer fps
    big = bloom_membership_audit(customer, orders).collect()
    fps_small = sum(r["is_fp"] for r in out)
    fps_big = sum(r["is_fp"] for r in big)
    assert fps_big < fps_small


def test_bloom_membership_partitioning_invariant(spark):
    from edu_online_spark.operators.sketches import bloom_membership_audit

    customer = spark.createDataFrame([(i,) for i in range(300)], ["c_custkey"])
    orders = spark.createDataFrame(
        [(i * 7,) for i in range(30)], ["o_custkey"]
    )
    a = sorted(map(tuple, bloom_membership_audit(customer, orders, m=128).collect()))
    b = sorted(
        map(
            tuple,
            bloom_membership_audit(
                customer.repartition(9), orders.repartition(5), m=128
            ).collect(),
        )
    )
    assert a == b


def test_kll_rollup_merge_estimates_inside_band(spark):
    """Per-group estimate booleans must hold, and the ALL row — whose
    estimates come from MERGING the group sketches, not a rescan —
    must land inside the exact-rank band too."""
    from edu_online_spark.operators.sketches import (
        price_quantile_sketch_rollup,
    )

    rows = [
        (float(i), ["A", "N", "R"][i % 3]) for i in range(3000)
    ]
    df = spark.createDataFrame(rows, ["l_extendedprice", "l_returnflag"])
    out = {r["scope"]: r for r in price_quantile_sketch_rollup(df).collect()}
    assert set(out) == {"A", "N", "R", "ALL"}
    for r in out.values():
        assert r["est_p25_ok"] and r["est_p50_ok"] and r["est_p75_ok"]
    assert out["ALL"]["n_rows"] == 3000
    # exact quartiles of 0..2999 are actual data values (percentile_disc)
    assert out["ALL"]["exact_p50"] in {1499.0, 1500.0}
    assert out["ALL"]["exact_p25"] < out["ALL"]["exact_p50"] < out["ALL"]["exact_p75"]


def test_kll_rollup_exact_columns_partitioning_invariant(spark):
    """The hash-certified surface (exact quartiles + counts) must be
    bit-stable under repartitioning; the sketch estimates only need to
    stay inside their band (randomized compaction is allowed to move
    them within it)."""
    from edu_online_spark.operators.sketches import (
        price_quantile_sketch_rollup,
    )

    rows = [(float(i * 7 % 1000), ["A", "N"][i % 2]) for i in range(2000)]
    df = spark.createDataFrame(rows, ["l_extendedprice", "l_returnflag"])
    cols = ["scope", "n_rows", "exact_p25", "exact_p50", "exact_p75"]
    a = sorted(map(tuple, price_quantile_sketch_rollup(df).select(cols).collect()))
    b = sorted(
        map(
            tuple,
            price_quantile_sketch_rollup(df.repartition(17)).select(cols).collect(),
        )
    )
    assert a == b


def test_kll_exact_legs_match_percentile_disc_semantics(spark):
    """The histogram-selection rewrite of the exact audit legs
    (optimization r16) must reproduce percentile_disc's value selection
    bit-for-bit: rank = max(1, ceil(q*n)) with IEEE double multiply.
    Fuzz the whole (lo, exact, hi) tag set against percentile_disc
    itself over group sizes that exercise the ceil boundaries (n
    multiples of 4, 5 and 20 make q*n land on or near integers for
    q in {0.2, 0.25, 0.3..., 0.45, 0.5, 0.55, 0.7, 0.75, 0.8...})."""
    import random

    from pyspark.sql import functions as F

    from edu_online_spark.operators.sketches import (
        KLL_RANK_TOL,
        price_quantile_sketch_rollup,
    )

    rng = random.Random(11)
    rows = []
    # one flag per group size so every size certifies independently
    sizes = {"A": 20, "N": 25, "R": 64}
    for flag, n in sizes.items():
        rows += [(round(rng.uniform(1.0, 999.0), 2), flag) for _ in range(n)]
    df = spark.createDataFrame(rows, ["l_extendedprice", "l_returnflag"])
    got = {r["scope"]: r for r in price_quantile_sketch_rollup(df).collect()}

    qs = []
    for q in (0.25, 0.5, 0.75):
        p = int(q * 100)
        qs += [
            (f"exact_p{p}", q),
        ]
    # the lo/hi legs are not in the output schema, but their selection
    # drives the est_*_ok booleans — certify the visible legs against
    # percentile_disc and the booleans against a direct recomputation
    ref_aggs = [
        F.expr(
            f"percentile_disc({qq!r}) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias(tag)
        for tag, qq in qs
    ]
    ref = {
        r["l_returnflag"]: r
        for r in df.groupBy("l_returnflag").agg(*ref_aggs).collect()
    }
    ref["ALL"] = df.agg(*ref_aggs).collect()[0]
    for scope in ("A", "N", "R", "ALL"):
        for tag, _ in qs:
            assert got[scope][tag] == ref[scope][tag], (scope, tag)
    assert 0.0 < KLL_RANK_TOL < 0.25  # tol sanity for the lo/hi legs


def test_kll_rank_formula_fuzz_2250_group_sizes(spark):
    """The full fuzz the r16 rewrite was certified with, committed:
    percentile_disc's value selection == sorted[max(1, ceil(q*n)) - 1]
    with IEEE double multiply, for 250 group sizes x the 9 quantile
    literals the rollup's melted spec actually uses (exact q and the
    lo/hi band legs, same clamp arithmetic). 2250 (n, q) combinations,
    one Spark job. This is the rank rule picks() embeds in SQL
    (greatest(1, ceil(q*n))), so pinning the formula pins the
    pipeline's selection semantics."""
    import math
    import random

    from pyspark.sql import functions as F

    from edu_online_spark.operators.sketches import KLL_RANK_TOL

    qs = []
    for q in (0.25, 0.5, 0.75):
        qs.append(q)
        qs.append(max(0.0, q - KLL_RANK_TOL))
        qs.append(min(1.0, q + KLL_RANK_TOL))
    assert len(qs) == 9

    rng = random.Random(23)
    sizes = list(range(1, 201)) + rng.sample(range(201, 5000), 50)
    assert len(sizes) == 250
    rows = []
    values = {}
    for gid, n in enumerate(sizes):
        vals = [round(rng.uniform(1.0, 999.0), 2) for _ in range(n)]
        values[gid] = sorted(vals)
        rows += [(gid, v) for v in vals]
    df = spark.createDataFrame(rows, ["gid", "v"])
    aggs = [
        F.expr(f"percentile_disc({q!r}) WITHIN GROUP (ORDER BY v)").alias(
            f"q{i}"
        )
        for i, q in enumerate(qs)
    ]
    got = {r["gid"]: r for r in df.groupBy("gid").agg(*aggs).collect()}
    mismatches = []
    for gid, n in enumerate(sizes):
        srt = values[gid]
        for i, q in enumerate(qs):
            # the formula under test: 1-based rank, IEEE double multiply
            rank = max(1, math.ceil(q * n))
            if got[gid][f"q{i}"] != srt[rank - 1]:
                mismatches.append((n, q))
    assert mismatches == [], f"{len(mismatches)} of 2250: {mismatches[:5]}"


def test_kll_rollup_rejects_unknown_flag(spark):
    """VERDICT r16 #8: a l_returnflag outside the TPC-H domain must
    fail loudly, not silently borrow the ALL thresholds for its exact
    columns (the pre-r16 percentile_disc form was domain-generic)."""
    import pytest

    from edu_online_spark.operators.sketches import (
        price_quantile_sketch_rollup,
    )

    rows = [(float(i), ["A", "N", "X"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, ["l_extendedprice", "l_returnflag"])
    with pytest.raises(Exception, match="outside the TPC-H domain"):
        price_quantile_sketch_rollup(df).collect()
