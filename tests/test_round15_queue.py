"""Round-15 promotion queue: library ops + audited oracles, landed two
rounds ahead of their window slot (the COVERAGE.md deferral
arithmetic). Three hash-checked ops get the oracle parity check at
sf0.001 plus fixtures pinning the semantics the oracle alone can't
distinguish; the rows-only calibration op gets the estimator-contract
pins that stand in for its (impossible-by-design) hash check."""

from __future__ import annotations

from pyspark.sql import functions as F

from edu_online_spark.sources import load_table
from tools.parity import compare, run_oracle


# -- corpus_shingle_df_spectrum -------------------------------------------


def test_shingle_df_spectrum_matches_r15_oracle(spark, sf_dir):
    from edu_online_spark.operators.textops import (
        ORACLE_R15,
        shingle_df_spectrum,
    )

    problems = compare(
        "corpus_shingle_df_spectrum",
        shingle_df_spectrum(load_table(spark, sf_dir, "documents")),
        run_oracle(ORACLE_R15["corpus_shingle_df_spectrum"], sf_dir),
    )
    assert not problems, problems


def test_shingle_df_spectrum_fixture():
    """A corpus with one repeated template and one fresh doc:
    template shingles land at df=2, fresh ones at df=1, and the
    shares partition the distinct-shingle vocabulary."""
    from edu_online_spark.session import get_spark
    from edu_online_spark.operators.textops import shingle_df_spectrum

    spark = get_spark()
    docs = spark.createDataFrame(
        [
            ("d1", "a b c d"),       # shingles: "a b c", "b c d"
            ("d2", "a b c d"),       # same two -> df 2
            ("d3", "p q r s t"),     # "p q r","q r s","r s t" -> df 1
            ("d4", "x y"),           # too short: no 3-gram
        ],
        "doc_id string, text string",
    )
    rows = {r["df"]: r for r in shingle_df_spectrum(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_shingles"] == 3 and rows[2]["n_shingles"] == 2
    assert rows[1]["share"] == 3 / 5 and rows[2]["share"] == 2 / 5


# -- supplier_revenue_hhi ---------------------------------------------------


def test_supplier_revenue_hhi_matches_r15_oracle(spark, sf_dir):
    from edu_online_spark.operators.analytics import (
        ORACLE_R15,
        supplier_revenue_hhi,
    )

    problems = compare(
        "supplier_revenue_hhi",
        supplier_revenue_hhi(
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "supplier"),
            load_table(spark, sf_dir, "nation"),
        ),
        run_oracle(ORACLE_R15["supplier_revenue_hhi"], sf_dir),
    )
    assert not problems, problems


def test_supplier_revenue_hhi_fixture():
    """Known concentrations: a monopoly nation reads HHI=1, an equal
    duopoly 0.5, a 75/25 split 0.625; a returns-negative nation reads
    NULL (the Gini op's positivity guard, shared)."""
    from edu_online_spark.session import get_spark
    from edu_online_spark.operators.analytics import supplier_revenue_hhi

    spark = get_spark()
    lineitem = spark.createDataFrame(
        [
            (1, "100.00", "0.00"),            # MONO: one supplier
            (2, "100.00", "0.00"),            # DUO: 100 + 100
            (3, "100.00", "0.00"),
            (4, "300.00", "0.00"),            # SKEW: 300 + 100
            (5, "100.00", "0.00"),
            (6, "-50.00", "0.00"),            # NEG: negative total
        ],
        "l_suppkey long, l_extendedprice string, l_discount string",
    )
    supplier = spark.createDataFrame(
        [(k, n) for k, n in
         [(1, 0), (2, 1), (3, 1), (4, 2), (5, 2), (6, 3)]],
        "s_suppkey long, s_nationkey long",
    )
    nation = spark.createDataFrame(
        [(0, "MONO"), (1, "DUO"), (2, "SKEW"), (3, "NEG")],
        "n_nationkey long, n_name string",
    )
    out = {
        r["nation"]: r
        for r in supplier_revenue_hhi(lineitem, supplier, nation).collect()
    }
    assert out["MONO"]["hhi"] == 1.0 and out["MONO"]["top1_share"] == 1.0
    assert out["DUO"]["hhi"] == 0.5 and out["DUO"]["top1_share"] == 0.5
    assert out["SKEW"]["hhi"] == 0.625 and out["SKEW"]["top1_share"] == 0.75
    assert out["NEG"]["hhi"] is None and out["NEG"]["top1_share"] is None


# -- embeddings_norm_deciles ------------------------------------------------


def test_norm_deciles_matches_r15_oracle(spark, sf_dir):
    from edu_online_spark.operators.similarity import (
        ORACLE_R15,
        norm_deciles,
    )

    problems = compare(
        "embeddings_norm_deciles",
        norm_deciles(load_table(spark, sf_dir, "embeddings")),
        run_oracle(ORACLE_R15["embeddings_norm_deciles"], sf_dir),
    )
    assert not problems, problems


def test_norm_deciles_fixture():
    """Three known norms {1, 4, 9} in one label: the ceil(k·n/10)
    order statistics split exactly at ranks 1/2/3; a unit-normalized
    label reads every decile 1.0."""
    from edu_online_spark.session import get_spark
    from edu_online_spark.operators.similarity import norm_deciles

    spark = get_spark()
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.0, 2.0], 0),
            (2, [3.0, 0.0], 0),
            (3, [0.6, 0.8], 1),
            (4, [-0.8, 0.6], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["label"]: r for r in norm_deciles(emb).collect()}
    r0 = out[0]
    assert r0["n_vecs"] == 3
    assert (r0["min_norm2"], r0["max_norm2"]) == (1.0, 9.0)
    assert [r0[f"d{k}"] for k in range(1, 10)] == [
        1.0, 1.0, 1.0, 4.0, 4.0, 4.0, 9.0, 9.0, 9.0,
    ]
    r1 = out[1]
    # 0.6²+0.8² folds to exactly 1.0 in float→double? The float
    # representations of .6/.8 square to slightly-off doubles — pin
    # only that both unit vectors agree and sit within 1e-6 of 1.0.
    assert r1["min_norm2"] == r1["max_norm2"]
    assert abs(r1["d5"] - 1.0) < 1e-6


# -- dedup_minhash_calibration (rows-only) ----------------------------------


def test_minhash_calibration_estimator_contract(spark, sf_dir):
    """The pins that stand in for the impossible hash check:
    every mean_est sits on the 1/num_hashes grid (it is Σ matches ÷
    (k·n)); per-bin mean |est − exact| stays inside a generous
    binomial envelope (σ ≤ √(0.25/64) ≈ 0.0625, so 2σ = 0.125);
    the estimator is unbiased enough that mean_est tracks mean_exact
    within the same envelope on every populated bin."""
    from edu_online_spark.operators.dedup import minhash_calibration

    docs = load_table(spark, sf_dir, "documents")
    rows = minhash_calibration(docs).collect()
    assert rows, "no LSH candidate pairs at sf0.001 — generator changed?"
    for r in rows:
        assert 0 <= r["j_bin"] <= 9
        assert r["mean_abs_err"] <= 0.125, (r["j_bin"], r["mean_abs_err"])
        assert abs(r["mean_est"] - r["mean_exact"]) <= 0.125, r
    n_pairs = sum(r["n_pairs"] for r in rows)
    assert n_pairs >= 5


def test_minhash_calibration_identical_docs_read_one():
    """Two identical documents must collide in every band and read
    est = 1.0 = exact (the estimator's fixed point); a disjoint third
    document must not produce a cross pair."""
    from edu_online_spark.session import get_spark
    from edu_online_spark.operators.dedup import minhash_calibration

    spark = get_spark()
    same = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    docs = spark.createDataFrame(
        [(1, same), (2, same), (3, "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11")],
        "doc_id long, text string",
    )
    rows = minhash_calibration(docs).collect()
    # the identical pair lands in bin 9 with zero error; doc 3 may
    # only pair with itself (never) so at most the one pair exists
    assert len(rows) == 1 and rows[0]["j_bin"] == 9
    r = rows[0]
    assert r["n_pairs"] == 1
    assert r["mean_est"] == 1.0 and r["mean_exact"] == 1.0
    assert r["max_abs_err"] == 0.0


# -- events_user_activity_gini ------------------------------------------------


def test_user_activity_gini_matches_r15_oracle(spark, sf_dir):
    from edu_online_spark.operators.analytics import (
        ORACLE_R15,
        user_activity_gini,
    )

    problems = compare(
        "events_user_activity_gini",
        user_activity_gini(load_table(spark, sf_dir, "events")),
        run_oracle(ORACLE_R15["events_user_activity_gini"], sf_dir),
    )
    assert not problems, problems


def test_user_activity_gini_fixture():
    """Known concentrations: an equal population reads gini 0; a
    one-whale population {1,1,1,97} reads the hand-computed 0.72 with
    top-decile share 0.97 (k = floor(0.9·4) = 3 users below the cut)."""
    from edu_online_spark.session import get_spark
    from edu_online_spark.operators.analytics import user_activity_gini

    spark = get_spark()
    rows = []
    # type EQ: four users, one event each
    rows += [(i, u, "EQ") for i, u in enumerate([1, 2, 3, 4])]
    # type WHALE: three users with 1 event, one with 97
    rows += [(100 + i, 10 + i, "WHALE") for i in range(3)]
    rows += [(200 + i, 13, "WHALE") for i in range(97)]
    ev = spark.createDataFrame(
        [(e, u, t, f"2024-01-01 10:{e % 60:02d}:00") for e, u, t in rows],
        "event_id long, user_id long, event_type string, ts string",
    )
    out = {r["event_type"]: r for r in user_activity_gini(ev).collect()}
    eq, wh = out["EQ"], out["WHALE"]
    assert (eq["n_users"], eq["total_events"]) == (4, 4)
    assert eq["gini"] == 0.0 and eq["top_decile_share"] == 0.25
    assert (wh["n_users"], wh["total_events"]) == (4, 100)
    # sum i·x = 1+2+3+4·97 = 394 -> (2·394 − 5·100)/(4·100)
    assert wh["gini"] == (2 * 394 - 5 * 100) / 400
    assert wh["top_decile_share"] == 0.97


def test_user_activity_gini_histogram_equals_rank_identity(spark, sf_dir):
    """The histogram formulation must equal the direct sorted-rank
    identity computed driver-side over the same per-user counts —
    the arithmetic-series claim, checked numerically per event type."""
    from edu_online_spark.operators.analytics import user_activity_gini
    from pyspark.sql import functions as F  # noqa: F811

    events = load_table(spark, sf_dir, "events")
    got = {r["event_type"]: r for r in user_activity_gini(events).collect()}
    per = (
        events.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_type: dict[str, list[int]] = {}
    for r in per:
        by_type.setdefault(r["event_type"], []).append(r["c"])
    for t, counts in by_type.items():
        xs = sorted(counts)
        n, sx = len(xs), sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        expect_gini = (2 * six - (n + 1) * sx) / (n * sx)
        assert got[t]["gini"] == expect_gini, t
        k = (9 * n) // 10
        expect_top = (sx - sum(xs[:k])) / sx
        assert got[t]["top_decile_share"] == expect_top, t


# -- dedup_pair_degree_spectrum ----------------------------------------------


def test_pair_degree_spectrum_matches_r15_oracle(spark, sf_dir):
    from edu_online_spark.operators.dedup import (
        ORACLE_R15,
        pair_degree_spectrum,
    )

    problems = compare(
        "dedup_pair_degree_spectrum",
        pair_degree_spectrum(load_table(spark, sf_dir, "documents")),
        run_oracle(ORACLE_R15["dedup_pair_degree_spectrum"], sf_dir),
    )
    assert not problems, problems


def test_pair_degree_spectrum_fixture():
    """A 3-clique of identical docs (every member degree 2) plus one
    fresh doc (degree 0): the spectrum partitions the corpus and the
    shares say so."""
    from edu_online_spark.session import get_spark
    from edu_online_spark.operators.dedup import pair_degree_spectrum

    spark = get_spark()
    same = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, same), (2, same), (3, same),
         (4, " ".join(f"z{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    rows = {r["degree"]: r for r in pair_degree_spectrum(docs).collect()}
    assert set(rows) == {0, 2}
    assert rows[0]["n_docs"] == 1 and rows[2]["n_docs"] == 3
    assert rows[0]["share"] == 0.25 and rows[2]["share"] == 0.75


def test_pair_degree_spectrum_consistency(spark, sf_dir):
    """Structural invariants against the certified pairs relation:
    Σ degree·n_docs = 2·|pairs| (every edge contributes two degree
    units) and Σ n_docs = |documents| (degree 0 included)."""
    from edu_online_spark.operators.dedup import (
        minhash_lsh_pairs,
        pair_degree_spectrum,
    )

    docs = load_table(spark, sf_dir, "documents")
    spec = pair_degree_spectrum(docs).collect()
    n_pairs = minhash_lsh_pairs(docs).count()
    assert sum(r["degree"] * r["n_docs"] for r in spec) == 2 * n_pairs
    assert sum(r["n_docs"] for r in spec) == docs.count()
