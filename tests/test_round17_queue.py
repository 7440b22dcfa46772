"""Round-17 promotion queue: library ops + audited oracles, landed
four rounds ahead of their window slot. Oracle parity at sf0.001 plus
fixtures pinning the semantics the oracle alone can't distinguish."""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

from edu_online_spark.sources import load_table
from tools.parity import compare, run_oracle


# -- events_cusum_level_shift -------------------------------------------------


def test_cusum_level_shift_matches_r17_oracle(spark, sf_dir):
    from edu_online_spark.operators.analytics import (
        ORACLE_R17,
        cusum_level_shift,
    )

    problems = compare(
        "events_cusum_level_shift",
        cusum_level_shift(load_table(spark, sf_dir, "events")),
        run_oracle(ORACLE_R17["events_cusum_level_shift"], sf_dir),
    )
    assert not problems, problems


def test_cusum_level_shift_fixture(spark):
    """Hand-built level shift: counts [10,10,10,10,40,40,40,40] at
    slack_den=4 → total 200, n 8, slack 50. Scaled deviations are
    −120/+120; slack-adjusted ±70 runs accumulate hand-computed
    CUSUMs, and the >total alarm brackets the change point: the
    low-side run flags days 3-4 (before the shift), the high-side
    run days 7-8 (after it)."""
    from edu_online_spark.operators.analytics import cusum_level_shift

    counts = [10, 10, 10, 10, 40, 40, 40, 40]
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, datetime.datetime(2024, 5, 1 + d, 12, 0, 0))
            )
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz")
    got = sorted(
        cusum_level_shift(ev, slack_den=4).collect(),
        key=lambda r: r["day"],
    )
    assert [r["cusum_pos"] for r in got] == [0, 0, 0, 0, 70, 140, 210, 280]
    assert [r["cusum_neg"] for r in got] == [70, 140, 210, 280, 110, 0, 0, 0]
    assert [r["shift_flag"] for r in got] == [
        False, False, True, True, False, False, True, True,
    ]


def test_cusum_flat_series_never_alarms(spark):
    """A constant series has zero deviations: the slack drives both
    prefix sums strictly down, the running min tracks them, and every
    CUSUM is exactly 0 — the no-noise sanity floor."""
    from edu_online_spark.operators.analytics import cusum_level_shift

    rows = []
    eid = 0
    for d in range(6):
        for _ in range(30):
            rows.append(
                (eid, datetime.datetime(2024, 5, 1 + d, 12, 0, 0))
            )
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz")
    got = cusum_level_shift(ev).collect()
    assert all(
        r["cusum_pos"] == 0 and r["cusum_neg"] == 0 and not r["shift_flag"]
        for r in got
    )


# -- events_ab_conversion_ztest -----------------------------------------------


def test_ab_conversion_ztest_matches_r17_oracle(spark, sf_dir):
    from edu_online_spark.operators.analytics import (
        ORACLE_R17,
        ab_conversion_ztest,
    )

    problems = compare(
        "events_ab_conversion_ztest",
        ab_conversion_ztest(load_table(spark, sf_dir, "events")),
        run_oracle(ORACLE_R17["events_ab_conversion_ztest"], sf_dir),
    )
    assert not problems, problems


def _z(n_a, conv_a, n_b, conv_b):
    """The pooled z in the operator's exact operand order."""
    p_a = conv_a / n_a
    p_b = conv_b / n_b
    p_pool = (conv_a + conv_b) / (n_a + n_b)
    var = (p_pool * (1.0 - p_pool)) * (1.0 / n_a + 1.0 / n_b)
    return (p_a - p_b) / math.sqrt(var)


def test_ab_conversion_ztest_fixture(spark):
    """Five users, hand-assigned: the 24h window converts a purchase
    12h after first-seen, rejects one 3 days later, and accepts a
    purchase AT the first event. A=(0,2,4): 2/3 converted;
    B=(1,3): 1/2 — z matches the same-order Python formula exactly
    and the null result is not significant."""
    from edu_online_spark.operators.analytics import ab_conversion_ztest

    t0 = datetime.datetime(2024, 5, 1, 0, 0, 0)
    h = datetime.timedelta(hours=1)
    rows = [
        # user 0 (A): converts 12h after first event
        (0, 0, "view", t0),
        (1, 0, "purchase", t0 + 12 * h),
        # user 2 (A): purchase 3 days later — OUTSIDE the window
        (2, 2, "view", t0),
        (3, 2, "purchase", t0 + 72 * h),
        # user 4 (A): converts at the first event itself
        (4, 4, "purchase", t0),
        # user 1 (B): converts
        (5, 1, "view", t0),
        (6, 1, "purchase", t0 + 2 * h),
        # user 3 (B): never purchases
        (7, 3, "click", t0),
        (8, 3, "click", t0 + 5 * h),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz"
    )
    r = ab_conversion_ztest(ev).first()
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (3, 2, 2, 1)
    assert r["z"] == _z(3, 2, 2, 1)
    assert r["significant"] is False


def test_ab_conversion_ztest_degenerate_is_null(spark):
    """All users converted → pooled variance 0 → z NULL, significant
    FALSE (not NULL — the verdict column is total on both engines)."""
    from edu_online_spark.operators.analytics import ab_conversion_ztest

    t0 = datetime.datetime(2024, 5, 1)
    ev = spark.createDataFrame(
        [(i, i, "purchase", t0) for i in range(4)],
        "event_id long, user_id long, event_type string, ts timestamp_ntz",
    )
    r = ab_conversion_ztest(ev).first()
    assert r["z"] is None
    assert r["significant"] is False


# -- corpus_token_heavy_hitters -----------------------------------------------


def test_token_heavy_hitters_matches_r17_oracle(spark, sf_dir):
    from edu_online_spark.operators.textops import (
        ORACLE_R17,
        token_heavy_hitters,
    )

    problems = compare(
        "corpus_token_heavy_hitters",
        token_heavy_hitters(load_table(spark, sf_dir, "documents")),
        run_oracle(ORACLE_R17["corpus_token_heavy_hitters"], sf_dir),
    )
    assert not problems, problems


def test_token_heavy_hitters_tiny_capacity_exact(spark):
    """capacity=3 on a Zipfish corpus whose vocabulary is much larger
    than the summary: the bounded Misra-Gries pass must still surface
    every token above the 1/3 share threshold with its EXACT count —
    and the answer must be identical however the input is partitioned
    (the candidate set may differ; the output may not)."""
    from collections import Counter

    from edu_online_spark.operators.textops import token_heavy_hitters

    words = (
        ["alpha"] * 40 + ["beta"] * 25
        + [f"tail{i}" for i in range(35)]
    )
    # 100 tokens: alpha 40%, beta 25%, 35 singletons; threshold n/3 = 33⅓
    docs = [(i, " ".join(words[i * 10:(i + 1) * 10])) for i in range(10)]
    exact = Counter(words)
    n = sum(exact.values())
    want = {
        t: c for t, c in exact.items() if c * 3 > n
    }
    for parts in (1, 3, 8):
        df = spark.createDataFrame(
            docs, "doc_id long, text string"
        ).repartition(parts)
        got = {
            r["token"]: r["cnt"]
            for r in token_heavy_hitters(df, capacity=3).collect()
        }
        assert got == want == {"alpha": 40}


# -- ann_label_ndcg -----------------------------------------------------------


def test_label_ndcg_matches_r17_oracle(spark, sf_dir):
    from edu_online_spark.operators.similarity import (
        ORACLE_R17,
        label_ndcg,
    )

    problems = compare(
        "ann_label_ndcg",
        label_ndcg(load_table(spark, sf_dir, "embeddings")),
        run_oracle(ORACLE_R17["ann_label_ndcg"], sf_dir),
    )
    assert not problems, problems


def test_label_ndcg_fixture(spark):
    """One query [1,0] (label 0) against four vectors with hand-known
    cosine order 1.0 > 1/√2 > 0.6 > 0: hits at ranks 1 and 3 give
    DCG = 1.0 + 0.5 (sorted fold), n_relevant=2 → IDCG is the 2-term
    prefix, and ndcg matches the same-order Python arithmetic."""
    from edu_online_spark.operators.similarity import (
        NDCG_DISCOUNTS,
        NDCG_IDCG,
        label_ndcg,
    )

    rows = [
        (0, [1.0, 0.0], 0),   # query
        (1, [1.0, 0.0], 0),   # cos 1.0, rank 1, HIT
        (2, [3.0, 4.0], 1),   # cos 0.6, rank 3
        (3, [1.0, 1.0], 0),   # cos 1/sqrt(2) ~= 0.707, rank 2, HIT
        (4, [0.0, 1.0], 1),   # cos 0.0, rank 4
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    r = label_ndcg(emb, n_queries=1).first()
    assert (r["qid"], r["q_label"], r["n_relevant"], r["n_hits"]) == (
        0, 0, 2, 2,
    )
    # hits at ranks 1 (cos 1.0) and 2 (cos 0.707): sorted ascending fold
    dcg = (0.0 + NDCG_DISCOUNTS[2]) + NDCG_DISCOUNTS[1]
    assert r["dcg"] == dcg
    assert r["idcg"] == NDCG_IDCG[2]
    assert r["ndcg"] == dcg / NDCG_IDCG[2]


def test_label_ndcg_no_relevant_is_null(spark):
    """A query whose label is unique in the corpus has n_relevant=0:
    IDCG 0.0, ndcg NULL — not a zero score for an impossible task."""
    from edu_online_spark.operators.similarity import label_ndcg

    rows = [
        (0, [1.0, 0.0], 7),
        (1, [1.0, 0.5], 1),
        (2, [0.0, 1.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    r = label_ndcg(emb, n_queries=1).first()
    assert (r["n_relevant"], r["n_hits"], r["dcg"], r["idcg"]) == (
        0, 0, 0.0, 0.0,
    )
    assert r["ndcg"] is None


def test_label_ndcg_k_beyond_module_default(spark):
    """ADVICE r13: the discount/IDCG tables must follow the CALL's k,
    not the module-level NDCG_K=10 — a hit at rank 12 under k=16 used
    to element_at-miss into a NULL dcg. Query label 0 has one relevant
    neighbor deliberately ranked 12th of 15 candidates."""
    import math

    from edu_online_spark.operators.similarity import label_ndcg

    rows = [(0, [1.0, 0.0], 0)]
    # 11 non-relevant neighbors ranked 1..11 (descending cosine),
    # then the single relevant one at rank 12, then 3 more below it
    for i in range(1, 15):
        cos_x = 1.0 - i * 0.05
        rows.append((i, [cos_x, math.sqrt(1 - cos_x * cos_x)],
                     0 if i == 12 else 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    r = label_ndcg(emb, k=16, n_queries=1).first()
    assert r["n_hits"] == 1
    expected = 1.0 / math.log2(13.0)
    assert r["dcg"] == expected, (r["dcg"], expected)
    # n_relevant=1 -> idcg is the 1-term prefix = 1.0
    assert r["ndcg"] == expected


# -- dedup_pair_transitivity --------------------------------------------------


def test_pair_transitivity_matches_r17_oracle(spark, sf_dir):
    from edu_online_spark.operators.dedup import (
        ORACLE_R17,
        pair_transitivity,
    )

    problems = compare(
        "dedup_pair_transitivity",
        pair_transitivity(load_table(spark, sf_dir, "documents")),
        run_oracle(ORACLE_R17["dedup_pair_transitivity"], sf_dir),
    )
    assert not problems, problems


def test_pair_transitivity_census_fixtures(spark):
    """Census arithmetic pinned on injected pair graphs: a chain has
    a wedge but no triangle (transitivity 0), a triangle closes it
    (1.0), a star is all wedges (0), a clique-plus-pendant lands in
    between, and an empty graph yields NULL (not 0 — there is no
    wedge to be closed or open)."""
    from edu_online_spark.operators.dedup import pair_transitivity

    docs = spark.createDataFrame(
        [(i, "x") for i in range(6)], "doc_id long, text string"
    )

    def census(edges):
        pairs = spark.createDataFrame(
            edges or [(0, 0)], "doc_a long, doc_b long"
        )
        if not edges:
            pairs = pairs.filter(F.col("doc_a") != 0)
        r = pair_transitivity(docs, pairs=pairs).first()
        return (
            r["n_edges"], r["n_wedges"], r["n_triangles"], r["transitivity"]
        )

    assert census([(1, 2), (2, 3)]) == (2, 1, 0, 0.0)
    assert census([(1, 2), (1, 3), (2, 3)]) == (3, 3, 1, 1.0)
    assert census([(1, 2), (1, 3), (1, 4)]) == (3, 3, 0, 0.0)
    # ADVICE r13: an unoriented, duplicated, self-looped edge list
    # must canonicalize to the same triangle census, not inflate it
    assert census(
        [(2, 1), (1, 2), (3, 1), (2, 3), (3, 2), (1, 1)]
    ) == (3, 3, 1, 1.0)
    # triangle {1,2,3} + pendant 4 off vertex 1: wedges 3 + C(3,2)=3
    # at v1... degrees: 1->3, 2->2, 3->2, 4->1 => wedges 3+1+1 = 5
    assert census([(1, 2), (1, 3), (2, 3), (1, 4)]) == (
        4, 5, 1, 3.0 * 1 / 5,
    )
    assert census([]) == (0, 0, 0, None)


# -- text_lang_kappa ----------------------------------------------------------


def test_lang_kappa_matches_r17_oracle(spark, sf_dir):
    from edu_online_spark.operators.textops import ORACLE_R17, lang_kappa

    problems = compare(
        "text_lang_kappa",
        lang_kappa(load_table(spark, sf_dir, "documents")),
        run_oracle(ORACLE_R17["text_lang_kappa"], sf_dir),
    )
    assert not problems, problems


def test_lang_kappa_fixture(spark):
    """Hand-built confusion: 6 docs, 4 agreements (3 en, 1 es), one
    fr-gold misread as en, one en-gold with no markers ('und').
    Marginals share only {en, es}: pe = (4/6)(4/6) + (1/6)(1/6),
    po = 4/6, kappa = 7/19 — matched against the same-order Python
    doubles."""
    from edu_online_spark.operators.textops import lang_kappa

    rows = [
        (0, "the cat and the dog is here", "en"),
        (1, "to the park of note", "en"),
        (2, "is of and the to", "en"),
        (3, "el que la cosa de", "es"),
        (4, "the of to violà", "fr"),   # en markers, fr gold
        (5, "zzz qqq www", "en"),       # no markers -> 'und'
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = lang_kappa(docs).first()
    assert (r["n_docs"], r["n_agree"]) == (6, 4)
    po = 4 / 6
    products = sorted([(4 / 6) * (4 / 6), (1 / 6) * (1 / 6)])
    pe = (0.0 + products[0]) + products[1]
    assert r["po"] == po
    assert r["pe"] == pe
    assert r["kappa"] == (po - pe) / (1.0 - pe)


def test_lang_kappa_perfect_agreement_is_degenerate(spark):
    """All docs one language, all predicted the same: po = 1 but
    pe = 1 too — kappa is NULL (chance explains everything), not 1."""
    from edu_online_spark.operators.textops import lang_kappa

    docs = spark.createDataFrame(
        [(i, "the and of is to", "en") for i in range(4)],
        "doc_id long, text string, lang string",
    )
    r = lang_kappa(docs).first()
    assert (r["po"], r["pe"], r["kappa"]) == (1.0, 1.0, None)


# -- events_l_diversity -------------------------------------------------------


def test_l_diversity_matches_r17_oracle(spark, sf_dir):
    from edu_online_spark.operators.pii import ORACLE_R17, _q_events_ldiv

    problems = compare(
        "events_l_diversity",
        _q_events_ldiv(spark, sf_dir),
        run_oracle(ORACLE_R17["events_l_diversity"], sf_dir),
    )
    assert not problems, problems


def test_l_diversity_flags_homogeneous_class(spark):
    """The attribute-disclosure case k-anonymity waves through: a
    6-member class (comfortably k>=5-anonymous) whose members all
    share ONE sensitive value is 1-diverse and violates l=3, while a
    3-member class spanning 3 values passes."""
    from edu_online_spark.operators.pii import l_diversity_report

    rows = (
        # class (click, d1): 6 rows, ONE user -> diversity 1
        [("click", "d1", 7)] * 6
        # class (view, d1): 3 rows, 3 users -> diversity 3
        + [("view", "d1", 1), ("view", "d1", 2), ("view", "d1", 3)]
        # class (error, d2): 2 rows, 2 users -> diversity 2, violates
        + [("error", "d2", 4), ("error", "d2", 5)]
    )
    df = spark.createDataFrame(
        rows, "event_type string, day string, user_id long"
    )
    got = {
        r["n_distinct_sensitive"]: (r["n_classes"], r["violates_l"])
        for r in l_diversity_report(
            df, ["event_type", "day"], "user_id"
        ).collect()
    }
    assert got == {1: (1, True), 2: (1, True), 3: (1, False)}


# -- docs_quality_spearman ----------------------------------------------------


def test_quality_spearman_matches_r17_oracle(spark, sf_dir):
    from edu_online_spark.operators.textops import (
        ORACLE_R17,
        quality_length_spearman,
    )

    problems = compare(
        "docs_quality_spearman",
        quality_length_spearman(load_table(spark, sf_dir, "documents")),
        run_oracle(ORACLE_R17["docs_quality_spearman"], sf_dir),
    )
    assert not problems, problems


def test_quality_spearman_perfect_anticorrelation(spark):
    """Texts built so quality rank exactly reverses length rank:
    stop-word share falls as padding grows. Reverse permutation has
    sum d^2 = n(n^2-1)/3, so rho = -1.0 exactly (the 6x/denominator
    division is exact here). And a monotone set gives +1.0 with
    sum_d2 = 0."""
    from edu_online_spark.operators.textops import quality_length_spearman

    down = [
        (1, "the"),
        (2, "the xx yy"),
        (3, "the xx yy zz ww"),
        (4, "the xx yy zz ww vv uu"),
    ]
    r = quality_length_spearman(
        spark.createDataFrame(down, "doc_id long, text string")
    ).first()
    assert (r["n_docs"], r["sum_d2"], r["rho"]) == (4, 20.0, -1.0)

    up = [(i, " ".join(["the"] * i)) for i in range(1, 5)]
    r = quality_length_spearman(
        spark.createDataFrame(up, "doc_id long, text string")
    ).first()
    # equal quality scores (all 1.0): doc_id tie-break makes r_q the
    # id order, which matches the length order -> rho exactly 1.0
    assert (r["sum_d2"], r["rho"]) == (0.0, 1.0)


def test_quality_spearman_single_doc_is_null(spark):
    from edu_online_spark.operators.textops import quality_length_spearman

    r = quality_length_spearman(
        spark.createDataFrame([(1, "the xx")], "doc_id long, text string")
    ).first()
    assert (r["n_docs"], r["sum_d2"], r["rho"]) == (1, 0.0, None)


def test_quality_spearman_guard_refuses_corpus_sized_input(spark):
    """VERDICT r13 #5: the exact op's two total-order rank windows put
    every row through one task, so it must refuse past the cap and
    name the banded scale path — same contract as _guard_all_pairs."""
    import pytest

    from edu_online_spark.operators.textops import quality_length_spearman

    big = spark.range(11).select(
        F.col("id").alias("doc_id"), F.lit("the xx").alias("text")
    )
    with pytest.raises(ValueError, match="quality_length_spearman_banded"):
        quality_length_spearman(big, max_rows=10)


def test_quality_spearman_guard_counts_rankable_rows_only(spark):
    """ADVICE r14 #2: the guard must measure the filtered relation the
    rank windows actually consume — empty/zero-token docs never reach
    the windows, so they must not count against the cap."""
    from edu_online_spark.operators.textops import quality_length_spearman

    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        # only 6 docs carry rankable text; the rest are empty
        F.when(F.col("id") < 6, F.concat(F.lit("the word "), F.col("id")))
        .otherwise(F.lit(""))
        .alias("text"),
    )
    r = quality_length_spearman(docs, max_rows=10).first()
    assert r["n_docs"] == 6


def test_quality_spearman_banded_surfaces_length_concentration(spark):
    """ADVICE r14 #3: max_band_share must cover BOTH histograms. A
    corpus whose lengths are near-identical (one length band holds
    everything) but whose quality scores spread across bands must
    still report max_band_share ≈ 1."""
    from edu_online_spark.operators.textops import (
        quality_length_spearman_banded,
    )

    # identical length (pad to a fixed width), varying stopword ratio
    # → quality bands spread, length bands collapse to one
    docs = spark.createDataFrame(
        [
            (1, "the and for are but xx"),
            (2, "the and for xx yy zz w"),
            (3, "the and xx yy zz ww vv"),
            (4, "the xx yy zz ww vv uu "),
            (5, "xx yy zz ww vv uu tt s"),
        ],
        "doc_id long, text string",
    )
    r = quality_length_spearman_banded(docs).first()
    assert r["max_band_share"] == 1.0, r


def test_quality_spearman_banded_tracks_exact(spark, sf_dir):
    """The banded estimate's documented envelope: within 0.05 of the
    exact permutation-rank rho on a spread-out corpus, with
    max_band_share confirming no band dominates."""
    from edu_online_spark.operators.textops import (
        quality_length_spearman,
        quality_length_spearman_banded,
    )

    docs = load_table(spark, sf_dir, "documents")
    exact = quality_length_spearman(docs).first()
    banded = quality_length_spearman_banded(docs).first()
    assert banded["n_docs"] == exact["n_docs"]
    assert abs(banded["rho_banded"] - exact["rho"]) <= 0.05, (
        banded["rho_banded"],
        exact["rho"],
        banded["max_band_share"],
    )


def test_quality_spearman_banded_monotone_and_degenerate(spark):
    """Planted monotone anti-correlation recovers rho ~ -1; a
    constant-score corpus collapses into one band, which the report
    makes VISIBLE (max_band_share = 1.0) and scores NULL (zero rank
    variance) instead of silently degrading."""
    from edu_online_spark.operators.textops import (
        quality_length_spearman_banded,
    )

    down = [
        (1, "the"),
        (2, "the xx yy"),
        (3, "the xx yy zz ww"),
        (4, "the xx yy zz ww vv uu"),
    ]
    r = quality_length_spearman_banded(
        spark.createDataFrame(down, "doc_id long, text string")
    ).first()
    assert r["n_docs"] == 4 and r["rho_banded"] <= -0.99

    const = [(i, "the xx") for i in range(1, 6)]
    r = quality_length_spearman_banded(
        spark.createDataFrame(const, "doc_id long, text string")
    ).first()
    assert r["max_band_share"] == 1.0 and r["rho_banded"] is None



def test_token_heavy_hitters_hot_key_stress(spark):
    """One pathological document repeating a single token 100k times
    (the bot/boilerplate hot-key case): the Arrow-batched value_counts
    pre-aggregation absorbs it, the summary stays bounded, and the
    output is still the exact heavy-hitter set."""
    from edu_online_spark.operators.textops import token_heavy_hitters

    docs = [(0, " ".join(["hot"] * 100_000))] + [
        (i, f"tail{i} filler{i}") for i in range(1, 200)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(6)
    got = {r["token"]: r["cnt"] for r in token_heavy_hitters(df, capacity=10).collect()}
    assert got == {"hot": 100_000}


def test_pair_transitivity_star_hub_stress(spark):
    """A 200-spoke star (the drifting-revision hub): C(200,2)=19,900
    wedges, zero triangles, transitivity exactly 0 — the wedge join
    keyed on the hub stays a keyed equi-join, never a cartesian."""
    from edu_online_spark.operators.dedup import pair_transitivity

    docs = spark.createDataFrame(
        [(i, "x") for i in range(201)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 201)], "doc_a long, doc_b long"
    )
    r = pair_transitivity(docs, pairs=pairs).first()
    assert (r["n_edges"], r["n_wedges"], r["n_triangles"], r["transitivity"]) == (
        200, 19_900, 0, 0.0,
    )
