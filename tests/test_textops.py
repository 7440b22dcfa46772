"""Text-pipeline edge cases the sf corpora don't cover: chunk
boundaries and contamination determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from edu_online_spark.operators.textops import CHUNK_STRIDE, CHUNK_TOKENS, chunk_documents


def _chunks(spark, text, chunk_tokens=CHUNK_TOKENS, stride=CHUNK_STRIDE):
    df = spark.createDataFrame([(1, text, "src1")], ["doc_id", "text", "source"])
    rows = sorted(
        chunk_documents(df, chunk_tokens, stride).collect(),
        key=lambda r: r["chunk_idx"],
    )
    return [(r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"]) for r in rows]


def test_chunking_short_doc_single_chunk(spark):
    assert _chunks(spark, "just five little words here") == [
        (0, 5, "just five little words here")
    ]


def test_chunking_exact_boundary_no_empty_tail(spark):
    """A doc of exactly chunk_tokens words must yield ONE chunk — a
    start offset at n_tokens would be an empty chunk."""
    text = " ".join(f"w{i}" for i in range(CHUNK_TOKENS))
    out = _chunks(spark, text)
    assert len(out) == 1 and out[0][1] == CHUNK_TOKENS


def test_chunking_overlap_and_coverage(spark):
    """chunk_tokens+1 words → two chunks; the second starts at the
    stride and covers the tail; every token appears in some chunk."""
    n = CHUNK_TOKENS + 1
    words = [f"w{i}" for i in range(n)]
    out = _chunks(spark, " ".join(words))
    assert [c[0] for c in out] == [0, 1]
    assert out[0][1] == CHUNK_TOKENS
    assert out[1][1] == n - CHUNK_STRIDE  # tail chunk, shorter
    covered = set()
    for _, _, text in out:
        covered.update(text.split(" "))
    assert covered == set(words)


def test_chunking_single_token(spark):
    assert _chunks(spark, "solo") == [(0, 1, "solo")]


def test_ewma_matches_hand_computation(spark):
    """The applyInPandas recurrence replays per-user purchases in
    (ts, event_id) order: s_t = 0.3 x_t + 0.7 s_{t-1}."""
    from edu_online_spark.operators.analytics import user_value_ewma

    rows = [
        (1, "2026-08-13 10:00:00", 1, "purchase", 10.0),
        (1, "2026-08-13 10:01:00", 2, "purchase", 20.0),
        (1, "2026-08-13 10:02:00", 3, "purchase", 30.0),
        (1, "2026-08-13 10:03:00", 4, "view", 99.0),  # ignored
        (2, "2026-08-13 10:00:00", 5, "purchase", 5.0),
    ]
    events = spark.createDataFrame(
        [(e, __import__("datetime").datetime.fromisoformat(t), u, k, v)
         for (u, t, e, k, v) in rows],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )
    out = {r["user_id"]: r for r in user_value_ewma(events).collect()}
    # u1: s=10 -> .3*20+.7*10=13 -> .3*30+.7*13=18.1
    assert out[1]["n_purchases"] == 3
    assert abs(out[1]["ewma_value"] - 18.1) < 1e-12
    assert out[2]["ewma_value"] == 5.0 and out[2]["n_purchases"] == 1


def test_approx_quantiles_close_to_exact(spark, sf_dir):
    """GK sketch estimates stay within 5% of the exact percentiles —
    the accuracy pin for the rows-only approx variant."""
    from edu_online_spark.operators.analytics import (
        price_quantiles,
        price_quantiles_approx,
    )
    from edu_online_spark.sources import load_table

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    exact = {r["l_returnflag"]: r for r in price_quantiles(li).collect()}
    approx = {r["l_returnflag"]: r for r in price_quantiles_approx(li).collect()}
    assert set(exact) == set(approx)
    for flag, e in exact.items():
        for p in ("p25", "p50", "p90", "p99"):
            assert abs(approx[flag][p] - e[p]) / e[p] < 0.05


def test_anomaly_gate_requires_consecutive_week(spark):
    """After an ingest gap the 7 prior ROWS are stale — the day
    resuming after the gap must report NULL trailing average and never
    flag, even though 7 older rows exist."""
    import datetime as dt

    from edu_online_spark.operators.analytics import daily_anomaly_flags

    rows = []
    eid = 0
    # days 1-8 consecutive, then a 90-day gap, then one huge day
    for d in list(range(1, 9)) + [99]:
        day = dt.datetime(2026, 1, 1) + dt.timedelta(days=d)
        n = 1000 if d == 99 else 10
        for _ in range(n):
            rows.append((eid, day, 1, "view", 1.0, "{}"))
            eid += 1
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out = {str(r["day"]): r for r in daily_anomaly_flags(events).collect()}
    # day 8 has a full consecutive week behind it → gated normally
    assert out["2026-01-09"]["trailing_avg"] == 10.0
    # the post-gap day has 7 stale rows but no consecutive week → NULL, no flag
    post_gap = out["2026-04-10"]
    assert post_gap["trailing_avg"] is None and post_gap["is_anomaly"] is False


def test_normalize_documents_strips_controls_and_collapses_ws(spark):
    from edu_online_spark.operators.textops import normalize_documents

    docs = spark.createDataFrame(
        [
            (1, "  hello\tworld\x00\x07 again  "),
            (2, "already clean"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in normalize_documents(docs).collect()}
    assert out[1]["text_norm"] == "hello world again"
    assert out[1]["changed"] is True
    assert out[1]["n_chars_saved"] == len("  hello\tworld\x00\x07 again  ") - len(
        "hello world again"
    )
    assert out[2]["text_norm"] == "already clean"
    assert out[2]["changed"] is False
    assert out[2]["n_chars_saved"] == 0


def test_pack_training_sequences_budget_and_coverage(spark):
    """Packing must cover every chunk exactly once, keep packs within
    budget + one chunk tail, and be deterministic."""
    from edu_online_spark.operators.textops import (
        chunk_documents,
        pack_training_sequences,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(40 + 7 * i)), "s1") for i in range(6)],
        ["doc_id", "text", "source"],
    )
    budget = 64
    packs = pack_training_sequences(docs, budget=budget).collect()
    total_chunks = chunk_documents(docs).count()
    assert sum(r["n_chunks"] for r in packs) == total_chunks
    # start-offset assignment: a pack holds every chunk STARTING inside
    # its budget window, so it can overrun by at most one chunk's tail
    from edu_online_spark.operators.textops import CHUNK_TOKENS

    for r in packs:
        assert r["pack_tokens"] < budget + CHUNK_TOKENS
    # deterministic: second run identical
    again = pack_training_sequences(docs, budget=budget).collect()
    assert sorted(map(tuple, packs)) == sorted(map(tuple, again))


def test_corpus_mixture_plan_unknown_source_excluded(spark):
    from edu_online_spark.operators.textops import corpus_mixture_plan

    docs = spark.createDataFrame(
        [
            (1, "a b c d e", "src0"),
            (2, "a b c", "mystery"),
        ],
        ["doc_id", "text", "source"],
    )
    rows = {r["source"]: r for r in corpus_mixture_plan(docs, token_budget=4).collect()}
    assert rows["mystery"]["weight"] == 0
    assert rows["mystery"]["sample_rate"] == 0.0
    assert rows["src0"]["weight"] == 4
    # budget 4 of weight-share 4/8 → target 2 tokens over 5 available
    assert abs(rows["src0"]["sample_rate"] - 2 / 5) < 1e-12


def test_lm_perplexity_orders_in_distribution_before_gibberish(spark):
    """The bigram LM must assign lower average NLL to text made of the
    corpus's common bigrams than to never-seen token sequences, and
    smoothing must keep unseen bigrams finite."""
    from edu_online_spark.operators.textops import lm_perplexity_scores

    common = "the quick brown fox jumps over the lazy dog"
    # enough copies that some land in the xxhash64 training half
    rows = [(i, common) for i in range(40)]
    rows.append((1000, common))                        # in-distribution probe
    rows.append((1001, "zyx wvu tsr qpo nml kji hgf"))  # all-unseen probe
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in lm_perplexity_scores(docs).collect()}
    assert out[1000]["avg_nll"] < out[1001]["avg_nll"]
    import math

    assert math.isfinite(out[1001]["avg_nll"])  # add-k floor, no -inf
    assert out[1000]["n_bigrams"] == 8


# ---------------------------------------------------------------------------
# Gopher-style rule gate, stratified sampling, snapshot diff,
# compression-ratio quality signal (round-4 additions)
# ---------------------------------------------------------------------------

def _gopher(spark, rows):
    from edu_online_spark.operators.textops import gopher_quality_rules

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict() for r in gopher_quality_rules(df).collect()}


def test_gopher_rules_fire_individually(spark):
    good = "the quick brown gazelle jumped over a lazy hound " * 4  # 36 words
    out = _gopher(
        spark,
        [
            (1, good),
            (2, "the short doc is it"),  # 5 words -> word_count
            (3, ("the spark " + "spark " * 30).strip()),  # repetition
            (
                4,
                # 24 distinct long-ish words, zero stopwords -> only the
                # stopword rule fires
                "quick brown gazelle jumped beside lazy hounds while "
                "seven violet cranes circled above frozen rivers carrying "
                "silver branches toward distant mountain ridges during "
                "early winter storms",
            ),
        ],
    )
    assert out[1]["keep"] and out[1]["drop_reason"] is None
    assert not out[2]["keep"] and out[2]["drop_reason"] == "word_count"
    assert not out[3]["keep"] and out[3]["drop_reason"] == "repetition"
    assert not out[4]["keep"] and out[4]["drop_reason"] == "stopwords"


def test_gopher_drop_reason_precedence(spark):
    # fails word_count AND stopwords -> reports the first rule in order
    out = _gopher(spark, [(1, "quick brown gazelle")])
    assert out[1]["drop_reason"] == "word_count"
    assert not out[1]["pass_word_count"] and not out[1]["pass_stopwords"]


def test_stratified_sample_exact_size_and_determinism(spark, sf_dir):
    from edu_online_spark.operators.textops import (
        STRATIFIED_PER_STRATUM,
        stratified_sample,
    )
    from edu_online_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    per_source = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()
    }
    sample = stratified_sample(docs)
    got = {
        r["source"]: r["n"]
        for r in sample.groupBy("source").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()
    }
    assert got == {
        s: min(STRATIFIED_PER_STRATUM, n) for s, n in per_source.items()
    }
    # partitioning-invariance: the same docs are chosen after a reshuffle
    a = {(r["source"], r["doc_id"]) for r in sample.collect()}
    b = {
        (r["source"], r["doc_id"])
        for r in stratified_sample(docs.repartition(13)).collect()
    }
    assert a == b


def test_snapshot_diff_all_statuses(spark):
    from pyspark.sql import functions as F

    from edu_online_spark.operators.textops import corpus_snapshot_diff

    # doc_ids engineered so every verdict occurs:
    #   3  -> only in new (3 % 7 == 3 drops it from old)       -> added
    #   5  -> only in old (5 % 11 == 5 drops it from new)      -> removed
    #   15 -> both, text revised in new (15 % 5 == 0)          -> changed
    #   1  -> both, untouched                                  -> unchanged
    docs = spark.createDataFrame(
        [(1, "alpha"), (3, "bravo"), (5, "charlie"), (15, "delta")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["status"] for r in corpus_snapshot_diff(docs).collect()}
    assert got == {1: "unchanged", 3: "added", 5: "removed", 15: "changed"}


def test_compression_ratio_orders_repetitive_below_diverse(spark):
    import random

    from edu_online_spark.operators.textops import compression_ratio_scores

    rng = random.Random(7)
    diverse = " ".join(
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(8))
        for _ in range(60)
    )
    repetitive = "spark shuffle " * 60
    df = spark.createDataFrame(
        [(1, repetitive), (2, diverse)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["comp_ratio"] for r in compression_ratio_scores(df).collect()}
    assert out[1] < 0.25 < out[2]
    # deterministic: same input -> bit-identical score on re-run
    again = {
        r["doc_id"]: r["comp_ratio"] for r in compression_ratio_scores(df).collect()
    }
    assert out == again


def test_purchase_training_examples_strictly_prior(spark):
    """Point-in-time correctness: features for a purchase count ONLY
    events strictly before it in (ts, event_id) order — the purchase
    itself, same-instant later-id events, and anything after must not
    leak in."""
    import datetime as dt

    from edu_online_spark.operators.sessions import purchase_training_examples

    t = lambda s: dt.datetime.fromisoformat(f"2026-08-13 10:0{s}:00")
    rows = [
        (1, t(0), 7, "view", 0.0),
        (2, t(1), 7, "purchase", 10.0),   # prior: 1 view
        (3, t(2), 7, "error", 0.0),
        (4, t(3), 7, "purchase", 20.0),   # prior: 1 view, 1 purchase(10), 1 error
        (5, t(3), 7, "view", 0.0),        # same instant as id 4, higher id -> NOT prior
        (6, t(4), 8, "purchase", 5.0),    # other user: empty history
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    out = {r["event_id"]: r for r in purchase_training_examples(events).collect()}
    assert set(out) == {2, 4, 6}
    assert (out[2]["n_prior_views"], out[2]["n_prior_purchases"]) == (1, 0)
    assert out[2]["prior_purchase_value"] == 0.0
    assert out[2]["secs_since_prev_event"] == 60.0
    assert (out[4]["n_prior_views"], out[4]["n_prior_purchases"]) == (1, 1)
    assert out[4]["prior_purchase_value"] == 10.0
    assert out[4]["n_prior_errors"] == 1
    assert (out[6]["n_prior_views"], out[6]["n_prior_purchases"]) == (0, 0)
    assert out[6]["secs_since_prev_event"] is None
    assert out[6]["label_value"] == 5.0


def test_quality_calibrated_per_source(spark):
    """Calibration is per-source: deciles rank within each source, the
    min/max docs normalize to 0/1, and a single-doc source yields NULL
    minmax_norm (0/0 guard) rather than a misleading constant."""
    from edu_online_spark.operators.textops import quality_calibrated

    docs = spark.createDataFrame(
        [
            # srcA: stopword share orders quality low -> high
            (1, "gazelle cranes rivers branches", "srcA"),
            (2, "the gazelle cranes rivers branches", "srcA"),
            (3, "the a of gazelle cranes rivers", "srcA"),
            (4, "anything at all", "srcB"),  # singleton source
        ],
        ["doc_id", "text", "source"],
    )
    out = {r["doc_id"]: r for r in quality_calibrated(docs).collect()}
    a = sorted((out[i]["quality_score"], i) for i in (1, 2, 3))
    assert [i for _, i in a] == [1, 2, 3]  # scores strictly increase
    assert [out[i]["decile"] for i in (1, 2, 3)] == [1, 2, 3]
    assert out[1]["minmax_norm"] == 0.0
    assert out[3]["minmax_norm"] == 1.0
    assert 0.0 < out[2]["minmax_norm"] < 1.0
    assert out[4]["minmax_norm"] is None and out[4]["decile"] == 1


def test_dataset_card_dup_rate_and_dominant_lang(spark):
    """The card's duplicate rate counts identical content, the dominant
    language is the deterministic (cnt desc, lang asc) winner, and
    pass-rate/medians aggregate per source."""
    from edu_online_spark.operators.textops import corpus_dataset_card

    good = "the quick brown gazelle jumped over a lazy hound " * 4
    docs = spark.createDataFrame(
        [
            (1, good, "en", "sA"),
            (2, good, "en", "sA"),          # exact dup of 1
            (3, good + "tail", "de", "sA"),  # tie-break: en vs de 2-1
            (4, "tiny doc here", "fr", "sB"),
        ],
        ["doc_id", "text", "lang", "source"],
    )
    out = {r["source"]: r for r in corpus_dataset_card(docs).collect()}
    a = out["sA"]
    assert a["n_docs"] == 3 and a["n_langs"] == 2 and a["top_lang"] == "en"
    assert abs(a["exact_dup_rate"] - (1 - 2 / 3)) < 1e-15
    assert a["word_count_pass_rate"] == 1.0
    b = out["sB"]
    assert b["n_docs"] == 1 and b["top_lang"] == "fr"
    assert b["exact_dup_rate"] == 0.0
    assert b["word_count_pass_rate"] == 0.0  # 3 words < GOPHER_MIN_WORDS


def test_drift_report_shares_and_chi2(spark):
    """Per-bin shares sum to 1 on each side, the chi-square term is
    NULL exactly on reference-empty bins, and a planted length shift
    produces nonzero drift."""
    from edu_online_spark.operators.textops import corpus_drift_report

    # ids chosen so old = {1, 2, 5, 15}, new = {1, 2, 3, 15(rev)}:
    # doc 3 (30 tokens) enters only the new snapshot; 15 gains a token
    docs = spark.createDataFrame(
        [
            (1, " ".join(["w"] * 5)),
            (2, " ".join(["w"] * 12)),
            (3, " ".join(["w"] * 30)),
            (5, " ".join(["w"] * 7)),
            (15, " ".join(["w"] * 9)),
        ],
        ["doc_id", "text"],
    )
    rows = {r["bin"]: r for r in corpus_drift_report(docs).collect()}
    assert abs(sum(r["p_old"] for r in rows.values()) - 1.0) < 1e-12
    assert abs(sum(r["p_new"] for r in rows.values()) - 1.0) < 1e-12
    # bin 3 (30-39 tokens) exists only in the new snapshot
    assert rows[3]["n_old"] == 0 and rows[3]["chi2_term"] is None
    # bin 0 lost a doc (5 left, 15 moved to bin 1): nonzero drift term
    assert rows[0]["chi2_term"] > 0
    assert rows[1]["n_new"] == 2  # doc 2 plus the revision-grown doc 15


def test_association_rules_metrics(spark):
    """Hand-checked support/confidence/lift on a 4-basket fixture;
    directional rules differ in confidence but share lift."""
    from edu_online_spark.operators.analytics import basket_association_rules

    baskets = {1: [10, 20], 2: [10, 20], 3: [10, 20, 30], 4: [10]}
    li = spark.createDataFrame(
        [(o, p) for o, ps in baskets.items() for p in ps],
        ["l_orderkey", "l_partkey"],
    )
    rules = {
        (r["antecedent"], r["consequent"]): r
        for r in basket_association_rules(li, min_orders=3).collect()
    }
    # only 10<->20 co-occur >= 3 times
    assert set(rules) == {(10, 20), (20, 10)}
    r = rules[(10, 20)]
    assert (r["n_both"], r["n_ante"], r["n_cons"]) == (3, 4, 3)
    assert r["support"] == 3 / 4
    assert r["confidence"] == 3 / 4          # p(20 | 10)
    assert rules[(20, 10)]["confidence"] == 1.0  # p(10 | 20)
    assert r["lift"] == rules[(20, 10)]["lift"] == (3 * 4) / (4 * 3)


def test_winsorize_clips_to_type_band(spark):
    """Values clip to their own event type's [p1, p99]; in-band rows
    pass through unclipped."""
    import datetime as dt

    from edu_online_spark.operators.analytics import value_winsorized

    base = dt.datetime(2026, 8, 13)
    rows = [(i, base, 1, "view", float(v)) for i, v in enumerate(range(100))]
    rows.append((1000, base, 1, "view", 1e9))       # extreme high
    rows.append((1001, base, 1, "purchase", 5.0))   # other type untouched
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    out = {r["event_id"]: r for r in value_winsorized(events).collect()}
    assert out[1000]["was_clipped"] and out[1000]["value_winsorized"] < 1e9
    assert not out[50]["was_clipped"]
    assert out[50]["value_winsorized"] == 50.0
    assert not out[1001]["was_clipped"]  # singleton type: p1 == p99 == value


def test_purchase_status_asof_prior_state(spark):
    """The as-of state is the latest strictly-prior non-purchase event;
    purchases never self-tag, and a first-event purchase has NULL state."""
    import datetime as dt

    from edu_online_spark.operators.sessions import purchase_status_asof

    t = lambda m: dt.datetime(2026, 8, 13, 10, m)
    rows = [
        (1, t(0), 7, "signup", 0.0),
        (2, t(1), 7, "purchase", 10.0),  # as-of: signup
        (3, t(2), 7, "error", 0.0),
        (4, t(3), 7, "purchase", 20.0),  # as-of: error (latest prior)
        (5, t(0), 8, "purchase", 5.0),   # no prior state
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    out = {r["event_id"]: r for r in purchase_status_asof(events).collect()}
    assert out[2]["status_asof"] == "signup" and out[2]["status_since"] == t(0)
    assert out[4]["status_asof"] == "error" and out[4]["status_since"] == t(2)
    assert out[5]["status_asof"] is None and out[5]["status_since"] is None


def test_daily_trend_fits_exact_line(spark):
    """A perfectly linear daily series recovers its slope and intercept
    exactly (closed-form OLS on integers); a single-day type yields
    NULL fit rather than a degenerate one."""
    import datetime as dt

    from edu_online_spark.operators.analytics import daily_trend_fit

    rows, eid = [], 0
    for d in range(5):  # y = 10 + 3x views per day
        day = dt.datetime(2026, 1, 1) + dt.timedelta(days=d)
        for _ in range(10 + 3 * d):
            rows.append((eid, day, 1, "view", 1.0))
            eid += 1
    rows.append((eid, dt.datetime(2026, 1, 1), 1, "signup", 1.0))
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    out = {r["event_type"]: r for r in daily_trend_fit(events).collect()}
    assert out["view"]["slope_per_day"] == 3.0
    assert out["view"]["intercept"] == 10.0
    assert out["signup"]["slope_per_day"] is None
    assert out["signup"]["intercept"] is None


def test_type_transitions_probabilities(spark):
    """Transition probabilities row-normalize per from_type; streams
    don't leak across users."""
    import datetime as dt

    from edu_online_spark.operators.analytics import event_type_transitions

    t = lambda m: dt.datetime(2026, 8, 13, 10, m)
    rows = [
        (1, t(0), 7, "view", 0.0),
        (2, t(1), 7, "view", 0.0),
        (3, t(2), 7, "purchase", 0.0),
        (4, t(0), 8, "view", 0.0),
        (5, t(1), 8, "error", 0.0),
    ]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in event_type_transitions(events).collect()
    }
    # from 'view': view->view 1, view->purchase 1, view->error 1 (u8)
    assert got[("view", "view")] == (1, 1 / 3)
    assert got[("view", "purchase")] == (1, 1 / 3)
    assert got[("view", "error")] == (1, 1 / 3)
    # no cross-user pair (u7's last 'purchase' -> u8's first 'view')
    assert ("purchase", "view") not in got


def test_record_linkage_blocks_and_matches(spark):
    """Linkage finds the canonical row for each dirtied record, never
    crosses a block (nation) boundary, and reports is_correct
    truthfully — checked on a fixture where customer 0's nearest
    similar-name rival lives in ANOTHER nation and an in-nation
    stranger is dissimilar."""
    from edu_online_spark.operators.analytics import customer_record_linkage

    rows = [
        (0, "Customer#000000000", 1, 1863.84, "BUILDING"),
        # similar name, same balance, different nation -> blocked out
        (7, "Customer#000000100", 2, 1863.84, "BUILDING"),
        # same nation, very different record -> low dice
        (2, "Zzgh#999", 1, 11.11, "AUTO"),
        (3, "Customer#000000003", 1, 2547.40, "MACHINERY"),  # dirty twin too
    ]
    cust = spark.createDataFrame(
        rows, ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    )
    out = {r["true_key"]: r for r in customer_record_linkage(cust).collect()}
    assert set(out) == {0, 3}  # custkey % 3 == 0 get dirty twins
    assert out[0]["matched_key"] == 0 and out[0]["is_correct"]
    assert out[3]["matched_key"] == 3 and out[3]["is_correct"]
    assert out[0]["dice"] > 0.8


def test_seasonal_residuals_dow_baseline_and_mad_outlier(spark):
    """Each Monday compares against the Monday mean, not the global
    one; a single spiked Monday is flagged while ordinary variation is
    not (3-MAD rule)."""
    import datetime as dt

    from edu_online_spark.operators.analytics import seasonal_residuals

    rows, eid = [], 0
    # 6 weeks: Mondays get 20 events, other days 10; the last Monday 60
    start = dt.datetime(2026, 1, 5)  # a Monday
    for d in range(42):
        day = start + dt.timedelta(days=d)
        base = 20 if day.weekday() == 0 else 10
        if d == 35:  # final Monday spikes
            base = 60
        for _ in range(base):
            rows.append((eid, day, 1, "view", 1.0))
            eid += 1
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    out = {str(r["day"]): r for r in seasonal_residuals(events).collect()}
    spike = out["2026-02-09"]
    assert spike["is_outlier"] and spike["residual"] > 30
    # an ordinary Monday sits on its own (median) baseline
    normal_monday = out["2026-01-12"]
    assert not normal_monday["is_outlier"]
    # the spiked week does NOT drag the Monday baseline: median holds
    assert normal_monday["dow_baseline"] == 20
    assert not out["2026-01-13"]["is_outlier"]  # plain Tuesday


def test_feature_hashing_is_deterministic_and_signed(spark):
    """The hashing trick: same text → identical sparse vector under any
    partitioning; a repeated token adds ±1 consistently (|v| equals its
    count when it collides with nothing)."""
    from pyspark.sql import functions as F

    from edu_online_spark.operators.textops import feature_hash_vectors

    docs = spark.createDataFrame(
        [(0, "alpha beta alpha alpha"), (1, "alpha beta alpha alpha")],
        ["doc_id", "text"],
    )
    out = feature_hash_vectors(docs).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["dim"]] = r["v"]
    assert by_doc[0] == by_doc[1]          # content-deterministic
    assert sorted(abs(v) for v in by_doc[0].values()) == [1, 3]
    again = {
        (r["doc_id"], r["dim"]): r["v"]
        for r in feature_hash_vectors(docs.repartition(7)).collect()
    }
    assert again == {(r["doc_id"], r["dim"]): r["v"] for r in out}


def test_hashed_knn_finds_textual_twin(spark):
    """A near-identical doc must be its query's top hashed-vector
    neighbor with cosine near 1 — retrieval on the stateless
    featurizer."""
    from edu_online_spark.operators.textops import hashed_knn

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (0, base),                                   # query (0 % 100 == 0)
            (1, base.replace("kappa", "lambda")),        # near twin
            (2, "totally different words entirely here now"),
        ],
        ["doc_id", "text"],
    )
    out = [r for r in hashed_knn(docs, k=2).collect() if r["qid"] == 0]
    assert out and out[0]["nid"] == 1 and out[0]["cosine"] > 0.85


def test_token_budget_cap_prefix_sum_and_cutoff(spark):
    """The two-stage bucketed prefix sum must equal the naive running
    sum, and the kept set must stop exactly at the budget boundary."""
    from edu_online_spark.operators.textops import (
        BUDGET_HASH_MOD,
        token_budget_cap,
    )

    rows = [
        (i, "s1" if i % 2 == 0 else "s2", " ".join(["w"] * (5 + i % 7)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r["doc_id"]: r for r in token_budget_cap(docs, budget=30).collect()}

    # naive single-pass replica in Python
    def h(doc_id):
        return (doc_id % 2147483647) * 2654435761 % BUDGET_HASH_MOD

    for src in ("s1", "s2"):
        ordered = sorted(
            (r for r in rows if r[1] == src), key=lambda r: (h(r[0]), r[0])
        )
        cum = 0
        for doc_id, _, text in ordered:
            cum += len(text.split())
            assert out[doc_id]["cum_tokens"] == cum
            assert out[doc_id]["kept"] == (cum <= 30)
    # budget actually bites: some kept, some dropped, per source
    for src in ("s1", "s2"):
        kept = [r["kept"] for r in out.values() if r["source"] == src]
        assert any(kept) and not all(kept)


def test_token_budget_cap_partitioning_invariant(spark):
    from edu_online_spark.operators.textops import token_budget_cap

    rows = [(i, f"s{i % 3}", " ".join(["w"] * (3 + i % 5))) for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    a = sorted(map(tuple, token_budget_cap(docs, budget=20).collect()))
    b = sorted(
        map(tuple, token_budget_cap(docs.repartition(7), budget=20).collect())
    )
    assert a == b


def test_temperature_mixture_flattens_sources(spark):
    """sqrt temperature must upsample the tail source relative to its
    raw share and downsample the head."""
    from edu_online_spark.operators.textops import temperature_mixture_sample

    rows = [(i, "head" if i < 90 else "tail", "a b c") for i in range(100)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = temperature_mixture_sample(docs).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
    n_head, n_tail = len(by_src["head"]), len(by_src["tail"])
    # raw shares 90/10; sqrt weights ~9.49/3.16 → ~75%/25% of N=50
    assert n_head + n_tail <= 50
    assert n_tail / (n_head + n_tail) > 0.2  # tail upsampled vs 10%
    assert n_head / (n_head + n_tail) < 0.8  # head downsampled vs 90%
    # rank never exceeds its source's target
    for r in got:
        assert r["rank"] <= r["target_n"]


def test_curriculum_stages_orders_common_before_rare(spark):
    """Docs built from corpus-common tokens must stage earlier than
    docs of rare tokens, and all four stages must be populated."""
    from edu_online_spark.operators.textops import curriculum_stages

    rows = []
    # 'common' appears in every doc; rare_i only in doc i
    for i in range(20):
        base = ["common"] * 5
        rare = [f"rare{i}_{j}" for j in range(i)]  # more rare → harder
        rows.append((i, " ".join(base + rare)))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in curriculum_stages(docs).collect()}
    assert out[0]["stage"] == 1          # all-common doc is easiest
    assert out[19]["stage"] == 4         # most rare-heavy doc is hardest
    assert {r["stage"] for r in out.values()} == {1, 2, 3, 4}
    # monotone: more rare tokens never DECREASES the stage
    stages = [out[i]["stage"] for i in range(20)]
    assert stages == sorted(stages)


def test_training_shards_match_naive_global_prefix_sum(spark):
    """The bucketed GLOBAL prefix sum must equal the naive running sum
    over the hash-priority order, and shard_id must be the starting
    offset's integer quotient."""
    from edu_online_spark.operators.textops import (
        BUDGET_HASH_MOD,
        assign_training_shards,
    )

    rows = [
        (i, f"s{i % 3}", " ".join(["w"] * (4 + i % 9))) for i in range(60)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {
        r["doc_id"]: r
        for r in assign_training_shards(docs, shard_tokens=50).collect()
    }

    def h(doc_id):
        return (doc_id % 2147483647) * 2654435761 % BUDGET_HASH_MOD

    ordered = sorted(rows, key=lambda r: (h(r[0]), r[0]))
    cum = 0
    for doc_id, _, text in ordered:
        n = len(text.split())
        start, cum = cum, cum + n
        assert out[doc_id]["cum_tokens"] == cum
        assert out[doc_id]["shard_id"] == start // 50
    assert len({r["shard_id"] for r in out.values()}) > 3


def test_shard_manifest_masses_and_checksum(spark):
    """Every shard except the last must carry >= the target token mass
    minus one max-doc (no shard closes early), offsets must tile the
    stream, and the xor checksum must equal the member xor."""
    from edu_online_spark.operators.textops import (
        assign_training_shards,
        shard_manifest,
    )

    rows = [(i, "s0", " ".join(["w"] * (3 + i % 6))) for i in range(80)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    assigned = assign_training_shards(docs, shard_tokens=40).collect()
    man = sorted(
        shard_manifest(docs, shard_tokens=40).collect(),
        key=lambda r: r["shard_id"],
    )
    assert [r["shard_id"] for r in man] == list(range(len(man)))
    # offsets tile: shard k ends where k+1 starts (docs span boundaries,
    # so last_offset of k can overhang first_offset of k+1's quotient)
    for a, b in zip(man, man[1:]):
        assert a["last_offset"] == b["first_offset"]
    total = sum(r["n_tokens"] for r in assigned)
    assert man[-1]["last_offset"] == total
    assert sum(r["shard_token_mass"] for r in man) == total
    for r in man:
        members = [a for a in assigned if a["shard_id"] == r["shard_id"]]
        x = 0
        for m in members:
            x ^= m["doc_id"]
        assert r["id_xor"] == x and r["n_docs"] == len(members)


def test_training_shards_partitioning_invariant(spark):
    from edu_online_spark.operators.textops import assign_training_shards

    rows = [(i, f"s{i % 2}", " ".join(["w"] * (2 + i % 7))) for i in range(50)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    a = sorted(map(tuple, assign_training_shards(docs, 30).collect()))
    b = sorted(
        map(tuple, assign_training_shards(docs.repartition(11), 30).collect())
    )
    assert a == b


def test_quality_budget_fill_takes_best_first(spark):
    """The kept set must be exactly the best-quality prefix of the
    budget: high-stopword docs admit before punctuation soup, and the
    bucketed prefix sum must equal the naive quality-ordered cumsum."""
    from edu_online_spark.operators.textops import (
        BUDGET_HASH_MOD,
        quality_budget_fill,
    )

    rows = []
    for i in range(20):
        rows.append((i, "the a is of and with for " * 3))       # high quality
    for i in range(20, 40):
        rows.append((i, ".,;: !? .,;: words mostly punct " * 3))  # low
    rows.append((99, ""))  # degenerate: NULL score, sorts last
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in quality_budget_fill(docs, budget=200).collect()}

    def h(doc_id):
        return (doc_id % 2147483647) * 2654435761 % BUDGET_HASH_MOD

    naive = sorted(
        (r for r in out.values() if r["quality_score"] is not None),
        key=lambda r: (-r["quality_score"], h(r["doc_id"]), r["doc_id"]),
    ) + [out[99]]
    cum = 0
    for r in naive:
        cum += r["n_tokens"]
        assert r["cum_tokens"] == cum
        assert r["kept"] == (cum <= 200)
    # the budget bites inside the high-quality block or just after it:
    # every kept doc must be at least as good as every dropped one
    kept_min = min(
        (r["quality_score"] for r in out.values() if r["kept"]), default=None
    )
    dropped_max = max(
        (
            r["quality_score"]
            for r in out.values()
            if not r["kept"] and r["quality_score"] is not None
        ),
        default=None,
    )
    assert kept_min is not None and dropped_max is not None
    assert kept_min >= dropped_max
    assert not out[99]["kept"]  # NULL-scored doc is last in line


def test_quality_budget_fill_partitioning_invariant(spark):
    from edu_online_spark.operators.textops import quality_budget_fill

    rows = [
        (i, ("the of and " * (1 + i % 4)) + (". , ; " * (i % 3)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(map(tuple, quality_budget_fill(docs, 100).collect()))
    b = sorted(
        map(tuple, quality_budget_fill(docs.repartition(13), 100).collect())
    )
    assert a == b


# --------------------------------------------------------------------------
# round 7: novelty / vocab overlap / winnowing / exact length quantiles
# --------------------------------------------------------------------------


def test_ngram_novelty_planted(spark):
    from edu_online_spark.operators.textops import ngram_novelty

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),      # all novel
            (1, "alpha beta gamma delta epsilon"),      # exact repost
            (2, "alpha beta gamma zeta eta theta"),     # partial overlap
            (3, "xy"),                                  # < 3 tokens: no row
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["novelty_frac"] == 1.0 and out[0]["n_shingles"] == 3
    assert out[1]["novelty_frac"] == 0.0          # repost adds nothing
    # doc 2: shingles 'alpha beta gamma' (seen), 3 fresh ones
    assert out[2]["n_shingles"] == 4 and out[2]["n_novel"] == 3


def test_source_vocab_overlap_planted(spark):
    from edu_online_spark.operators.textops import source_vocab_overlap

    docs = spark.createDataFrame(
        [
            (0, "a b c d", "s1"),
            (1, "c d e f", "s2"),    # |V1∩V2| = 2 of 4+4
            (2, "zz yy", "s3"),      # disjoint from both
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_vocab_overlap(docs).collect()
    }
    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    r = out[("s1", "s2")]
    assert r["n_inter"] == 2 and r["n_a"] == 4 and r["n_b"] == 4
    assert r["jaccard"] == 2 / 6 and r["containment_min"] == 0.5
    assert out[("s1", "s3")]["n_inter"] == 0      # zero row preserved
    assert out[("s1", "s3")]["jaccard"] == 0.0


def test_winnowing_guarantee_and_density(spark):
    """The Schleimer guarantee: any shared word run of at least
    w + k - 1 = 6 words yields at least one COMMON fingerprint value;
    and the selection keeps far fewer rows than the gram count. Holds
    for both hash variants (the algorithm, not the hash, provides it).
    """
    from edu_online_spark.operators.textops import winnowing_fingerprints

    shared = "one two three four five six"  # 6 words = w + k - 1
    docs = spark.createDataFrame(
        [
            (0, f"prefix padding words {shared} trailing bits here"),
            (1, f"{shared} completely different ending material now"),
            (2, "unrelated text with no overlap whatsoever present"),
        ],
        ["doc_id", "text"],
    )
    for variant in ("poly", "fast"):
        fp = winnowing_fingerprints(docs, variant=variant)
        rows = fp.collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
        assert by_doc[0] & by_doc[1], variant   # shared run detected
        assert not (by_doc[0] & by_doc[2]), variant
        # density: selections ≪ grams (8-gram docs, window 4)
        assert all(len(v) <= 4 for v in by_doc.values()), variant


def test_winnowing_rightmost_tie_and_invariance(spark):
    from edu_online_spark.operators.textops import winnowing_fingerprints

    # identical grams everywhere → every window's min is a tie; the
    # rightmost rule must pick the LAST gram of each window, so
    # selections are positions w-1, w, ..., G-1
    docs = spark.createDataFrame([(0, "x x x x x x x x")], ["doc_id", "text"])
    rows = winnowing_fingerprints(docs, variant="poly").collect()
    assert sorted(r["fp_pos"] for r in rows) == [3, 4, 5]
    a = sorted(map(tuple, winnowing_fingerprints(docs).collect()))
    b = sorted(
        map(tuple, winnowing_fingerprints(docs.repartition(7)).collect())
    )
    assert a == b


def test_length_quantiles_exact_positions(spark):
    from edu_online_spark.operators.textops import length_quantiles_exact

    # source s: lengths 1..20 → p25 = 5th = 5, p50 = 10th = 10,
    # p75 = 15th = 15, p95 = 19th = 19
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * i), "s") for i in range(1, 21)],
        ["doc_id", "text", "source"],
    )
    r = length_quantiles_exact(docs).collect()[0]
    assert (r["n_docs"], r["p25_tokens"], r["p50_tokens"],
            r["p75_tokens"], r["p95_tokens"]) == (20, 5, 10, 15, 19)
    # odd group: lengths 1..5 → p50 = 3rd = 3
    docs2 = spark.createDataFrame(
        [(i, " ".join(["w"] * i), "s") for i in range(1, 6)],
        ["doc_id", "text", "source"],
    )
    r2 = length_quantiles_exact(docs2).collect()[0]
    assert (r2["p25_tokens"], r2["p50_tokens"], r2["p95_tokens"]) == (2, 3, 5)


def test_winnowing_poly_gram_hash_matches_char_fold(spark):
    """The per-token rolling-hash combine (optimization r16) must be
    bit-identical to the direct character fold over each gram string —
    the value contract every poly-variant winnowing oracle certifies.
    Covers multi-char tokens, single chars, digits/punct, non-ASCII,
    and repeated tokens."""
    from edu_online_spark.functions.text import (
        FINGERPRINT_BASE,
        FINGERPRINT_MOD,
    )
    from edu_online_spark.operators.textops import (
        WINNOW_K,
        _winnow_selections,
    )

    texts = [
        "alpha bravo charlie delta echo foxtrot",
        "a b c d e f g h",
        "x x x x x x",
        "über café 中文 mixed ascii tokens here",
        "123 45.6 , ; token-with-dash plain",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    # read back every selected (fp_pos, fp); every fp must equal the
    # char fold of the gram string at that position
    sels = (
        _winnow_selections(docs, WINNOW_K, 4, "poly")
        .select("doc_id", F.explode("_sels").alias("s"))
        .collect()
    )
    assert sels  # non-vacuous

    def char_fold(s: str) -> int:
        acc = 0
        for ch in s:
            acc = (acc * FINGERPRINT_BASE + ord(ch)) % FINGERPRINT_MOD
        return acc

    for r in sels:
        toks = texts[r["doc_id"]].split()
        pos = r["s"]["fp_pos"]
        gram = " ".join(toks[pos : pos + WINNOW_K])
        assert r["s"]["fp"] == char_fold(gram), (r["doc_id"], pos, gram)


def test_winnowing_overlap_detects_shared_passage(spark):
    from edu_online_spark.operators.textops import winnowing_overlap_pairs

    passage = "alpha bravo charlie delta echo foxtrot golf hotel india"
    docs = spark.createDataFrame(
        [
            (0, f"intro words here {passage} closing remarks now"),
            (1, f"{passage} totally different continuation text follows"),
            (2, "nothing in common with the others at all whatsoever"),
        ],
        ["doc_id", "text"],
    )
    for variant in ("poly", "fast"):
        pairs = {
            (r["doc_a"], r["doc_b"]): r["n_shared"]
            for r in winnowing_overlap_pairs(docs, variant=variant).collect()
        }
        assert set(pairs) == {(0, 1)}, variant
        assert pairs[(0, 1)] >= 2, variant


def test_winnowing_overlap_boilerplate_guard(spark):
    """A fingerprint present in more than max_fp_df docs must not pair
    anything: 10 docs sharing only one ubiquitous passage produce zero
    pairs at max_fp_df=5."""
    from edu_online_spark.operators.textops import winnowing_overlap_pairs

    boiler = "standard license header text appears in every file here"
    docs = spark.createDataFrame(
        [(i, f"{boiler} unique{i} word{i} tail{i} run{i} end{i}")
         for i in range(10)],
        ["doc_id", "text"],
    )
    out = winnowing_overlap_pairs(docs, max_fp_df=5, variant="poly").collect()
    assert out == []


def test_winnowing_cross_corpus_delta_probe(spark):
    """Delta-vs-corpus: a delta doc embedding a corpus passage pairs
    with THAT corpus doc only; corpus-internal duplicates must not
    produce pairs; the corpus-side df cap drops corpus boilerplate."""
    from edu_online_spark.operators.textops import (
        winnowing_overlap_cross_corpus,
    )

    passage = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    boiler = "footer line repeated across the whole corpus every time"
    corpus = spark.createDataFrame(
        [
            (100, f"corpus framing {passage} corpus ending {boiler}"),
            (101, f"different body text entirely here {boiler}"),
            (102, f"more unrelated corpus material words {boiler}"),
            # corpus-internal near-dup of 100 — must NOT yield pairs
            (103, f"corpus framing {passage} corpus ending altered"),
        ],
        ["doc_id", "text"],
    )
    delta = spark.createDataFrame(
        [
            (1, f"fresh delta intro {passage} fresh delta outro"),
            (2, "genuinely new delta content with nothing shared at all"),
        ],
        ["doc_id", "text"],
    )
    out = winnowing_overlap_cross_corpus(
        delta, corpus, max_fp_df=2, variant="poly"
    ).collect()
    pairs = {(r["new_id"], r["corpus_id"]) for r in out}
    assert (1, 100) in pairs and (1, 103) in pairs
    assert all(n == 1 for n, _ in pairs)  # doc 2 pairs with nothing
    # boilerplate footer appears in 3 corpus docs > cap 2 → its prints
    # never pair doc 2 (or anything) despite being corpus-wide


def test_sorted_neighborhood_recovers_suffix_typo(spark):
    """The case the composite block misses by design (docstring of
    customer_record_linkage): a typo in the blocked name-SUFFIX changes
    the block key, so pass 1 cannot pair it — the sorted-neighborhood
    pass on the reversed record (cents prefix intact) must recover it,
    and the multipass linkage must link it correctly."""
    from edu_online_spark.operators.analytics import (
        link_records,
        link_records_multipass,
    )

    clean = spark.createDataFrame(
        [
            (k, 0, f"Customer#00{k:02d}xyz{k:02d}|{10000 + k * 37}")
            for k in range(1, 21)
        ],
        ["cand_key", "c_nation", "c_rec"],
    )
    # dirty twin of key 7 with the LAST name char typo'd: block key
    # (last 4 of name portion) changes, reversed record still leads
    # with the identical cents digits
    base = f"Customer#0007xyz07|{10000 + 7 * 37}"
    name, cents = base.split("|")
    typo = name[:-1] + "Q" + "|" + cents
    dirty = spark.createDataFrame(
        [(7, 0, typo)], ["true_key", "d_nation", "d_rec"]
    )
    single = link_records(dirty, clean).collect()
    multi = link_records_multipass(dirty, clean).collect()
    assert single == []                      # pass 1 blind, by design
    assert len(multi) == 1
    assert multi[0]["matched_key"] == 7 and multi[0]["dice"] > 0.8


def test_multipass_agrees_with_single_pass_when_block_intact(spark):
    """When the composite block DOES fire, multipass must return the
    same best matches as the certified single-pass query (the union
    adds candidates, never changes scoring or tie-breaks)."""
    from edu_online_spark.operators.analytics import (
        link_records,
        link_records_multipass,
    )

    clean = spark.createDataFrame(
        [
            (k, k % 3, f"Customer#00{k:02d}abc{k:02d}|{5000 + k * 91}")
            for k in range(1, 16)
        ],
        ["cand_key", "c_nation", "c_rec"],
    )
    # perturb a MIDDLE char (block suffix intact)
    rows = []
    for k in (3, 6, 9):
        rec = f"Customer#00{k:02d}abc{k:02d}|{5000 + k * 91}"
        rows.append((k, k % 3, rec[:10] + "Z" + rec[11:]))
    dirty = spark.createDataFrame(rows, ["true_key", "d_nation", "d_rec"])
    single = {r["true_key"]: r for r in link_records(dirty, clean).collect()}
    multi = {
        r["true_key"]: r for r in link_records_multipass(dirty, clean).collect()
    }
    assert set(single) == set(multi) == {3, 6, 9}
    for k in single:
        assert single[k]["matched_key"] == multi[k]["matched_key"] == k
        assert abs(single[k]["dice"] - multi[k]["dice"]) < 1e-12


def test_winnowing_overlap_clusters_transitive(spark):
    """A passage chain A~B (passage 1) and B~C (passage 2) must close
    into one component even though A and C share nothing directly."""
    from edu_online_spark.operators.textops import winnowing_overlap_clusters

    p1 = "alpha bravo charlie delta echo foxtrot golf hotel"
    p2 = "india juliet kilo lima mike november oscar papa"
    docs = spark.createDataFrame(
        [
            (1, f"first framing {p1} first ending material"),
            (2, f"{p1} middle document bridging text {p2}"),
            (3, f"third framing {p2} third ending material"),
            (4, "entirely unrelated content with no shared passages here"),
        ],
        ["doc_id", "text"],
    )
    # min_shared=1: the coverage guarantee promises >=1 common print
    # per shared run of w+k-1 words (2 would need longer passages)
    out = {
        r["doc_id"]: r["cluster_rep"]
        for r in winnowing_overlap_clusters(
            docs, min_shared=1, variant="poly"
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}  # transitive closure; doc 4 absent


def test_incremental_shards_continue_the_global_stream(spark):
    """Delta docs continue the standing corpus' token stream: the
    first delta doc starts exactly at the corpus' total token mass,
    the delta's internal order is its own hash-priority order (the
    same docs sharded with an empty corpus, shifted by the base), and
    a corpus re-shard is never implied."""
    from edu_online_spark.operators.textops import (
        assign_training_shards,
        assign_training_shards_incremental,
    )

    corpus = spark.createDataFrame(
        [(i, "s", " ".join(f"c{i}_{j}" for j in range(7))) for i in range(1, 21)],
        ["doc_id", "source", "text"],
    )
    delta = spark.createDataFrame(
        [(100 + i, "s", " ".join(f"d{i}_{j}" for j in range(5))) for i in range(12)],
        ["doc_id", "source", "text"],
    )
    base_tokens = 20 * 7
    out = assign_training_shards_incremental(delta, corpus, shard_tokens=64)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 12
    assert min(r["cum_tokens"] - r["n_tokens"] for r in rows.values()) == base_tokens
    # naive replica: shard the delta standalone, then shift by the base
    solo = {
        r["doc_id"]: r
        for r in assign_training_shards(delta, shard_tokens=64).collect()
    }
    for did, r in rows.items():
        assert r["cum_tokens"] == solo[did]["cum_tokens"] + base_tokens
        assert r["shard_id"] == (r["cum_tokens"] - r["n_tokens"]) // 64
    # empty corpus degenerates to the plain assignment
    empty = corpus.filter("doc_id < 0")
    out0 = {
        r["doc_id"]: r["cum_tokens"]
        for r in assign_training_shards_incremental(
            delta, empty, shard_tokens=64
        ).collect()
    }
    assert out0 == {d: r["cum_tokens"] for d, r in solo.items()}
    # ADVICE r9: a caller carrying the corpus total forward (manifest /
    # streaming state) skips the corpus scan and gets identical output
    carried = assign_training_shards_incremental(
        delta, shard_tokens=64, base_tokens=base_tokens
    )
    assert {r["doc_id"]: tuple(r) for r in carried.collect()} == {
        d: tuple(r) for d, r in rows.items()
    }
    import pytest

    with pytest.raises(ValueError, match="base_tokens"):
        assign_training_shards_incremental(delta, shard_tokens=64)


def test_incremental_shards_match_r9_oracle(spark, sf_dir):
    """The round-9 registered oracle hash-matches at sf0.001."""
    from edu_online_spark.operators.textops import (
        ORACLE,
        assign_training_shards_incremental,
    )
    from edu_online_spark.sources import load_table
    from tools.parity import compare, run_oracle

    docs = load_table(spark, sf_dir, "documents")
    problems = compare(
        "corpus_shards_incremental",
        assign_training_shards_incremental(
            docs.filter(F.col("doc_id") % 10 == 0),
            docs.filter(F.col("doc_id") % 10 != 0),
        ),
        run_oracle(ORACLE["corpus_shards_incremental"], sf_dir),
    )
    assert not problems, problems


def test_decontamination_stats_flags_and_keeps(spark):
    """Planted contamination: a training doc repeating a benchmark
    passage is flagged, clean docs are kept, and a too-short doc
    (no shingles → no evidence) is kept with rate 0."""
    from edu_online_spark.operators.textops import decontamination_stats

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, bench_text, "bench"),
        # 7/8 of its shingles are benchmark shingles → flagged at 0.2
        (2, bench_text + " extra", "s1"),
        (3, " ".join(f"clean{j}" for j in range(10)), "s1"),
        (4, "too short", "s1"),  # < 3 words → kept, rate 0
        (5, " ".join(f"other{j}" for j in range(10)), "s2"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["source"]: r
           for r in decontamination_stats(docs, bench_source="bench").collect()}
    assert set(out) == {"s1", "s2"}
    assert out["s1"]["n_docs"] == 3
    assert out["s1"]["n_flagged"] == 1 and out["s1"]["n_kept"] == 2
    assert out["s1"]["flagged_tokens"] == 9  # doc 2 has 9 tokens
    assert out["s2"]["n_flagged"] == 0
    assert out["s2"]["flagged_token_share"] == 0.0


def test_decontamination_stats_match_r9_oracle(spark, sf_dir):
    """The round-9 registered oracle hash-matches at sf0.001."""
    from edu_online_spark.operators.textops import (
        ORACLE,
        decontamination_stats,
    )
    from edu_online_spark.sources import load_table
    from tools.parity import compare, run_oracle

    problems = compare(
        "docs_decontamination_stats",
        decontamination_stats(load_table(spark, sf_dir, "documents")),
        run_oracle(ORACLE["docs_decontamination_stats"], sf_dir),
    )
    assert not problems, problems


def test_source_winnow_overlap_matrix_planted(spark):
    """Planted source-pair passage overlap: s1 and s2 carry the same
    10-word passage inside different framing → shared fingerprints;
    s3 is unrelated → its pairs surface as 0 rows (grid left join);
    a passage in MORE than max_fp_df docs is boilerplate and must not
    count toward any pair."""
    from edu_online_spark.operators.textops import (
        source_winnow_overlap_matrix,
    )

    passage = "uno due tre quattro cinque sei sette otto nove dieci"
    boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, f"first framing {passage} first ending words", "s1"),
        (2, f"second intro {passage} second outro text", "s2"),
        (3, "entirely unrelated content with no shared passages here", "s3"),
        # boilerplate in 3 docs across all sources > max_fp_df=2
        (4, f"s1 filler {boiler} more filler", "s1"),
        (5, f"s2 filler {boiler} other filler", "s2"),
        (6, f"s3 filler {boiler} third filler", "s3"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        (r["source_a"], r["source_b"]): r
        for r in source_winnow_overlap_matrix(
            docs, max_fp_df=2, variant="poly"
        ).collect()
    }
    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    s12 = out[("s1", "s2")]
    assert s12["shared_fps"] >= 1  # winnowing guarantee on the passage
    assert s12["fp_jaccard"] > 0.0
    # the boilerplate passage (df 3 > 2) contributes to NO pair: every
    # s3 pair shares nothing
    assert out[("s1", "s3")]["shared_fps"] == 0
    assert out[("s2", "s3")]["shared_fps"] == 0
    assert out[("s1", "s3")]["fp_jaccard"] == 0.0


def test_source_token_fertility_planted(spark):
    """Fertility = subword tokens per whitespace word; OOV judged
    against the corpus top-k vocabulary with (count desc, token asc)
    ties; a word-less source reports 0.0 ratios, never a division
    artifact."""
    from edu_online_spark.operators.textops import source_token_fertility

    rows = [
        (1, "hello world", "a"),       # 2 words → 2 subwords
        (2, "don't stop", "b"),        # 2 words → don / ' / t / stop = 4
        (3, "", "c"),                  # empty: the 1-token '' artifact
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        r["source"]: r
        for r in source_token_fertility(docs, vocab_size=1).collect()
    }
    assert out["a"]["n_words"] == 2 and out["a"]["n_subword_tokens"] == 2
    assert out["a"]["fertility"] == 1.0
    assert out["b"]["n_subword_tokens"] == 4 and out["b"]["fertility"] == 2.0
    # top-1 vocab: all tokens count 1 → lexicographic first = "don't"
    assert out["b"]["n_oov_words"] == 1 and out["b"]["oov_rate"] == 0.5
    assert out["a"]["n_oov_words"] == 2 and out["a"]["oov_rate"] == 1.0
    # empty text: token_count's [''] artifact gives 1 word, 0 subwords,
    # no OOV rows; ratios stay finite
    assert out["c"]["n_words"] == 1 and out["c"]["n_subword_tokens"] == 0
    assert out["c"]["fertility"] == 0.0 and out["c"]["n_oov_words"] == 0


def test_round9_additions_match_oracle(spark, sf_dir):
    """Both round-9 additions hash-match their DuckDB mirrors at
    sf0.001."""
    from edu_online_spark.operators.textops import (
        ORACLE,
        source_token_fertility,
        source_winnow_overlap_matrix,
    )
    from edu_online_spark.sources import load_table
    from tools.parity import compare, run_oracle

    docs = load_table(spark, sf_dir, "documents")
    for name, df in [
        (
            "source_winnow_overlap_matrix",
            source_winnow_overlap_matrix(docs, variant="poly"),
        ),
        ("source_token_fertility", source_token_fertility(docs)),
    ]:
        problems = compare(name, df, run_oracle(ORACLE[name], sf_dir))
        assert not problems, (name, problems)


def test_vocab_coverage_matches_r11_oracle(spark, sf_dir):
    """Queued round-11 oracle hash-matches at sf0.001."""
    from edu_online_spark.operators.textops import (
        ORACLE_R11,
        vocab_coverage_curve,
    )
    from edu_online_spark.sources import load_table
    from tools.parity import compare, run_oracle

    problems = compare(
        "corpus_vocab_coverage",
        vocab_coverage_curve(load_table(spark, sf_dir, "documents")),
        run_oracle(ORACLE_R11["corpus_vocab_coverage"], sf_dir),
    )
    assert not problems, problems


def test_vocab_coverage_fixture(spark):
    """Corpus 'a a a b b c': top-1 covers 3/6, top-2 covers 5/6,
    top-3 covers all; vocab_size 3 on every row."""
    from edu_online_spark.operators.textops import vocab_coverage_curve

    docs = spark.createDataFrame(
        [(1, "a a a b b c", "s")], ["doc_id", "text", "source"]
    )
    out = {
        r["top_n"]: r
        for r in vocab_coverage_curve(docs, top_ns=(1, 2, 3)).collect()
    }
    assert out[1]["covered_tokens"] == 3 and out[1]["coverage"] == 0.5
    assert out[2]["covered_tokens"] == 5 and out[2]["coverage"] == 5 / 6
    assert out[3]["coverage"] == 1.0
    assert all(r["vocab_size"] == 3 and r["total_tokens"] == 6
               for r in out.values())


def test_weighted_sample_matches_r12_oracle(spark, sf_dir):
    """The queued round-12 oracle hash-matches at sf0.001 — promotion
    next round is a registry edit, not new arithmetic."""
    from edu_online_spark.operators.textops import (
        ORACLE_R12,
        weighted_sample,
    )
    from edu_online_spark.sources import load_table
    from tools.parity import compare, run_oracle

    problems = compare(
        "docs_weighted_sample",
        weighted_sample(load_table(spark, sf_dir, "documents")),
        run_oracle(ORACLE_R12["docs_weighted_sample"], sf_dir),
    )
    assert not problems, problems


def test_weighted_sample_exact_k_and_formula(spark, sf_dir):
    """Exactly k rows, every priority recomputes from the documented
    integer recipe, and the selected set is the true bottom-k of the
    whole corpus (TakeOrdered did not truncate per-partition)."""
    from edu_online_spark.operators.textops import (
        _WS_HASH_MOD,
        weighted_sample,
    )
    from edu_online_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    k = 25
    got = weighted_sample(docs, k=k).collect()
    assert len(got) == k

    def pri(doc_id, n_chars):
        h = (doc_id % 2147483647) * 2654435761 % _WS_HASH_MOD + 1
        return h / (n_chars + 1)

    for r in got:
        assert r["priority"] == pri(r["doc_id"], r["n_chars"])
    full = sorted(
        (pri(r["doc_id"], r["n_chars"]), r["doc_id"])
        for r in docs.select("doc_id", "n_chars").collect()
    )
    assert {r["doc_id"] for r in got} == {d for _, d in full[:k]}


def test_weighted_sample_favors_heavy_docs(spark):
    """Weight-monotone selection: with a 100x weight gap between two
    equal-sized families, the sample is dominated by the heavy one."""
    from edu_online_spark.operators.textops import weighted_sample

    # heavy docs get 100x the chars of light ones — the k=10 sample
    # from 20+20 docs should be dominated by the heavy family
    rows = [(i, "s", 50) for i in range(20)] + [
        (i + 20, "s", 5000) for i in range(20)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    got = weighted_sample(docs, k=10).collect()
    heavy = sum(1 for r in got if r["n_chars"] == 5000)
    assert heavy >= 8  # 100x weight ratio ⇒ near-total dominance


def test_composed_winnowing_equal_standalones(spark, sf_dir):
    """VERDICT r15 #4: the composed entry (one shared winnowing
    selection) must melt EXACTLY the rows the four standalone
    diagnostics produce — the sharing changes the plan, never the
    report."""
    from pyspark.sql import functions as F

    from edu_online_spark.operators.textops import (
        source_winnow_overlap_matrix,
        winnowing_diagnostics_composed,
        winnowing_overlap_clusters,
        winnowing_overlap_cross_corpus,
        winnowing_overlap_pairs,
    )
    from edu_online_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = winnowing_diagnostics_composed(docs)
    by_diag = {
        d: sorted(
            map(
                tuple,
                got.filter(F.col("diagnostic") == d)
                .drop("diagnostic")
                .collect(),
            )
        )
        for d in ("overlap", "cluster", "cross", "matrix")
    }

    ov = winnowing_overlap_pairs(docs, variant="poly").collect()
    assert by_diag["overlap"] == sorted(
        (str(r["doc_a"]), str(r["doc_b"]), r["n_shared"], None, None,
         None, None)
        for r in ov
    )
    cl = winnowing_overlap_clusters(docs, variant="poly").collect()
    assert by_diag["cluster"] == sorted(
        (str(r["doc_id"]), None, r["cluster_rep"], None, None, None,
         None)
        for r in cl
    )
    cx = winnowing_overlap_cross_corpus(
        docs.filter(F.col("doc_id") % 10 == 0),
        docs.filter(F.col("doc_id") % 10 != 0),
        variant="poly",
    ).collect()
    assert by_diag["cross"] == sorted(
        (str(r["new_id"]), str(r["corpus_id"]), r["n_shared"], None,
         None, None, None)
        for r in cx
    )
    mat = source_winnow_overlap_matrix(docs, variant="poly").collect()
    assert by_diag["matrix"] == sorted(
        (r["source_a"], r["source_b"], r["fps_a"], r["fps_b"],
         r["shared_fps"], None, r["fp_jaccard"])
        for r in mat
    )
    # non-vacuity: the fixture corpus must exercise every grain
    assert all(by_diag[d] for d in by_diag)
