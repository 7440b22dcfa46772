"""Property-based tests (hypothesis): invariants that hold for ALL
inputs, not just fixtures — the untrusted-input decoders never throw
and always quarantine, and the deterministic-sampling hash stays
in-range and stable.

Spark round-trips are expensive per example, so the Spark-facing
properties batch many generated lines into ONE DataFrame per test run;
the pure-Python hash property runs at full hypothesis default volume.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

# Arbitrary printable junk, tabs included — the space of lines a raw
# Kafka topic could deliver.
line = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\n\r"),
    max_size=80,
)


@settings(max_examples=10, deadline=None)
@given(st.lists(line, min_size=1, max_size=30))
def test_qz_decoder_never_throws_and_types_hold(spark, lines):
    """For ANY input lines: no exception (ANSI poison-pill quarantine),
    and every surviving row has non-null int ids and exactly the typed
    columns — the decoder's whole contract, not just the fixtures'."""
    from edu_online_spark.sources.logs import decode_qz_log

    raw = spark.createDataFrame([(l,) for l in lines], ["value"])
    rows = decode_qz_log(raw).collect()  # must not raise
    for r in rows:
        assert isinstance(r["uid"], int)
        assert isinstance(r["courseid"], int)
        assert isinstance(r["pointid"], int)


@settings(max_examples=10, deadline=None)
@given(st.lists(line, min_size=1, max_size=30))
def test_page_ts_decoder_never_throws(spark, lines):
    from edu_online_spark.sources.logs import decode_page_log_ts

    raw = spark.createDataFrame([(l,) for l in lines], ["value"])
    for r in decode_page_log_ts(raw).collect():  # must not raise
        assert r["event_ts"] is not None


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62),
                min_size=1, max_size=50))
def test_hash_bucket_in_range_stable_and_overflow_safe(spark, keys):
    """The REAL hash_bucket column function, over the full long domain:
    always lands in [0, 100), never overflows/throws under ANSI, and
    matches the documented Python-arithmetic mirror exactly (Python
    ints don't wrap, so agreement proves the JVM path didn't either)."""
    from edu_online_spark.functions.core import hash_bucket

    df = spark.createDataFrame([(k,) for k in keys], ["event_id"])
    got = {
        r["event_id"]: r["b"]
        for r in df.select(
            "event_id", hash_bucket("event_id", 100).alias("b")
        ).collect()
    }
    for k in keys:
        expect = ((k % 2147483647) * 2654435761) % 100
        assert got[k] == expect and 0 <= got[k] < 100


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=80,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_pii_redaction_idempotent_and_hit_consistent(spark, texts):
    """Redaction invariants over arbitrary printable text: redacting an
    already-redacted corpus changes nothing (class tokens contain no
    PII shapes), and n_redactions == 0 iff the text survives verbatim."""
    from edu_online_spark.operators.pii import pii_redact

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    once = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    again_in = spark.createDataFrame(
        [(i, once[i]["text_clean"]) for i in once], ["doc_id", "text"]
    )
    twice = {r["doc_id"]: r for r in pii_redact(again_in).collect()}
    for i, t in enumerate(texts):
        assert twice[i]["text_clean"] == once[i]["text_clean"]
        assert twice[i]["n_redactions"] == 0
        if once[i]["n_redactions"] == 0:
            assert once[i]["text_clean"] == t


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=120,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=8, deadline=None)
def test_quality_gates_total_on_arbitrary_text(spark, texts):
    """The rule gate and calibration are TOTAL over arbitrary printable
    input — empty strings, all-whitespace, one-token docs: every doc
    gets a verdict row, booleans are never NULL, and keep ==
    (conjunction of the rule columns). A crash or NULL verdict here
    would poison a 100 TB scan on its weirdest row."""
    from edu_online_spark.operators.textops import (
        gopher_quality_rules,
        quality_calibrated,
    )

    docs = spark.createDataFrame(
        [(i, t, "srcP") for i, t in enumerate(texts)],
        ["doc_id", "text", "source"],
    )
    rules = {r["doc_id"]: r for r in gopher_quality_rules(docs).collect()}
    assert set(rules) == set(range(len(texts)))
    for r in rules.values():
        flags = (
            r["pass_word_count"],
            r["pass_word_len"],
            r["pass_repetition"],
            r["pass_stopwords"],
        )
        assert all(f is not None for f in flags)
        assert r["keep"] == all(flags)
        assert (r["drop_reason"] is None) == r["keep"]
    # calibration must also produce one row per doc without throwing
    # (scores may be NULL on degenerate input — deciles still total)
    cal = quality_calibrated(docs).collect()
    assert len(cal) == len(texts)


@given(
    blobs=st.lists(
        st.binary(max_size=200), min_size=1, max_size=6
    )
)
@settings(max_examples=6, deadline=None)
def test_media_stages_quarantine_arbitrary_bytes(spark, blobs):
    """Poison-payload posture for the perceptual stages: arbitrary
    bytes (truncated headers, wrong magics, junk) must quarantine to
    zero rows, never throw — at 100 TB a poison payload must not kill
    the stage. Valid payloads mixed in still come through."""
    from edu_online_spark.operators.multimodal import (
        _bmp_bytes,
        audio_fingerprint,
        image_ahash,
        video_scene_cuts,
        _wav_bytes,
        _vid_bytes,
    )

    rows = [(i, t, bytearray(b)) for i, b in enumerate(blobs)
            for t in ("image", "audio", "video")]
    rows += [
        (1000, "image", bytearray(_bmp_bytes(7))),
        (1001, "audio", bytearray(_wav_bytes(7))),
        (1002, "video", bytearray(_vid_bytes(7))),
    ]
    assets = spark.createDataFrame(
        rows, "asset_id long, media_type string, payload binary"
    )
    ah = image_ahash(assets).collect()
    fp = audio_fingerprint(assets).collect()
    sc = video_scene_cuts(assets).collect()
    # the planted valid payloads always come through; junk either
    # quarantines (usual) or — if hypothesis ever crafts a genuinely
    # valid header — decodes, which is also correct. No throw either way.
    assert 1000 in {r["asset_id"] for r in ah}
    assert 1001 in {r["asset_id"] for r in fp}
    assert 1002 in {r["asset_id"] for r in sc}


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("aa bb cc dd ee ff gg hh".split()),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_winnowing_coverage_invariant(spark, token_lists):
    """The winnowing guarantee, property-tested on arbitrary corpora:
    per doc, (a) selections are valid gram positions carrying that
    gram's hash, and (b) consecutive selected positions are never more
    than w apart (every w-window contains a selection) — the coverage
    bound the SIGMOD'03 paper proves, over ANY input including
    all-identical tokens (total ties) and short docs."""
    from edu_online_spark.operators.textops import (
        WINNOW_K,
        WINNOW_W,
        winnowing_fingerprints,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        ["doc_id", "text"],
    )
    sel = {}
    for r in winnowing_fingerprints(docs, variant="poly").collect():
        sel.setdefault(r["doc_id"], []).append(r["fp_pos"])
    for i, toks in enumerate(token_lists):
        n_grams = max(len([t for t in toks if t]) - WINNOW_K + 1, 0)
        if n_grams < WINNOW_W:
            assert i not in sel  # shorter than one window: no prints
            continue
        ps = sorted(sel[i])
        assert ps[0] <= WINNOW_W - 1            # first window covered
        assert ps[-1] >= n_grams - WINNOW_W     # last window covered
        assert all(0 <= p < n_grams for p in ps)
        assert all(b - a <= WINNOW_W for a, b in zip(ps, ps[1:])), (ps, toks)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("red blue green gold onyx jade".split()),
            min_size=3,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_ngram_novelty_conservation(spark, token_lists):
    """Conservation law: summed n_novel across docs equals the number
    of DISTINCT shingles in the corpus (every distinct shingle is
    novel in exactly one doc — its min-doc_id first occurrence), and
    novelty fractions stay in [0, 1]."""
    from edu_online_spark.operators.textops import ngram_novelty

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        ["doc_id", "text"],
    )
    rows = ngram_novelty(docs).collect()
    distinct_shingles = {
        " ".join(toks[j : j + 3])
        for toks in token_lists
        for j in range(len(toks) - 2)
    }
    assert sum(r["n_novel"] for r in rows) == len(distinct_shingles)
    assert all(0.0 <= r["novelty_frac"] <= 1.0 for r in rows)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(
            # 6-word vocab forces heavy shingle sharing — the
            # adversarial regime for prefix filtering (many ties in
            # the global df order, high-df shingles everywhere)
            st.sampled_from("red blue green gold onyx jade".split()),
            min_size=3,
            max_size=12,
        ),
        min_size=2,
        max_size=10,
    )
)
def test_prefix_jaccard_lossless_on_arbitrary_corpora(spark, token_lists):
    """The prefix-filter losslessness claim, property-tested: on ANY
    corpus (including total-tie df orders and all-identical docs) the
    prefix-filtered exact join returns the SAME pair relation as the
    certified co-occurrence form — jaccard doubles included."""
    from edu_online_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        ["doc_id", "text"],
    )
    ref = {tuple(r) for r in ngram_jaccard_pairs(docs).collect()}
    got = {tuple(r) for r in ngram_jaccard_pairs_prefix(docs).collect()}
    assert got == ref


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=0, max_value=10_000),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
def test_weighted_sample_is_true_global_bottom_k(spark, rows):
    """For ANY (doc_id, n_chars) corpus the selected set is exactly
    the bottom-k of the (priority, doc_id) total order computed
    independently in Python ints/floats — TakeOrdered never truncates
    per-partition, and the JVM arithmetic matches the documented
    recipe over the whole domain (collisions included)."""
    from edu_online_spark.operators.textops import (
        _WS_HASH_MOD,
        weighted_sample,
    )

    docs = spark.createDataFrame(
        [(d, "s", n) for d, n in rows], ["doc_id", "source", "n_chars"]
    )
    k = 7
    got = [
        (r["priority"], r["doc_id"])
        for r in weighted_sample(docs, k=k).collect()
    ]

    def pri(d, n):
        return ((d % 2147483647) * 2654435761 % _WS_HASH_MOD + 1) / (n + 1)

    want = sorted((pri(d, n), d) for d, n in rows)[:k]
    assert sorted(got) == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["1-URGENT", "2-HIGH"]),
            st.integers(min_value=0, max_value=120),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_fulfillment_latency_is_true_order_statistics(spark, items):
    """For ANY (priority, days) multiset the histogram selection must
    return the element at sorted position ceil(q·n) — compared against
    a Python sorted-list reference, ties and duplicate days included
    (the regime where a cumulative-sum off-by-one would hide)."""
    import datetime

    from edu_online_spark.operators.analytics import fulfillment_latency

    d0 = datetime.date(2024, 1, 1)
    orders = spark.createDataFrame(
        [(i, d0, p) for i, (p, _) in enumerate(items)],
        "o_orderkey long, o_orderdate date, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [(i, d0 + datetime.timedelta(days=d)) for i, (_, d) in enumerate(items)],
        "l_orderkey long, l_shipdate date",
    )
    got = {
        r["priority"]: r
        for r in fulfillment_latency(orders, lineitem).collect()
    }
    by_p: dict[str, list[int]] = {}
    for p, d in items:
        by_p.setdefault(p, []).append(d)
    assert set(got) == set(by_p)
    for p, days in by_p.items():
        days.sort()
        n = len(days)

        def pick(num, den):
            return days[(num * n + den - 1) // den - 1]

        r = got[p]
        assert r["n_items"] == n
        assert r["p50_days"] == pick(1, 2)
        assert r["p90_days"] == pick(9, 10)
        assert r["p99_days"] == pick(99, 100)
        assert r["max_days"] == days[-1]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=1_000_000),
        min_size=1,
        max_size=40,
    )
)
def test_gini_matches_rational_reference(spark, prices):
    """For ANY positive integer revenue multiset the Gini equals the
    sorted-rank identity computed in exact Python rationals, and sits
    in [0, (n-1)/n] — the attainable range of the identity."""
    from fractions import Fraction

    from edu_online_spark.operators.analytics import supplier_revenue_gini

    lineitem = spark.createDataFrame(
        [(k, float(p), 0.0) for k, p in enumerate(prices)],
        "l_suppkey long, l_extendedprice double, l_discount double",
    )
    supplier = spark.createDataFrame(
        [(k, 0) for k in range(len(prices))],
        "s_suppkey long, s_nationkey long",
    )
    nation = spark.createDataFrame(
        [(0, "N")], "n_nationkey long, n_name string"
    )
    [r] = supplier_revenue_gini(lineitem, supplier, nation).collect()
    xs = sorted(prices)
    n = len(xs)
    ref = Fraction(
        2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * sum(xs),
        n * sum(xs),
    )
    assert abs(r["gini"] - float(ref)) < 1e-12
    assert 0 <= r["gini"] <= (n - 1) / n + 1e-12
    assert r["n_suppliers"] == n


@settings(max_examples=8, deadline=None)
@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # day offset
            st.integers(min_value=0, max_value=5),   # user
        ),
        min_size=1,
        max_size=60,
    )
)
def test_stickiness_matches_rolling_distinct_reference(spark, pairs):
    """For ANY (day, user) activity set: DAU/WAU per active day equals
    a Python rolling-window reference — sparse calendars with gaps
    longer than a week included (the regime where a window-frame
    formulation would silently bridge gaps)."""
    import datetime

    from edu_online_spark.operators.analytics import dau_wau_stickiness

    d0 = datetime.date(2024, 3, 1)
    events = spark.createDataFrame(
        [
            (i, u, datetime.datetime.combine(
                d0 + datetime.timedelta(days=d), datetime.time(12, 0)))
            for i, (d, u) in enumerate(sorted(pairs))
        ],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    got = {
        r["day"]: (r["dau"], r["wau"], r["stickiness"])
        for r in dau_wau_stickiness(events).collect()
    }
    active = sorted({d for d, _ in pairs})
    want = {}
    for d in active:
        dau = {u for dd, u in pairs if dd == d}
        wau = {u for dd, u in pairs if d - 6 <= dd <= d}
        key = (d0 + datetime.timedelta(days=d)).strftime("%Y%m%d")
        want[key] = (len(dau), len(wau), len(dau) / len(wau))
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["sA", "sB"]),
            st.lists(
                st.sampled_from("aa bb cc dd".split()),
                min_size=0,
                max_size=10,
            ),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_bigram_simpson_matches_counter_reference(spark, docs_in):
    """For ANY corpus the per-source Simpson report equals a Python
    Counter reference — short docs (0 or 1 tokens, zero bigrams) must
    drop out of the report entirely, not divide by zero."""
    from collections import Counter

    from edu_online_spark.operators.textops import bigram_simpson

    docs = spark.createDataFrame(
        [(i, " ".join(toks), src) for i, (src, toks) in enumerate(docs_in)],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in bigram_simpson(docs).collect()}
    ref: dict[str, Counter] = {}
    for src, toks in docs_in:
        c = ref.setdefault(src, Counter())
        for a, b in zip(toks, toks[1:]):
            c[f"{a} {b}"] += 1
    ref = {s: c for s, c in ref.items() if c}
    assert set(got) == set(ref)
    for s, c in ref.items():
        total = sum(c.values())
        r = got[s]
        assert r["total_bigrams"] == total
        assert r["distinct_bigrams"] == len(c)
        assert r["simpson_num"] == sum(v * v for v in c.values())
        assert r["top1_cnt"] == max(c.values())
        assert r["simpson"] == r["simpson_num"] / (total * total)
        assert r["top1_share"] == r["top1_cnt"] / total


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=2, max_value=4),  # cluster size
            st.lists(st.sampled_from(["en", "zh", "es"]),
                     min_size=4, max_size=4),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_cluster_lang_purity_matches_counter_reference(spark, spec):
    """For ANY cluster assignment + language tagging (fed through the
    explicit `clusters` input, so the property isolates the purity
    aggregation from LSH): majority language, counts, and the
    cross_lang flag match a Python reference with the documented
    (count desc, lang asc) tie-break."""
    from collections import Counter

    from edu_online_spark.operators.dedup import cluster_lang_purity

    doc_rows, cluster_rows, next_id = [], [], 0
    ref_members: dict[int, list[str]] = {}
    for size, langs in spec:
        rep = next_id
        for j in range(size):
            doc_rows.append((next_id, langs[j % len(langs)], "t"))
            cluster_rows.append((next_id, rep))
            next_id += 1
        ref_members[rep] = [langs[j % len(langs)] for j in range(size)]
    docs = spark.createDataFrame(
        doc_rows, "doc_id long, lang string, text string"
    )
    clusters = spark.createDataFrame(
        cluster_rows, "doc_id long, cluster_rep long"
    )
    got = {
        r["cluster_rep"]: r
        for r in cluster_lang_purity(docs, clusters=clusters).collect()
    }
    assert set(got) == set(ref_members)
    for rep, langs in ref_members.items():
        c = Counter(langs)
        top_lang = min(c, key=lambda l: (-c[l], l))
        r = got[rep]
        assert r["cluster_size"] == len(langs)
        assert r["n_langs"] == len(c)
        assert (r["top_lang"], r["top_lang_cnt"]) == (top_lang, c[top_lang])
        assert r["cross_lang"] == (len(c) > 1)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["tA", "tB"]),          # event type
            st.integers(min_value=0, max_value=6),  # user
        ),
        min_size=1,
        max_size=80,
    )
)
def test_activity_gini_matches_rational_reference(spark, tus):
    """For ANY (type, user) event multiset the histogram-Gini equals
    the direct sorted-rank identity in exact Python rationals, and the
    top-decile share equals the sorted-suffix mass above rank
    floor(0.9n) — the arithmetic-series claim under arbitrary tie
    structure, which the fixture tests can't sweep."""
    from collections import Counter
    from fractions import Fraction

    from edu_online_spark.operators.analytics import user_activity_gini

    events = spark.createDataFrame(
        [(i, u, t, "2024-01-01 10:00:00") for i, (t, u) in enumerate(tus)],
        "event_id long, user_id long, event_type string, ts string",
    )
    got = {r["event_type"]: r for r in user_activity_gini(events).collect()}
    per = Counter(tus)  # (type, user) -> count
    types = {t for t, _ in per}
    assert set(got) == types
    for t in types:
        xs = sorted(c for (tt, _), c in per.items() if tt == t)
        n, sx = len(xs), sum(xs)
        ref = Fraction(
            2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * sx,
            n * sx,
        )
        r = got[t]
        assert (r["n_users"], r["total_events"]) == (n, sx), t
        assert r["gini"] == float(ref), t
        k = (9 * n) // 10
        assert r["top_decile_share"] == float(
            Fraction(sx - sum(xs[:k]), sx)
        ), t


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=500),  # positive revenues
        min_size=1,
        max_size=30,
    )
)
def test_hhi_matches_rational_reference(spark, prices):
    """For ANY positive revenue multiset: HHI equals Σ(xᵢ/Σx)² in
    exact rationals (within one double rounding), sits in [1/n, 1],
    and top1_share equals max/Σ exactly."""
    from fractions import Fraction

    from edu_online_spark.operators.analytics import supplier_revenue_hhi

    lineitem = spark.createDataFrame(
        [(k, float(p), 0.0) for k, p in enumerate(prices)],
        "l_suppkey long, l_extendedprice double, l_discount double",
    )
    supplier = spark.createDataFrame(
        [(k, 0) for k in range(len(prices))],
        "s_suppkey long, s_nationkey long",
    )
    nation = spark.createDataFrame(
        [(0, "N")], "n_nationkey long, n_name string"
    )
    [r] = supplier_revenue_hhi(lineitem, supplier, nation).collect()
    n, sx = len(prices), sum(prices)
    ref = sum(Fraction(p, sx) ** 2 for p in prices)
    assert abs(r["hhi"] - float(ref)) < 1e-12
    assert 1 / n - 1e-12 <= r["hhi"] <= 1 + 1e-12
    assert r["top1_share"] == float(Fraction(max(prices), sx))


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("aa bb cc dd ee".split()),
            min_size=0,
            max_size=8,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_shingle_df_spectrum_conservation(spark, token_lists):
    """For ANY corpus: the spectrum's Σ n_shingles equals the number
    of distinct shingles, Σ df·n_shingles equals the total distinct
    (doc, shingle) incidences, and shares sum to 1 — the partition
    invariants a Counter reference computes directly."""
    from collections import Counter

    from edu_online_spark.operators.textops import shingle_df_spectrum

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        "doc_id long, text string",
    )
    rows = shingle_df_spectrum(docs).collect()
    df_counter = Counter()
    for toks in token_lists:
        grams = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        for g in grams:
            df_counter[g] += 1
    want = Counter(df_counter.values())  # df -> n_shingles
    got = {r["df"]: r["n_shingles"] for r in rows}
    assert got == dict(want)
    if rows:
        assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-4, max_value=4, allow_nan=False, width=32
            ),
            min_size=2,
            max_size=2,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_norm_deciles_are_true_order_statistics(spark, vecs):
    """For ANY vector set: every reported decile is EXACTLY the
    element of the sorted norm² list at rank ceil(k·n/10) — computed
    with the identical per-row sorted-square fold in Python — and
    min/max bracket them."""
    from edu_online_spark.operators.similarity import norm_deciles

    emb = spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    [r] = norm_deciles(emb).collect()
    import struct

    def f32(x):  # the float32 the array column actually stores
        return struct.unpack("f", struct.pack("f", x))[0]

    norms = sorted(
        sum(sorted(f32(x) * f32(x) for x in v)) for v in vecs
    )
    n = len(norms)
    assert r["n_vecs"] == n
    assert r["min_norm2"] == norms[0] and r["max_norm2"] == norms[-1]
    for k in range(1, 10):
        pos = (k * n + 9) // 10
        assert r[f"d{k}"] == norms[pos - 1], (k, n)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3000),  # returns scaled later
            st.integers(min_value=1, max_value=3000),  # lines
        ),
        min_size=1,
        max_size=12,
    )
)
def test_wilson_interval_invariants(spark, pairs):
    """For ANY (returns ≤ lines) population: the interval brackets p̂,
    stays in [0,1], narrows with n at fixed p̂, and equals the same
    formula evaluated in Python with the identical operand order."""
    import math

    from edu_online_spark.operators.analytics import (
        WILSON_Z,
        supplier_return_rate_wilson,
    )

    sup = [(k, min(r, n), n) for k, (r, n) in enumerate(pairs)]
    rows = [
        (k, "R" if i < r else "N")
        for k, r, n in sup
        for i in range(n)
    ]
    li = spark.createDataFrame(
        [(k, f) for k, f in rows], "l_suppkey long, l_returnflag string"
    )
    out = {r["l_suppkey"]: r for r in
           supplier_return_rate_wilson(li).collect()}
    z2 = WILSON_Z * WILSON_Z
    for k, r, n in sup:
        g = out[k]
        p = r / n
        center = p + z2 / (2.0 * n)
        margin = WILSON_Z * math.sqrt(
            p * (1.0 - p) / n + z2 / (4.0 * n * n)
        )
        denom = 1.0 + z2 / n
        assert g["p_hat"] == p
        assert g["wilson_lb"] == (center - margin) / denom
        assert g["wilson_ub"] == (center + margin) / denom
        # bracketing holds to the ulp: at p̂ = 1 the fp sqrt puts the
        # upper bound one ulp BELOW the exact 1.0 (and symmetrically
        # at p̂ = 0), so the interval test carries a 1e-12 slack while
        # the value-equality asserts above stay exact
        assert -1e-12 <= g["wilson_lb"] <= p + 1e-12
        assert p - 1e-12 <= g["wilson_ub"] <= 1 + 1e-12


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=60),  # events per day
        min_size=1,
        max_size=15,
    )
)
def test_mad_anomalies_match_statistics_reference(spark, counts):
    """For ANY daily-count series: median/MAD equal the lower-median
    reference (statistics.median_low on values; deviations likewise),
    the verdict is the pure integer comparison, and robust_z is NULL
    exactly when MAD = 0."""
    import datetime
    from statistics import median_low

    from edu_online_spark.operators.analytics import daily_mad_anomalies

    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1)
                 + datetime.timedelta(days=d, hours=12))
            )
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz")
    got = sorted(daily_mad_anomalies(ev).collect(), key=lambda r: r["day"])
    med = median_low(sorted(counts))
    mad = median_low(sorted(abs(c - med) for c in counts))
    for r, c in zip(got, counts):
        assert (r["cnt"], r["median_cnt"], r["mad"]) == (c, med, mad)
        assert r["is_anomaly"] == (abs(c - med) > 3 * mad)
        if mad == 0:
            assert r["robust_z"] is None
        else:
            assert r["robust_z"] == abs(c - med) / mad


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=25),
    st.integers(min_value=2, max_value=40),
)
def test_cusum_closed_form_matches_page_recursion(spark, counts, slack_den):
    """For ANY daily-count series and slack: the windowed closed form
    Sᵢ = Pᵢ − min(0, min_{j≤i} Pⱼ) equals Page's recursion
    Sᵢ = max(0, Sᵢ₋₁ + aᵢ) run in exact Python ints, on both sides,
    and the alarm is exactly the >total integer comparison."""
    import datetime

    from edu_online_spark.operators.analytics import cusum_level_shift

    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1)
                 + datetime.timedelta(days=d, hours=12))
            )
            eid += 1
    if not rows:
        return
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz")
    got = sorted(
        cusum_level_shift(ev, slack_den=slack_den).collect(),
        key=lambda r: r["day"],
    )
    # empty days vanish from the groupBy: recompute on surviving days
    live = [c for c in counts if c > 0]
    n = len(live)
    total = sum(live)
    slack = total // slack_den
    s_pos = s_neg = 0
    for r, c in zip(got, live):
        dev = c * n - total
        s_pos = max(0, s_pos + dev - slack)
        s_neg = max(0, s_neg + (-dev) - slack)
        assert (r["cnt"], r["cusum_pos"], r["cusum_neg"]) == (c, s_pos, s_neg)
        assert r["shift_flag"] == (s_pos > total or s_neg > total)


@settings(max_examples=8, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.data(),
)
def test_ab_ztest_matches_python_formula(spark, n_a, n_b, data):
    """For ANY cohort sizes and conversion patterns: the z statistic
    equals the pooled-variance formula evaluated in the identical
    operand order in Python doubles, and the degenerate pooled
    variance yields (NULL z, FALSE significant)."""
    import datetime
    import math

    from edu_online_spark.operators.analytics import ab_conversion_ztest

    conv_a = data.draw(st.integers(min_value=0, max_value=n_a))
    conv_b = data.draw(st.integers(min_value=0, max_value=n_b))
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # users 2i are variant A, 2i+1 variant B; one event per user whose
    # own first_ts window trivially contains it
    for i in range(n_a):
        rows.append((eid, 2 * i, "purchase" if i < conv_a else "click", t0))
        eid += 1
    for i in range(n_b):
        rows.append(
            (eid, 2 * i + 1, "purchase" if i < conv_b else "click", t0)
        )
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz"
    )
    r = ab_conversion_ztest(ev).first()
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (
        n_a, conv_a, n_b, conv_b,
    )
    p_a = conv_a / n_a
    p_b = conv_b / n_b
    p_pool = (conv_a + conv_b) / (n_a + n_b)
    var = (p_pool * (1.0 - p_pool)) * (1.0 / n_a + 1.0 / n_b)
    if var > 0:
        z = (p_a - p_b) / math.sqrt(var)
        assert r["z"] == z
        assert r["significant"] == (abs(z) > 1.96)
    else:
        assert r["z"] is None
        assert r["significant"] is False


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.sampled_from("a bb ccc dd e ff g hh iii jj".split()),
        min_size=1,
        max_size=120,
    ),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=1, max_value=6),
)
def test_token_heavy_hitters_match_counter_reference(
    spark, words, capacity, parts
):
    """For ANY token stream, capacity, and partitioning: the two-pass
    Misra-Gries operator returns EXACTLY the tokens whose share
    exceeds 1/capacity, each with its exact count — the candidate
    pass is a lossless superset generator."""
    from collections import Counter

    from edu_online_spark.operators.textops import token_heavy_hitters

    docs = [
        (i, " ".join(words[i * 7:(i + 1) * 7]))
        for i in range((len(words) + 6) // 7)
    ]
    docs = [(i, t) for i, t in docs if t]
    exact = Counter(w for _, t in docs for w in t.split())
    n = sum(exact.values())
    want = {t: c for t, c in exact.items() if c * capacity > n}
    df = spark.createDataFrame(
        docs, "doc_id long, text string"
    ).repartition(parts)
    got = {
        r["token"]: r["cnt"]
        for r in token_heavy_hitters(df, capacity=capacity).collect()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(
                st.integers(min_value=-3, max_value=3),
                min_size=3,
                max_size=3,
            ).filter(lambda v: any(v)),
            st.integers(min_value=0, max_value=2),
        ),
        min_size=3,
        max_size=12,
    )
)
def test_label_ndcg_matches_python_reference(spark, items):
    """For ANY small labeled vector set: ranking, hit structure, DCG
    (sorted sequential fold), IDCG prefix lookup, and the final ndcg
    all equal a pure-Python reference that replicates the operator's
    exact fold order — bit-for-bit, including tie-breaks by nid."""
    import math

    from edu_online_spark.operators.similarity import (
        NDCG_DISCOUNTS,
        NDCG_IDCG,
        NDCG_K,
        label_ndcg,
    )

    vecs = [[float(x) for x in v] for v, _ in items]
    labels = [lab for _, lab in items]
    n_queries = min(2, len(items))

    def fold(vals):
        acc = 0.0
        for v in vals:
            acc = acc + v
        return acc

    def cos(a, b):
        return fold(x * y for x, y in zip(a, b)) / (
            math.sqrt(fold(x * x for x in a))
            * math.sqrt(fold(y * y for y in b))
        )

    emb = spark.createDataFrame(
        [(i, vecs[i], labels[i]) for i in range(len(items))],
        "vec_id long, embedding array<float>, label int",
    )
    got = {r["qid"]: r for r in label_ndcg(emb, n_queries=n_queries).collect()}
    assert set(got) == set(range(n_queries))
    for qid in range(n_queries):
        scored = sorted(
            (
                (-cos(vecs[qid], vecs[nid]), nid)
                for nid in range(len(items))
                if nid != qid
            ),
        )
        top = scored[:NDCG_K]
        hit_ranks = [
            i + 1
            for i, (_, nid) in enumerate(top)
            if labels[nid] == labels[qid]
        ]
        dcg = fold(sorted(NDCG_DISCOUNTS[r] for r in hit_ranks))
        n_rel = sum(1 for x in labels if x == labels[qid]) - 1
        idcg = NDCG_IDCG[min(n_rel, NDCG_K)]
        r = got[qid]
        assert (r["n_relevant"], r["n_hits"]) == (n_rel, len(hit_ranks))
        assert r["dcg"] == dcg
        assert r["idcg"] == idcg
        if idcg > 0:
            assert r["ndcg"] == dcg / idcg
        else:
            assert r["ndcg"] is None


@settings(max_examples=8, deadline=None)
@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ).filter(lambda p: p[0] < p[1]),
        max_size=16,
    )
)
def test_pair_transitivity_matches_bruteforce(spark, edges):
    """For ANY simple graph on <=8 vertices: edges/wedges/triangles
    equal the brute-force Python census and transitivity is exactly
    3T/W (NULL on a wedge-free graph)."""
    from itertools import combinations

    from edu_online_spark.operators.dedup import pair_transitivity

    docs = spark.createDataFrame(
        [(i, "x") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        sorted(edges) or [(0, 0)], "doc_a long, doc_b long"
    )
    if not edges:
        pairs = pairs.filter(F.col("doc_a") != 0)
    r = pair_transitivity(docs, pairs=pairs).first()
    adj = {v: set() for v in range(8)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    wedges = sum(
        len(adj[v]) * (len(adj[v]) - 1) // 2 for v in adj
    )
    tris = sum(
        1
        for a, b, c in combinations(range(8), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    assert (r["n_edges"], r["n_wedges"], r["n_triangles"]) == (
        len(edges), wedges, tris,
    )
    if wedges:
        assert r["transitivity"] == 3.0 * tris / wedges
    else:
        assert r["transitivity"] is None


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["en", "es", "de", "fr", "zh"]),
            st.sampled_from(["the", "el", "der", "le", "的", "zzz"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_lang_kappa_matches_python_reference(spark, items):
    """For ANY (gold, single-marker text) assignment: the confusion
    counts, p0, the sorted-fold pe, and kappa equal a pure-Python
    same-order reference. Single-marker texts make the prediction
    deterministic (one hit for that language, zero for the rest;
    'zzz' -> 'und')."""
    from collections import Counter

    from edu_online_spark.operators.textops import lang_kappa

    marker_to_lang = {
        "the": "en", "el": "es", "der": "de", "le": "fr",
        "的": "zh", "zzz": "und",
    }
    docs = spark.createDataFrame(
        [(i, text, gold) for i, (gold, text) in enumerate(items)],
        "doc_id long, text string, lang string",
    )
    r = lang_kappa(docs).first()
    golds = [g for g, _ in items]
    preds = [marker_to_lang[t] for _, t in items]
    n = len(items)
    agree = sum(1 for g, p in zip(golds, preds) if g == p)
    rowm, colm = Counter(golds), Counter(preds)
    products = sorted(
        (rowm[k] / n) * (colm[k] / n) for k in rowm if k in colm
    )
    pe = 0.0
    for p in products:
        pe = pe + p
    po = agree / n
    assert (r["n_docs"], r["n_agree"]) == (n, agree)
    assert r["po"] == po
    assert r["pe"] == pe
    if pe < 1.0:
        assert r["kappa"] == (po - pe) / (1.0 - pe)
    else:
        assert r["kappa"] is None


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["the", "and", "xx", "yy", "zz"]),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_quality_spearman_matches_python_reference(spark, word_lists):
    """For ANY corpus of stopword/noise mixes: the tie-broken ranks,
    the exact d-squared sum, and rho equal a pure-Python reference
    that replicates the operator's score, rank, and operand order."""
    from edu_online_spark.operators.textops import quality_length_spearman

    texts = [" ".join(ws) for ws in word_lists]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    r = quality_length_spearman(docs).first()

    stop = {"the", "a", "an", "and", "or", "of", "to", "in", "is", "it"}
    feats = []
    for i, t in enumerate(texts):
        toks = t.strip().split()
        n_chars = len(t)
        q = (sum(1 for w in toks if w in stop) / len(toks)) - (0.0 / n_chars)
        feats.append((i, n_chars, q))
    by_q = sorted(feats, key=lambda f: (f[2], f[0]))
    by_l = sorted(feats, key=lambda f: (f[1], f[0]))
    r_q = {f[0]: i + 1 for i, f in enumerate(by_q)}
    r_l = {f[0]: i + 1 for i, f in enumerate(by_l)}
    n = len(texts)
    d2 = sum((r_q[i] - r_l[i]) ** 2 for i in range(n))
    assert (r["n_docs"], r["sum_d2"]) == (n, float(d2))
    if n > 1:
        assert r["rho"] == 1.0 - (6.0 * float(d2)) / (
            float(n) * (float(n) * float(n) - 1.0)
        )
    else:
        assert r["rho"] is None


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["click", "view"]),
            st.sampled_from(["d1", "d2", "d3"]),
            st.integers(min_value=0, max_value=5),
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_l_diversity_matches_counter_reference(spark, rows, l):
    """For ANY event layout and l: the diversity spectrum equals the
    per-class distinct-count Counter reference exactly."""
    from collections import Counter, defaultdict

    from edu_online_spark.operators.pii import l_diversity_report

    df = spark.createDataFrame(
        rows, "event_type string, day string, user_id long"
    )
    got = {
        r["n_distinct_sensitive"]: (r["n_classes"], r["violates_l"])
        for r in l_diversity_report(
            df, ["event_type", "day"], "user_id", l=l
        ).collect()
    }
    per_class = defaultdict(set)
    for t, d, u in rows:
        per_class[(t, d)].add(u)
    spectrum = Counter(len(v) for v in per_class.values())
    want = {div: (cnt, div < l) for div, cnt in spectrum.items()}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C"]),
            st.lists(
                st.sampled_from(["x", "y", "z", "w", "v"]),
                min_size=1,
                max_size=8,
            ),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_source_token_tvd_matches_counter_reference(spark, docs):
    """For ANY multi-source corpus: each source's TVD against the rest
    equals the exact-integer Counter reference with the identical
    final operand order (float(sd) / ((2·n)·m))."""
    from collections import Counter

    from edu_online_spark.operators.textops import source_token_tvd

    df = spark.createDataFrame(
        [(i, " ".join(ws), s) for i, (s, ws) in enumerate(docs)],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in source_token_tvd(df).collect()}
    per_src = {}
    for s, ws in docs:
        per_src.setdefault(s, Counter()).update(ws)
    total = Counter()
    for c in per_src.values():
        total.update(c)
    n_all = sum(total.values())
    assert set(got) == set(per_src)
    for s, cnt in per_src.items():
        n = sum(cnt.values())
        m = n_all - n
        sd = sum(
            abs(cnt.get(t, 0) * m - (total[t] - cnt.get(t, 0)) * n)
            for t in total
        )
        r = got[s]
        assert (r["n_tokens"], r["n_rest_tokens"]) == (n, m)
        if n > 0 and m > 0:
            assert r["tvd"] == float(sd) / ((2.0 * float(n)) * float(m))
        else:
            assert r["tvd"] is None


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),   # first-seen day
            st.one_of(
                st.none(),
                st.integers(min_value=0, max_value=20),  # purchase offset
            ),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_activation_survival_matches_python_km(spark, users):
    """For ANY set of user timelines: the KM table (at-risk counts,
    events, censored, and the sequential-fold survival) equals a
    pure-Python Kaplan-Meier with the same integer day arithmetic,
    horizon truncation, and fold order."""
    import datetime
    from collections import Counter

    from edu_online_spark.operators.analytics import (
        SURVIVAL_HORIZON_DAYS,
        activation_survival,
    )

    d0 = datetime.datetime(2024, 5, 1, 12, 0, 0)
    rows = []
    eid = 0
    for uid, (first_day, off) in enumerate(users):
        rows.append(
            (eid, uid, "view", d0 + datetime.timedelta(days=first_day))
        )
        eid += 1
        if off is not None:
            rows.append(
                (eid, uid, "purchase",
                 d0 + datetime.timedelta(days=first_day + off))
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz"
    )
    got = sorted(
        activation_survival(ev).collect(), key=lambda r: r["t_days"]
    )
    # python reference
    h = SURVIVAL_HORIZON_DAYS
    end_day = max(
        fd + (off or 0) for fd, off in users
    )
    times = []
    for fd, off in users:
        cens = min(end_day - fd, h)
        if off is not None and off <= cens:
            times.append((off, 1))
        else:
            times.append((cens, 0))
    d = Counter(t for t, e in times if e)
    c = Counter(t for t, e in times if not e)
    days = sorted(set(d) | set(c))
    surv = 1.0
    want = []
    for t in days:
        n_risk = sum(1 for tt, _ in times if tt >= t)
        f = float(n_risk - d.get(t, 0)) / float(n_risk)
        surv = surv * f
        want.append((t, n_risk, d.get(t, 0), c.get(t, 0), surv))
    assert [
        (r["t_days"], r["n_at_risk"], r["d_events"], r["c_censored"],
         r["survival"])
        for r in got
    ] == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),      # user id
            st.integers(min_value=-50, max_value=50),   # integer value
        ),
        min_size=1,
        max_size=30,
    )
)
def test_ab_mannwhitney_matches_python_reference(spark, items):
    """For ANY event/value layout (ties included — broken by
    event_id, the documented permutation-rank variant): counts, rank
    sum, U, and z equal the same-order Python reference."""
    import datetime
    import math

    from edu_online_spark.operators.analytics import ab_value_mannwhitney

    t0 = datetime.datetime(2024, 5, 1)
    rows = [
        (i, u, "view", float(v), t0) for i, (u, v) in enumerate(items)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, value double,"
        " ts timestamp_ntz",
    )
    r = ab_value_mannwhitney(ev).first()
    order = sorted(range(len(items)), key=lambda i: (items[i][1], i))
    rank = {i: pos + 1 for pos, i in enumerate(order)}
    a_idx = [i for i, (u, _) in enumerate(items) if u % 2 == 0]
    b_idx = [i for i, (u, _) in enumerate(items) if u % 2 == 1]
    n_a, n_b = len(a_idx), len(b_idx)
    ra = sum(rank[i] for i in a_idx)
    assert (r["n_a"], r["n_b"]) == (n_a, n_b)
    if n_a and n_b:
        u_a = float(ra) - (float(n_a) * (float(n_a) + 1.0)) / 2.0
        mu = (float(n_a) * float(n_b)) / 2.0
        var = (float(n_a) * float(n_b) * (float(n_a) + float(n_b) + 1.0)) / 12.0
        z = (u_a - mu) / math.sqrt(var)
        assert r["u_a"] == u_a
        assert r["z"] == z
        assert r["significant"] == (abs(z) > 1.96)
    else:
        assert r["u_a"] is None and r["z"] is None
        assert r["significant"] is False


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=-20, max_value=20),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_ab_ks_matches_python_reference(spark, items):
    """For ANY layout (cross-variant ties included): the KS statistic
    equals the value-grain ECDF reference computed in exact integers,
    and the verdict matches the fixed-literal critical comparison."""
    import datetime
    import math
    from collections import Counter

    from edu_online_spark.operators.analytics import (
        KS_C_95,
        ab_value_ks_test,
    )

    t0 = datetime.datetime(2024, 5, 1)
    ev = spark.createDataFrame(
        [(i, u, "v", float(v), t0) for i, (u, v) in enumerate(items)],
        "event_id long, user_id long, event_type string, value double,"
        " ts timestamp_ntz",
    )
    r = ab_value_ks_test(ev).first()
    a = Counter(v for u, v in items if u % 2 == 0)
    b = Counter(v for u, v in items if u % 2 == 1)
    n_a, n_b = sum(a.values()), sum(b.values())
    assert (r["n_a"], r["n_b"]) == (n_a, n_b)
    if n_a and n_b:
        cum_a = cum_b = 0
        d_num = 0
        for v in sorted(set(a) | set(b)):
            cum_a += a.get(v, 0)
            cum_b += b.get(v, 0)
            d_num = max(d_num, abs(cum_a * n_b - cum_b * n_a))
        d_stat = float(d_num) / (float(n_a) * float(n_b))
        crit = KS_C_95 * math.sqrt(
            (float(n_a) + float(n_b)) / (float(n_a) * float(n_b))
        )
        assert r["d_stat"] == d_stat
        assert r["ks_crit"] == crit
        assert r["significant"] == (d_stat > crit)
    else:
        assert r["d_stat"] is None
        assert r["significant"] is False


@settings(max_examples=8, deadline=None)
@given(
    st.integers(min_value=0, max_value=40),
    st.integers(min_value=0, max_value=40),
)
def test_ab_srm_matches_python_formula(spark, k_a, k_b):
    """For ANY variant user counts: chi2 equals the same-order Python
    formula and the verdict the fixed-literal comparison."""
    import datetime

    from edu_online_spark.operators.analytics import (
        CHI2_95_DOF1,
        ab_srm_check,
    )

    if k_a + k_b == 0:
        return
    t0 = datetime.datetime(2024, 5, 1)
    uids = [2 * i for i in range(k_a)] + [2 * i + 1 for i in range(k_b)]
    ev = spark.createDataFrame(
        [(i, u, "view", t0) for i, u in enumerate(uids)],
        "event_id long, user_id long, event_type string, ts timestamp_ntz",
    )
    r = ab_srm_check(ev).first()
    e = (float(k_a) + float(k_b)) / 2.0
    chi2 = ((float(k_a) - e) * (float(k_a) - e)) / e + (
        (float(k_b) - e) * (float(k_b) - e)
    ) / e
    assert (r["n_a"], r["n_b"]) == (k_a, k_b)
    assert r["chi2"] == chi2
    assert r["srm_suspect"] == (chi2 > CHI2_95_DOF1)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=-30, max_value=30),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_ab_effect_size_matches_python_reference(spark, items):
    """For ANY integral-value layout: means, micros-exact moments,
    and Cohen's d equal the same-order Python reference."""
    import datetime
    import math

    from edu_online_spark.operators.analytics import ab_value_effect_size

    t0 = datetime.datetime(2024, 5, 1)
    ev = spark.createDataFrame(
        [(i, u, "v", float(v), t0) for i, (u, v) in enumerate(items)],
        "event_id long, user_id long, event_type string, value double,"
        " ts timestamp_ntz",
    )
    r = ab_value_effect_size(ev).first()
    a = [v * 1_000_000 for u, v in items if u % 2 == 0]
    b = [v * 1_000_000 for u, v in items if u % 2 == 1]
    micro = 1_000_000.0
    n_a, n_b = len(a), len(b)
    assert (r["n_a"], r["n_b"]) == (n_a, n_b)
    if n_a:
        assert r["mean_a"] == (float(sum(a)) / float(n_a)) / micro
    if n_b:
        assert r["mean_b"] == (float(sum(b)) / float(n_b)) / micro
    if n_a > 1 and n_b > 1:
        var_a = (
            (float(sum(x * x for x in a))
             - (float(sum(a)) * float(sum(a))) / float(n_a))
            / (float(n_a) - 1.0)
        ) / (micro * micro)
        var_b = (
            (float(sum(x * x for x in b))
             - (float(sum(b)) * float(sum(b))) / float(n_b))
            / (float(n_b) - 1.0)
        ) / (micro * micro)
        pooled = (
            (float(n_a) - 1.0) * var_a + (float(n_b) - 1.0) * var_b
        ) / (float(n_a) + float(n_b) - 2.0)
        if pooled > 0:
            mean_a = (float(sum(a)) / float(n_a)) / micro
            mean_b = (float(sum(b)) / float(n_b)) / micro
            assert r["cohens_d"] == (mean_b - mean_a) / math.sqrt(pooled)
        else:
            assert r["cohens_d"] is None
    else:
        assert r["cohens_d"] is None


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-500, max_value=500),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([1, 7, 32, 1000]),
)
def test_selection_thresholds_match_sorted_reference(spark, vals, width):
    """customer_rfm's bucketed order-statistic helper must equal the
    plain sorted()-index reference for ANY multiset and ANY bucket
    width (including widths that put everything in one bucket or one
    value per bucket), at quartile positions both ascending and
    descending-mirrored."""
    from edu_online_spark.operators.analytics import _selection_thresholds

    rel = spark.createDataFrame([(v,) for v in vals], "v long")
    n = len(vals)
    picks = {
        f"a{k}": f"({k} * n + 3) div 4" for k in (1, 2, 3)
    } | {
        f"d{k}": f"n - ({k} * n + 3) div 4 + 1" for k in (1, 2, 3)
    }
    row = _selection_thresholds(rel, "v", picks, width).first()
    s = sorted(vals)
    for k in (1, 2, 3):
        pos = (k * n + 3) // 4
        assert row[f"a{k}"] == s[pos - 1], (vals, width, k)
        mpos = n - pos + 1
        assert row[f"d{k}"] == s[mpos - 1], (vals, width, k)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-500, max_value=500), min_size=1, max_size=40
    ),
    st.lists(
        st.integers(min_value=-9, max_value=9), min_size=1, max_size=25
    ),
    st.sampled_from([1, 7, 32]),
    st.sampled_from([1, 4, 1000]),
)
def test_selection_thresholds_melted_isolates_metrics(
    spark, xs, ys, wx, wy
):
    """The round-15 melt (customer_rfm, VERDICT r14 #4): several
    metrics with DIFFERENT multisets, bucket widths, and pick
    positions through ONE (metric, value) pipeline must each equal
    their own sorted()-index reference — no cross-metric bleed in the
    histogram, the bucket-prior join, the per-metric totals, or the
    (metric, pick) windows."""
    from pyspark.sql import functions as F

    from edu_online_spark.operators.analytics import (
        _selection_thresholds_melted,
    )

    rel = spark.createDataFrame(
        [("x", float(v)) for v in xs] + [("y", float(v)) for v in ys],
        "metric string, value double",
    )
    nx, ny = len(xs), len(ys)
    row = _selection_thresholds_melted(
        rel,
        {
            # ascending median-ish picks for x, descending for y —
            # exercising per-metric pick expressions over per-metric n
            "x": ({f"x{k}": f"({k} * n + 3) div 4" for k in (1, 3)}, wx),
            "y": ({"y2": "n - (2 * n + 3) div 4 + 1"}, wy),
        },
    ).first()
    sx, sy = sorted(xs), sorted(ys)
    for k in (1, 3):
        assert row[f"x{k}"] == sx[(k * nx + 3) // 4 - 1], (xs, wx, k)
    mpos = ny - (2 * ny + 3) // 4 + 1
    assert row["y2"] == sy[mpos - 1], (ys, wy)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),     # supplier
            st.integers(min_value=100, max_value=99999),  # price cents
            st.integers(min_value=0, max_value=10),    # discount %
        ),
        min_size=1,
        max_size=40,
    )
)
def test_supplier_revenue_gini_matches_decimal_reference(spark, items):
    """The promoted histogram-free Gini must equal the sorted-rank
    identity computed in exact Decimal with the same single double
    casts, for arbitrary line items (ties included — SUM(i·r) is
    permutation-invariant over tied revenues)."""
    from decimal import Decimal

    from edu_online_spark.operators.analytics import supplier_revenue_gini

    lineitem = spark.createDataFrame(
        [
            (s, float(Decimal(c) / 100), float(Decimal(d) / 100))
            for s, c, d in items
        ],
        "l_suppkey long, l_extendedprice double, l_discount double",
    )
    sups = sorted({s for s, _, _ in items})
    supplier = spark.createDataFrame(
        [(s, s % 2) for s in sups], "s_suppkey long, s_nationkey long"
    )
    nation = spark.createDataFrame(
        [(0, "NAT-EVEN"), (1, "NAT-ODD")], "n_nationkey long, n_name string"
    )
    got = {
        r["nation"]: r
        for r in supplier_revenue_gini(lineitem, supplier, nation).collect()
    }

    rev: dict[int, Decimal] = {}
    for s, c, d in items:
        price = (Decimal(c) / 100).quantize(Decimal("0.01"))
        disc = (Decimal(d) / 100).quantize(Decimal("0.01"))
        rev[s] = rev.get(s, Decimal(0)) + price * (1 - disc)
    by_nation: dict[str, list[tuple[Decimal, int]]] = {}
    for s, r in rev.items():
        by_nation.setdefault(
            "NAT-EVEN" if s % 2 == 0 else "NAT-ODD", []
        ).append((r, s))
    for nat, rows in by_nation.items():
        rows.sort()
        n = len(rows)
        total = sum(r for r, _ in rows)
        sum_i_rev = sum(
            Decimal(i + 1) * r for i, (r, _) in enumerate(rows)
        )
        g = got[nat]
        assert g["n_suppliers"] == n
        assert g["total_revenue"] == float(total)
        if total > 0:
            expected = float(
                2 * sum_i_rev - (n + 1) * total
            ) / float(n * total)
            assert g["gini"] == expected, (nat, rows)
        else:
            assert g["gini"] is None


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["SEG-A", "SEG-B"]),
            st.integers(min_value=-99999, max_value=99999),  # cents
        ),
        min_size=1,
        max_size=50,
    )
)
def test_customer_balance_deciles_match_sorted_reference(spark, rows):
    """The promoted histogram-selection deciles must equal the
    sorted-position reference s[ceil(k·n/10) − 1] per segment for
    arbitrary (tied, negative, tiny-n) balance multisets."""
    from edu_online_spark.operators.analytics import customer_balance_deciles

    customer = spark.createDataFrame(
        [(seg, c / 100.0) for seg, c in rows],
        "c_mktsegment string, c_acctbal double",
    )
    got = {
        r["segment"]: r for r in customer_balance_deciles(customer).collect()
    }
    segs: dict[str, list[float]] = {}
    for seg, c in rows:
        segs.setdefault(seg, []).append(c / 100.0)
    for seg, vals in segs.items():
        s = sorted(vals)
        n = len(s)
        g = got[seg]
        assert g["n_customers"] == n
        assert g["min_bal"] == s[0] and g["max_bal"] == s[-1]
        for k in range(1, 10):
            pos = (k * n + 9) // 10
            assert g[f"d{k}"] == s[pos - 1], (seg, k, s)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # class
            st.integers(min_value=0, max_value=6),   # sensitive value
        ),
        min_size=1,
        max_size=60,
    )
)
def test_t_closeness_matches_exact_fraction_reference(spark, pairs):
    """For ANY multiset of (class, value) rows: every per-class TVD
    equals the exact Fraction arithmetic computed independently in
    Python (the decimal numerator is order-free and exact), sits in
    [0, 1], and the integer violation verdict equals the EXACT
    comparison tvd > t — never the double's."""
    from collections import Counter
    from fractions import Fraction

    from edu_online_spark.operators.pii import (
        T_CLOSENESS_DEN,
        T_CLOSENESS_NUM,
        t_closeness_report,
    )

    df = spark.createDataFrame(
        [(f"c{c}", v) for c, v in pairs], "grp string, v long"
    )
    got = {
        r["grp"]: (r["n_rows"], r["sum_abs_dev"], r["tvd"], r["violates_t"])
        for r in t_closeness_report(df, ["grp"], "v").collect()
    }

    n_total = len(pairs)
    glob = Counter(v for _, v in pairs)
    by_class: dict[str, Counter] = {}
    for c, v in pairs:
        by_class.setdefault(f"c{c}", Counter())[v] += 1
    assert set(got) == set(by_class)
    t = Fraction(T_CLOSENESS_NUM, T_CLOSENESS_DEN)
    for grp, cnt in by_class.items():
        n_c = sum(cnt.values())
        num = sum(
            abs(cnt.get(v, 0) * n_total - g * n_c) for v, g in glob.items()
        )
        tvd = Fraction(num, 2 * n_c * n_total)
        n_rows, sum_abs_dev, tvd_d, violates = got[grp]
        assert n_rows == n_c
        assert sum_abs_dev == float(num)
        assert 0 <= tvd <= 1
        assert abs(tvd_d - float(tvd)) < 1e-12
        assert violates == (tvd > t)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=39),  # user
            st.integers(min_value=0, max_value=4),   # event type id
            st.integers(min_value=0, max_value=80),  # hours offset
        ),
        min_size=1,
        max_size=80,
    )
)
def test_ab_fdr_bh_matches_python_reference(spark, events):
    """For ANY event multiset: the whole BH verdict — per-type counts,
    z, m, ranks, and the rejected set — equals an independent Python
    reference implementing the step-up from scratch; and the rejected
    set is ALWAYS a prefix of the |z|-descending rank order (the
    step-up contract)."""
    import datetime
    import math
    import statistics

    from edu_online_spark.operators.analytics import (
        BH_CRIT,
        ab_fdr_bh,
    )

    t0 = datetime.datetime(2024, 5, 1)
    rows = [
        (i, u, f"t{e}", t0 + datetime.timedelta(hours=h))
        for i, (u, e, h) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp_ntz"
    )
    got = {r["event_type"]: r for r in ab_fdr_bh(df).collect()}

    # --- reference, from scratch -----------------------------------
    first = {}
    for _, u, e, h in [(None, u, e, h) for (u, e, h) in events]:
        first[u] = min(first.get(u, h), h)
    users = sorted(first)
    n_a = sum(1 for u in users if u % 2 == 0)
    n_b = len(users) - n_a
    types = sorted({f"t{e}" for _, e, _ in events})
    act = {
        t: {
            u
            for (u, e, h) in events
            if f"t{e}" == t and h < first[u] + 24
        }
        for t in types
    }
    z_ref = {}
    for t in types:
        ca = sum(1 for u in act[t] if u % 2 == 0)
        cb = len(act[t]) - ca
        assert (got[t]["n_a"], got[t]["conv_a"]) == (n_a, ca)
        assert (got[t]["n_b"], got[t]["conv_b"]) == (n_b, cb)
        if n_a == 0 or n_b == 0:
            continue  # whole-arm-empty: var is NULL/0 either way
        p_pool = (ca + cb) / (n_a + n_b)
        var = (p_pool * (1.0 - p_pool)) * (1.0 / n_a + 1.0 / n_b)
        if var > 0:
            z_ref[t] = (ca / n_a - cb / n_b) / math.sqrt(var)
    m = len(z_ref)
    order = sorted(z_ref, key=lambda t: (-abs(z_ref[t]), t))
    k_star = 0
    for k, t in enumerate(order, start=1):
        if abs(z_ref[t]) >= BH_CRIT[m * 100 + k]:
            k_star = max(k_star, k)
    rejected_ref = set(order[:k_star])

    assert {t for t, r in got.items() if r["rejected"]} == rejected_ref
    for t in types:
        if t in z_ref:
            assert got[t]["m_tests"] == m
            assert abs(got[t]["z"] - z_ref[t]) < 1e-9
            assert got[t]["bh_rank"] == order.index(t) + 1
        else:
            assert got[t]["z"] is None and not got[t]["rejected"]
    # step-up contract: rejections are a rank prefix
    ranks = sorted(
        r["bh_rank"] for r in got.values() if r["rejected"]
    )
    assert ranks == list(range(1, len(ranks) + 1))
