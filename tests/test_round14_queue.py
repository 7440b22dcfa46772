"""Round-14 promotion queue: library ops + audited oracles, landed two
rounds ahead of their window slot (the deferral arithmetic in
COVERAGE.md means r12/r13 are spoken for). Oracle parity at sf0.001
plus fixture tests for the semantics the hash alone can't explain."""

from __future__ import annotations

from pyspark.sql import functions as F

from edu_online_spark.sources import load_table
from tools.parity import compare, run_oracle


# -- supplier_revenue_gini ------------------------------------------------


def test_supplier_revenue_gini_matches_r14_oracle(spark, sf_dir):
    from edu_online_spark.operators.analytics import (
        ORACLE_R14,
        supplier_revenue_gini,
    )

    problems = compare(
        "supplier_revenue_gini",
        supplier_revenue_gini(
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "supplier"),
            load_table(spark, sf_dir, "nation"),
        ),
        run_oracle(ORACLE_R14["supplier_revenue_gini"], sf_dir),
    )
    assert not problems, problems


def test_gini_fixture_known_values():
    """Hand-checkable distributions: perfectly equal revenue -> G = 0;
    one supplier holding everything of value -> G -> (n-1)/n under the
    sorted-rank identity (here with epsilon-free integers: revenues
    [0.01, 0.01, 99.98] give a near-1 concentration, computed exactly)."""
    import datetime

    from edu_online_spark.session import get_spark
    from edu_online_spark.operators.analytics import supplier_revenue_gini

    spark = get_spark()

    def li(suppkey, price):
        return (suppkey, price, 0.0)

    lineitem = spark.createDataFrame(
        # nation EQ: three suppliers, equal revenue
        [li(1, 10.0), li(2, 10.0), li(3, 10.0)]
        # nation SKEW: two tiny, one dominant
        + [li(11, 0.01), li(12, 0.01), li(13, 99.98)],
        "l_suppkey long, l_extendedprice double, l_discount double",
    )
    supplier = spark.createDataFrame(
        [(k, 0) for k in (1, 2, 3)] + [(k, 1) for k in (11, 12, 13)],
        "s_suppkey long, s_nationkey long",
    )
    nation = spark.createDataFrame(
        [(0, "EQ"), (1, "SKEW")], "n_nationkey long, n_name string"
    )
    rows = {
        r["nation"]: r
        for r in supplier_revenue_gini(lineitem, supplier, nation).collect()
    }
    assert rows["EQ"]["gini"] == 0.0
    # sorted x = [0.01, 0.01, 99.98], sum=100, sum_i_x = 0.01+0.02+299.94
    # G = (2*299.97 - 4*100) / (3*100) = 199.94/300
    assert abs(rows["SKEW"]["gini"] - 199.94 / 300) < 1e-12
    assert rows["SKEW"]["n_suppliers"] == 3
    # tie-permutation invariance: equal revenues give the same sum_i_x
    # whatever rank order the engine assigns (G=0 is the proof above)


def test_supplier_revenue_gini_nonpositive_total_is_null():
    """ADVICE r11 guard: a nation whose suppliers aggregate to zero
    revenue must yield NULL (not a division error), and a NEGATIVE
    total (returns-heavy input) must yield NULL rather than a
    silently sign-flipped index. The oracle mirror carries the same
    CASE WHEN total > 0 guard."""
    from edu_online_spark.session import get_spark
    from edu_online_spark.operators.analytics import supplier_revenue_gini

    spark = get_spark()
    lineitem = spark.createDataFrame(
        # ZERO: one supplier, zero-priced items; NEG: net-negative
        # revenue via a >1 discount factor stand-in (price < 0)
        [(1, 0.0, 0.0), (11, -10.0, 0.0), (21, 10.0, 0.0)],
        "l_suppkey long, l_extendedprice double, l_discount double",
    )
    supplier = spark.createDataFrame(
        [(1, 0), (11, 1), (21, 2)], "s_suppkey long, s_nationkey long"
    )
    nation = spark.createDataFrame(
        [(0, "ZERO"), (1, "NEG"), (2, "POS")],
        "n_nationkey long, n_name string",
    )
    rows = {
        r["nation"]: r
        for r in supplier_revenue_gini(lineitem, supplier, nation).collect()
    }
    assert rows["ZERO"]["gini"] is None
    assert rows["NEG"]["gini"] is None
    assert rows["POS"]["gini"] == 0.0  # single supplier, positive total


# -- dedup_cluster_lang_purity --------------------------------------------


def test_cluster_lang_purity_matches_r14_oracle(spark, sf_dir):
    from edu_online_spark.operators.dedup import (
        ORACLE_R14,
        cluster_lang_purity,
    )

    problems = compare(
        "dedup_cluster_lang_purity",
        cluster_lang_purity(load_table(spark, sf_dir, "documents")),
        run_oracle(ORACLE_R14["dedup_cluster_lang_purity"], sf_dir),
    )
    assert not problems, problems


def test_cluster_lang_purity_consistency(spark, sf_dir):
    """Cross-op invariants against the certified closure outputs:
    cluster membership mass matches the size profile, shares are the
    exact rational, and the precomputed-pairs path is identical."""
    from edu_online_spark.operators.dedup import (
        cluster_lang_purity,
        cluster_size_profile,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs).localCheckpoint(eager=True)
    out = cluster_lang_purity(docs, pairs=pairs).collect()
    prof = {
        r["cluster_size"]: r["n_clusters"]
        for r in cluster_size_profile(docs, pairs=pairs).collect()
        if r["cluster_size"] > 1
    }
    sizes: dict[int, int] = {}
    for r in out:
        sizes[r["cluster_size"]] = sizes.get(r["cluster_size"], 0) + 1
        assert 1 <= r["top_lang_cnt"] <= r["cluster_size"]
        assert r["top_lang_share"] == r["top_lang_cnt"] / r["cluster_size"]
        assert r["cross_lang"] == (r["n_langs"] > 1)
        # majority share can't fall below an even split
        assert r["top_lang_cnt"] * r["n_langs"] >= r["cluster_size"]
    assert sizes == prof
    inline = sorted(map(tuple, cluster_lang_purity(docs).collect()))
    assert inline == sorted(map(tuple, out))


# -- multimodal_image_whash -----------------------------------------------


def test_image_whash_matches_r14_oracle(spark, sf_dir):
    """Every Walsh-Hadamard sign bit and the DC mass reproduce from
    the payload generator's formulas — a stride/flip/orientation bug
    anywhere in the decode or transform flips bits and fails here."""
    from edu_online_spark.operators.multimodal import (
        ORACLE_R14,
        q_image_whash,
    )

    problems = compare(
        "multimodal_image_whash",
        q_image_whash(spark, sf_dir),
        run_oracle(ORACLE_R14["multimodal_image_whash"], sf_dir),
    )
    assert not problems, problems


def test_whash_transform_properties(spark, sf_dir):
    """Transform sanity against the certified aHash stage: same assets
    and dimensions; DC equals 64x the grid mean's numerator (the exact
    gray total); a uniform synthetic image has ONLY the DC bit set
    (every AC coefficient exactly 0 -> '0' bits)."""
    from edu_online_spark.operators.multimodal import (
        _bmp_bytes,
        image_whash,
        q_image_ahash,
        q_image_whash,
    )

    wh = {r["asset_id"]: r for r in q_image_whash(spark, sf_dir).collect()}
    ah = {r["asset_id"]: r for r in q_image_ahash(spark, sf_dir).collect()}
    assert set(wh) == set(ah)
    for a, r in wh.items():
        assert (r["width"], r["height"]) == (ah[a]["width"], ah[a]["height"])
        assert r["whash"][0] == "1" and r["dc"] > 0  # DC = total gray mass
        assert r["bits_set"] == r["whash"].count("1")

    # uniform image: constant gray g -> coef = g * sum(H_row) * sum(H_col),
    # zero unless u=v=0. Build a flat-color BMP via the generator's
    # header with a constant-pixel body.
    raw = bytearray(_bmp_bytes(3))
    raw[54:] = bytes([200] * (len(raw) - 54))  # constant channels
    assets = spark.createDataFrame(
        [(1, "image", raw)], "asset_id long, media_type string, payload binary"
    )
    [u] = image_whash(assets).collect()
    assert u["whash"] == "1" + "0" * 63
    assert u["bits_set"] == 1
    assert u["dc"] == 200 * 64


def test_whash_neardup_matches_r14_oracle(spark, sf_dir):
    from edu_online_spark.operators.multimodal import (
        ORACLE_R14,
        q_whash_neardup,
    )

    problems = compare(
        "multimodal_whash_neardup",
        q_whash_neardup(spark, sf_dir),
        run_oracle(ORACLE_R14["multimodal_whash_neardup"], sf_dir),
    )
    assert not problems, problems


def test_consensus_neardup_matches_r14_oracle_and_is_intersection(
    spark, sf_dir
):
    """The consensus relation hash-matches its mirror AND is exactly
    the pair-key intersection of the two single-key relations with
    their hammings carried through."""
    from edu_online_spark.operators.multimodal import (
        ORACLE_R14,
        q_ahash_neardup,
        q_consensus_neardup,
        q_whash_neardup,
    )

    problems = compare(
        "multimodal_consensus_neardup",
        q_consensus_neardup(spark, sf_dir),
        run_oracle(ORACLE_R14["multimodal_consensus_neardup"], sf_dir),
    )
    assert not problems, problems

    cons = {
        (r["asset_a"], r["asset_b"]): (
            r["hamming_spatial"], r["hamming_spectral"])
        for r in q_consensus_neardup(spark, sf_dir).collect()
    }
    ah = {
        (r["asset_a"], r["asset_b"]): r["hamming"]
        for r in q_ahash_neardup(spark, sf_dir).collect()
    }
    wh = {
        (r["asset_a"], r["asset_b"]): r["hamming"]
        for r in q_whash_neardup(spark, sf_dir).collect()
    }
    assert set(cons) == set(ah) & set(wh)
    for k, (hs, hq) in cons.items():
        assert (hs, hq) == (ah[k], wh[k])


# -- customer_balance_deciles ----------------------------------------------


def test_balance_deciles_matches_r14_oracle(spark, sf_dir):
    from edu_online_spark.operators.analytics import (
        ORACLE_R14,
        customer_balance_deciles,
    )

    problems = compare(
        "customer_balance_deciles",
        customer_balance_deciles(load_table(spark, sf_dir, "customer")),
        run_oracle(ORACLE_R14["customer_balance_deciles"], sf_dir),
    )
    assert not problems, problems


def test_balance_deciles_are_order_statistics(spark, sf_dir):
    """Deciles must be the exact sorted-position elements: monotone,
    bracketed by min/max, and equal to a Python sorted-list reference
    per segment (ceil(k*n/10) indexing, duplicates included)."""
    from edu_online_spark.operators.analytics import customer_balance_deciles

    cust = load_table(spark, sf_dir, "customer")
    got = {
        r["segment"]: r
        for r in customer_balance_deciles(cust).collect()
    }
    by_seg: dict[str, list[float]] = {}
    for r in cust.select("c_mktsegment", "c_acctbal").collect():
        by_seg.setdefault(r["c_mktsegment"], []).append(r["c_acctbal"])
    assert set(got) == set(by_seg)
    for seg, vals in by_seg.items():
        vals.sort()
        n = len(vals)
        r = got[seg]
        assert r["n_customers"] == n
        assert r["min_bal"] == vals[0] and r["max_bal"] == vals[-1]
        prev = r["min_bal"]
        for k in range(1, 10):
            want = vals[(k * n + 9) // 10 - 1]
            assert r[f"d{k}"] == want
            assert r[f"d{k}"] >= prev
            prev = r[f"d{k}"]
