"""Mergeable-sketch operators: HLL distinct-count rollups and Theta set
operations (Apache DataSketches, built into Spark 3.5+ as
`hll_sketch_agg` / `theta_sketch_agg` families — JVM-side, codegen'd,
zero Python).

Why sketches are first-class in a 100 TB engine: an exact
COUNT(DISTINCT) shuffles every distinct key once per query, and a
day→month→year rollup of distinct users CANNOT reuse the daily result
(distincts don't add). A sketch is a small mergeable state: daily
sketches union associatively into monthly/yearly estimates without
rescanning the fact table, and partial sketches merge map-side like any
algebraic aggregate. Theta sketches additionally support INTERSECTION
and DIFFERENCE — audience-overlap questions that exact SQL needs a
self-join for, answered from two per-segment sketches.

The reference has no sketches (its distinct logic is exact per-key
state, QzPointStreaming.scala:160-161); these extend the engine the
same way the ANN/dedup modules do.

Oracle strategy ("boolean tolerance"): sketch ESTIMATES are
implementation-specific, so a cross-engine value hash on the estimate
itself is impossible. Instead each query outputs (a) the EXACT answer,
computed in the same Spark job, hash-checked against DuckDB exactly,
and (b) a boolean per estimate asserting |est − exact| ≤ tol·exact,
which the oracle pins to TRUE. The driver's hash therefore fails if
either engine's exact arithmetic drifts OR Spark's estimate leaves its
accuracy envelope — a non-vacuous certification of both paths. The
exact column exists to power that proof; a production rollup would
carry only the sketches.

Tolerances: HLL lgConfigK=12 → RSE ≈ 1.04/√2¹² ≈ 1.6%; theta
lgNomEntries=12 similar. Testdata cardinalities (≤ thousands) sit in
the sketches' exact (sparse) range, so 5% is generous headroom while
still catching any real regression (a broken merge typically over- or
under-counts by far more).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

_TOL = 0.05


def _within(est: F.Column, exact: F.Column, tol: float = _TOL) -> F.Column:
    return (F.abs(est - exact) <= tol * exact) | (exact == 0)


def distinct_users_sketch_rollup(events: DataFrame) -> DataFrame:
    """Per event_type: daily HLL user sketches, merged into the all-time
    estimate via `hll_union_agg` — the hierarchical-rollup pattern
    (day→total here; day→month→year identically). The merge consumes
    the DAILY SKETCHES, not the fact table: at scale the second stage
    reads (event_type × day) rows of ~2 KB state.

    Output: exact distinct users (oracle-checked) + the merged
    estimate's tolerance boolean + n_days as the rollup's fan-in.
    """
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n_days",
            "exact_users",
            _within(F.col("est"), F.col("exact_users")).alias("est_within_5pct"),
        )
    )


def audience_overlap_sketch(events: DataFrame) -> DataFrame:
    """Theta-sketch set algebra: |viewers ∩ purchasers| and
    |viewers \\ purchasers| estimated from ONE scan building two
    per-segment sketches, where exact SQL needs DISTINCT + self-join
    (users_view_and_purchase does exactly that; this is its sketch
    twin). At 100 TB the two sketches are ~32 KB each and the set ops
    are scalar functions on them.

    Conditional sketch inputs via when(): non-matching rows yield NULL,
    which the aggregate skips — one pass, no pre-filtering join.
    """
    sks = events.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "view", F.col("user_id")), 12
        ).alias("sk_v"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id")), 12
        ).alias("sk_p"),
    )
    ests = sks.select(
        F.theta_sketch_estimate(
            F.theta_intersection("sk_v", "sk_p")
        ).alias("est_overlap"),
        F.theta_sketch_estimate(
            F.theta_difference("sk_v", "sk_p")
        ).alias("est_view_only"),
    )
    viewers = events.filter(F.col("event_type") == "view").select("user_id").distinct()
    purchasers = (
        events.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    exact = (
        viewers.intersect(purchasers)
        .agg(F.count("*").alias("exact_overlap"))
        .crossJoin(
            viewers.exceptAll(purchasers).agg(F.count("*").alias("exact_view_only"))
        )
    )
    return ests.crossJoin(exact).select(
        "exact_overlap",
        "exact_view_only",
        _within(F.col("est_overlap"), F.col("exact_overlap")).alias("overlap_within_5pct"),
        _within(F.col("est_view_only"), F.col("exact_view_only")).alias(
            "view_only_within_5pct"
        ),
    )


# Count-Min sketch geometry. WIDTH is deliberately TINY (16 cells per
# row against a ~31-word vocabulary) so hash collisions — the thing a
# CMS trades for its fixed footprint — actually occur and the
# overestimate column is non-zero: a production width (2^20) on this
# corpus would make every estimate exact and the certification vacuous.
# All row hashes are pure integer arithmetic over the polynomial token
# fingerprint, so the DuckDB oracle reproduces every cell bit-for-bit —
# unlike HLL/Theta above, a CMS needs no tolerance boolean.
CMS_DEPTH = 4
CMS_WIDTH = 16
CMS_P = 2_147_483_647
CMS_A = (1_103_515_245, 1_299_709, 104_729, 179_424_673)
CMS_B = (12_345, 7, 31, 127)
CMS_TOPK = 20

# polynomial-fingerprint parameters shared with functions/text.py (the
# oracle interpolates these so the two folds can't drift apart)
from ..functions.text import FINGERPRINT_BASE as _FP_BASE  # noqa: E402
from ..functions.text import FINGERPRINT_MOD as _FP_MOD  # noqa: E402


def _cms_bucket(fp: F.Column, i: int) -> F.Column:
    """Row-i cell index: ((fp·Aᵢ + Bᵢ) mod P) mod WIDTH. fp < 1e9+7 and
    Aᵢ < 2³¹ keep the product under 2⁶¹ — no BIGINT overflow (the same
    domain-reduction discipline as functions.core.hash_bucket)."""
    return F.pmod(F.pmod(fp * F.lit(CMS_A[i]) + F.lit(CMS_B[i]), F.lit(CMS_P)), F.lit(CMS_WIDTH))


def countmin_cells(token_counts: DataFrame) -> DataFrame:
    """(token, cnt) → the d×w CMS cell table (row, bucket, cell_cnt).

    The mergeable core shared by the batch certification query and the
    streaming twin (jobs.token_countmin_job): cells from two inputs
    merge by cell-wise ADDITION, so a groupBy-sum over unioned cell
    tables IS the sketch merge. Reuses a precomputed `fp` column when
    the caller already carries one.
    """
    from ..functions.text import fingerprint

    withfp = (
        token_counts
        if "fp" in token_counts.columns
        else token_counts.withColumn("fp", fingerprint("token"))
    )
    return (
        withfp.select(
            "cnt",
            F.posexplode(
                F.array(*[_cms_bucket(F.col("fp"), i) for i in range(CMS_DEPTH)])
            ).alias("row", "bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cell_cnt"))
    )


def token_countmin(documents: DataFrame, k: int = CMS_TOPK) -> DataFrame:
    """Count-Min frequency sketch over the corpus vocabulary, certified
    against exact counts: build the d×w cell table, then answer point
    queries for the top-k tokens and report the (always ≥ 0)
    overestimate each suffered from collisions.

    The third sketch family (HLL = distinct, Theta = set algebra,
    CMS = frequency): at 100 TB the full token histogram is
    vocabulary-sized state per partition, while the CMS is a FIXED d×w
    integer grid that merges by cell-wise addition — the cell build
    below is a groupBy-sum, i.e. already the map-side-combining merge.
    Cells are fed from per-token counts (equivalent to per-occurrence
    increments, one aggregation cheaper); estimates are the classic
    min over the d cells a token hashes into.
    """
    from ..functions.text import fingerprint, tokens

    counts = (
        documents.select(F.explode(tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("exact_cnt"))
        .withColumn("fp", fingerprint("token"))
        # two consumers below (cells + probes); the relation is
        # vocabulary-sized, so materializing it once is cheap and
        # avoids recomputing the corpus-wide count per branch
        .localCheckpoint(eager=True)
    )
    cells = countmin_cells(counts.select("token", "fp", F.col("exact_cnt").alias("cnt")))
    probes = counts.orderBy(F.desc("exact_cnt"), F.asc("token")).limit(k)
    probe_cells = probes.select(
        "token",
        "exact_cnt",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("fp"), i) for i in range(CMS_DEPTH)])
        ).alias("row", "bucket"),
    )
    return (
        probe_cells.join(cells, ["row", "bucket"])
        .groupBy("token")
        .agg(
            F.first("exact_cnt").alias("exact_cnt"),
            F.min("cell_cnt").alias("cms_est"),
        )
        .select(
            "token",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
        )
    )


KLL_RANK_TOL = 0.05  # estimate must land within ±5pp of exact rank


def price_quantile_sketch_rollup(lineitem: DataFrame) -> DataFrame:
    """Mergeable quantiles (DataSketches KLL, built into Spark as
    `kll_sketch_agg_double` / `kll_merge_agg_double`): per-returnflag
    price sketches PLUS an ALL row whose estimates come from MERGING
    the per-flag sketches — the operation exact quantiles cannot do
    (quantiles don't add; a day→month→year rollup needs either a full
    rescan or a mergeable sketch). This is the quantile counterpart of
    the HLL distinct rollup above, and the same 100 TB argument
    applies: per-partition sketches combine map-side, per-group
    sketches union associatively, state is KB-sized regardless of
    input rows.

    Same boolean-tolerance oracle as the other sketch queries: exact
    percentile_disc quartiles (value SELECTION — engine-portable per
    the COVERAGE.md portability audit) are hash-checked, and each KLL
    estimate is pinned to land between the exact values at rank
    q ± KLL_RANK_TOL — generous headroom over KLL k=200's ~1.65%
    one-sided rank error, loose enough to absorb the sketch's
    randomized compaction, tight enough to catch a broken merge.

    Optimization r16 (guide §1.2 step 1 / §5): the exact audit legs
    were 9 independent `percentile_disc` aggregate instances per scope
    plus 9 over the whole table — EACH buffering every value of its
    group in executor memory (measured 22 s at sf0.1 under the noop
    sink; the count-action bench never evaluated the columns, hiding
    it). All 36 selections now come from ONE pass through the
    two-level histogram-selection pipeline the engine already certifies
    for its other exact order statistics (`_selection_thresholds_melted`
    — no global sort, no full-column buffering, every window partition
    one coarse bucket). Rank semantics are percentile_disc's own:
    fuzz-verified rank = max(1, ceil(q·n)) with IEEE double multiply
    matches `percentile_disc` on 2250 (n, q) combinations — committed as
    tests/test_sketches.py::test_kll_rank_formula_fuzz_2250_group_sizes
    (250 group sizes × the 9 quantile literals the melted spec uses);
    values therefore hash-identically. l_returnflag's domain is fixed by
    the TPC-H spec ({A, N, R}), which the melted spec enumerates; a flag
    absent at tiny SFs just leaves its pick columns unread, and a flag
    OUTSIDE the domain raises (scoped()'s r17 guard +
    test_kll_rollup_rejects_unknown_flag) instead of silently borrowing
    the ALL thresholds."""
    from .analytics import _selection_thresholds_melted

    Q = (0.25, 0.5, 0.75)
    FLAGS = ("A", "N", "R")  # l_returnflag domain, fixed by the TPC-H spec

    def tags():
        for q in Q:
            p = int(q * 100)
            yield f"exact_p{p}", q
            yield f"_lo{p}", max(0.0, q - KLL_RANK_TOL)
            yield f"_hi{p}", min(1.0, q + KLL_RANK_TOL)

    def picks(scope: str) -> dict[str, str]:
        # percentile_disc selects the value at 1-based sorted position
        # ceil(q·n) (q·n in IEEE doubles — fuzz-pinned); qq literals
        # repr-round-trip so e.g. 0.25+0.05 stays 0.30000000000000004,
        # the exact double the old percentile_disc literal carried
        return {
            f"{scope}__{tag}": (
                f"greatest(1, CAST(ceil(CAST({qq!r} AS DOUBLE) "
                f"* CAST(n AS DOUBLE)) AS BIGINT))"
            )
            for tag, qq in tags()
        }

    # melt each price row under its flag metric AND the ALL metric —
    # one pipeline computes all 4 scopes' selections (prices are
    # doubles already; width 4000 over the ~[900, 105000] domain keeps
    # the bucket relation a few dozen rows per metric)
    melted = lineitem.select(
        F.explode(
            F.array(F.col("l_returnflag"), F.lit("ALL"))
        ).alias("metric"),
        F.col("l_extendedprice").cast("double").alias("value"),
    )
    thresholds = F.broadcast(
        _selection_thresholds_melted(
            melted,
            {m: (picks(m), 4000.0) for m in (*FLAGS, "ALL")},
        )
    )

    per = lineitem.groupBy(F.col("l_returnflag").alias("scope")).agg(
        F.count("*").alias("n_rows"),
        F.kll_sketch_agg_double("l_extendedprice").alias("sk"),
    )
    # the ALL row: estimates from the MERGED per-flag sketches (no
    # rescan), exact columns from the shared selection pass
    merged = per.agg(
        F.kll_merge_agg_double("sk").alias("sk"),
        F.sum("n_rows").alias("n_rows"),
    )
    overall = merged.select(F.lit("ALL").alias("scope"), "n_rows", "sk")

    def scoped(tag: str) -> F.Column:
        # Defensive (optimization r17, VERDICT r16 #8): a scope outside
        # the enumerated TPC-H domain would otherwise SILENTLY take the
        # ALL thresholds for its exact columns (the pre-r16
        # percentile_disc form was correct for any domain). Fail loudly
        # instead — evaluated on the 4-row scope relation, so the guard
        # costs nothing.
        col = F.when(F.col("scope") == "ALL", F.col(f"ALL__{tag}"))
        for flag in FLAGS:
            col = col.when(F.col("scope") == flag, F.col(f"{flag}__{tag}"))
        return col.otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "lineitem_price_kll_rollup: l_returnflag value "
                        "outside the TPC-H domain {A,N,R}: "
                    ),
                    F.col("scope"),
                )
            )
        ).alias(tag)

    both = (
        per.select("scope", "n_rows", "sk")
        .unionByName(overall)
        .crossJoin(thresholds)  # broadcast 1-row, 36 columns
        .select(
            "scope",
            "n_rows",
            "sk",
            *[scoped(tag) for tag, _ in tags()],
        )
    )
    est_cols = []
    for q in Q:
        p = int(q * 100)
        est = F.kll_sketch_get_quantile_double("sk", F.lit(q))
        est_cols.append(
            (est >= F.col(f"_lo{p}")) & (est <= F.col(f"_hi{p}"))
        )
    return both.select(
        "scope",
        "n_rows",
        *[F.col(f"exact_p{int(q * 100)}") for q in Q],
        *[
            c.alias(f"est_p{int(q * 100)}_ok")
            for q, c in zip(Q, est_cols)
        ],
    )


BLOOM_M = 1 << 17  # filter bits: ~16 KiB broadcast regardless of corpus size
BLOOM_MULTS = (2654435761, 2246822519, 3266489917)  # k=3 public hash primes


def bloom_membership_audit(
    customer: DataFrame, orders: DataFrame, m: int = BLOOM_M
) -> DataFrame:
    """Bloom-filter join pre-filter, audited: build a k=3/m-bit filter
    over the DISTINCT order-placing customers, probe every customer row
    through it, and emit per probe the bloom verdict NEXT TO the exact
    membership — surfacing the structure's one-sided error (is_fp;
    false negatives are impossible and the hash proves it on every row).

    Why this is a first-class 100 TB primitive: a semi-join against a
    billion-key build side shuffles both relations, but the same
    build side folds into m bits (16 KiB here) that BROADCAST — the
    probe side is then filtered scan-side at ~fpr cost before any real
    join runs. AQE does this for some plans (runtime bloom pushdown);
    this operator is the explicit, engine-portable form.

    Exactness: the k hash functions are the same overflow-safe
    multiplicative family as hash_bucket ((key % 2^31-1) · prime % m —
    products bounded < 2^63), so the filter's BIT SET is a
    deterministic integer relation both engines compute identically.
    The probe path is three broadcast equi-joins on precomputed bit
    columns — no shuffle touches the probe side; only the build side's
    DISTINCT exchanges (members-sized, the thing production amortizes
    by persisting the filter). The exact-membership column is the
    audit leg: a broadcast join here at sf, the very join the filter
    exists to avoid at scale — kept because certifying fpr without it
    would be vacuous.
    """
    members = orders.select(F.col("o_custkey").alias("key")).distinct()

    def bit(col, a):
        return F.pmod(F.pmod(col, F.lit(2147483647)) * F.lit(a), F.lit(m))

    bits = (
        members.select(
            F.explode(
                F.array(*[bit(F.col("key"), a) for a in BLOOM_MULTS])
            ).alias("bit")
        )
        .distinct()
    )
    probes = customer.select(F.col("c_custkey").alias("custkey"))
    out = probes.select(
        "custkey",
        *[
            bit(F.col("custkey"), a).alias(f"_b{i}")
            for i, a in enumerate(BLOOM_MULTS)
        ],
    )
    for i in range(len(BLOOM_MULTS)):
        out = out.join(
            F.broadcast(
                bits.select(
                    F.col("bit").alias(f"_b{i}"), F.lit(True).alias(f"_hit{i}")
                )
            ),
            f"_b{i}",
            "left",
        )
    bloom_hit = F.lit(True)
    for i in range(len(BLOOM_MULTS)):
        bloom_hit = bloom_hit & F.coalesce(F.col(f"_hit{i}"), F.lit(False))
    return (
        out.join(
            F.broadcast(members.withColumn("_em", F.lit(True))),
            out["custkey"] == F.col("key"),
            "left",
        )
        .select(
            "custkey",
            F.coalesce("_em", F.lit(False)).alias("exact_member"),
            bloom_hit.alias("bloom_hit"),
            (bloom_hit & ~F.coalesce("_em", F.lit(False))).alias("is_fp"),
        )
    )


def _q(fn, *tables):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(*[load_table(spark, sf_dir, t) for t in tables])

    return runner


QUERIES = {
    "events_hll_rollup": _q(distinct_users_sketch_rollup, "events"),
    "events_theta_overlap": _q(audience_overlap_sketch, "events"),
    "corpus_token_countmin": _q(token_countmin, "documents"),
    "customers_bloom_prefilter": _q(bloom_membership_audit, "customer", "orders"),
    "lineitem_price_kll_rollup": _q(price_quantile_sketch_rollup, "lineitem"),
}

ORACLE = {
    # Exact columns hash-checked value-for-value; estimate booleans pinned
    # TRUE (see module docstring — this is the non-vacuous form for
    # engine-specific estimators).
    "events_hll_rollup": """
        SELECT event_type,
               COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
               COUNT(DISTINCT user_id) AS exact_users,
               TRUE AS est_within_5pct
        FROM events
        GROUP BY event_type
    """,
    "events_theta_overlap": """
        WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
             p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        SELECT (SELECT COUNT(*) FROM v WHERE user_id IN (SELECT user_id FROM p))
                   AS exact_overlap,
               (SELECT COUNT(*) FROM v WHERE user_id NOT IN (SELECT user_id FROM p))
                   AS exact_view_only,
               TRUE AS overlap_within_5pct,
               TRUE AS view_only_within_5pct
    """,
    # Every cell and every estimate reproduced from the same integer
    # arithmetic — geometry and hash constants interpolated from the
    # module constants so editing them cannot desynchronize the oracle.
    "corpus_token_countmin": f"""
        WITH hashes(i, a, b) AS (VALUES {", ".join(
            f"({i}, {CMS_A[i]}, {CMS_B[i]})" for i in range(CMS_DEPTH)
        )}),
        tok AS (
            SELECT unnest(regexp_split_to_array(trim(text), ' +')) AS token
            FROM documents
        ),
        cnt AS (
            SELECT token, count(*) AS exact_cnt
            FROM tok WHERE token <> '' GROUP BY token
        ),
        fp AS (
            SELECT token, exact_cnt,
                   list_reduce(
                       [ascii(token[i])::BIGINT
                        for i in range(1, length(token) + 1)],
                       (acc, ch) -> (acc * {_FP_BASE} + ch) % {_FP_MOD}
                   ) AS fp
            FROM cnt
        ),
        cells AS (
            SELECT h.i AS row_i,
                   ((f.fp * h.a + h.b) % {CMS_P}) % {CMS_WIDTH} AS bucket,
                   CAST(sum(f.exact_cnt) AS BIGINT) AS cell_cnt
            FROM fp f CROSS JOIN hashes h
            GROUP BY 1, 2
        ),
        probes AS (
            SELECT token, exact_cnt, fp FROM fp
            ORDER BY exact_cnt DESC, token ASC LIMIT {CMS_TOPK}
        )
        SELECT p.token,
               p.exact_cnt,
               min(c.cell_cnt) AS cms_est,
               min(c.cell_cnt) - p.exact_cnt AS overestimate
        FROM probes p
        CROSS JOIN hashes h
        JOIN cells c
          ON c.row_i = h.i
         AND c.bucket = ((p.fp * h.a + h.b) % {CMS_P}) % {CMS_WIDTH}
        GROUP BY p.token, p.exact_cnt
    """,
    # Same k multiplicative hashes over the same domain reduction; the
    # bit SET is a deterministic integer relation, so bloom_hit (all k
    # probe bits present) and is_fp hash exactly. nb counts the probe's
    # k bit-rows that matched the distinct bit set — 3 iff all present,
    # identical to the Spark side's three broadcast bit-joins.
    "customers_bloom_prefilter": f"""
        WITH mults(a) AS (VALUES {", ".join(f"({a})" for a in BLOOM_MULTS)}),
        members AS (SELECT DISTINCT o_custkey AS key FROM orders),
        bits AS (
            SELECT DISTINCT ((key % 2147483647) * a) % {BLOOM_M} AS bit
            FROM members CROSS JOIN mults
        ),
        pb AS (
            SELECT c_custkey AS custkey,
                   ((c_custkey % 2147483647) * a) % {BLOOM_M} AS bit
            FROM customer CROSS JOIN mults
        ),
        hits AS (
            SELECT pb.custkey, count(b.bit) AS nb
            FROM pb LEFT JOIN bits b USING (bit)
            GROUP BY pb.custkey
        )
        SELECT h.custkey,
               h.custkey IN (SELECT key FROM members) AS exact_member,
               h.nb = {len(BLOOM_MULTS)} AS bloom_hit,
               h.nb = {len(BLOOM_MULTS)}
                   AND h.custkey NOT IN (SELECT key FROM members) AS is_fp
        FROM hits h
    """,
    # Exact percentile_disc quartiles hash-checked (value selection —
    # portable per the COVERAGE.md audit); KLL estimates pinned inside
    # their ±5pp exact-rank band as booleans.
    "lineitem_price_kll_rollup": """
        WITH per AS (
            SELECT l_returnflag AS scope, count(*) AS n_rows,
                   percentile_disc(0.25) WITHIN GROUP
                       (ORDER BY l_extendedprice) AS exact_p25,
                   percentile_disc(0.5) WITHIN GROUP
                       (ORDER BY l_extendedprice) AS exact_p50,
                   percentile_disc(0.75) WITHIN GROUP
                       (ORDER BY l_extendedprice) AS exact_p75
            FROM lineitem GROUP BY 1
        ),
        overall AS (
            SELECT 'ALL' AS scope, count(*) AS n_rows,
                   percentile_disc(0.25) WITHIN GROUP
                       (ORDER BY l_extendedprice) AS exact_p25,
                   percentile_disc(0.5) WITHIN GROUP
                       (ORDER BY l_extendedprice) AS exact_p50,
                   percentile_disc(0.75) WITHIN GROUP
                       (ORDER BY l_extendedprice) AS exact_p75
            FROM lineitem
        )
        SELECT scope, n_rows, exact_p25, exact_p50, exact_p75,
               TRUE AS est_p25_ok, TRUE AS est_p50_ok, TRUE AS est_p75_ok
        FROM (SELECT * FROM per UNION ALL SELECT * FROM overall)
    """,
}
