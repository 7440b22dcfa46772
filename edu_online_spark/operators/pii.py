"""PII scanning / redaction and URL extraction over the `documents` table.

A training-data pipeline scrubs personally-identifiable information
before a corpus ships; the reference engine has no equivalent (its
inputs are pre-anonymized click logs, `SURVEY.md §2`), so this is pure
extension surface alongside textops/dedup.

Every operator here is a pure column expression (`regexp_count` /
`regexp_replace` / `regexp_extract_all`) — Catalyst keeps them in the
parquet scan stage with zero Python, so at 100 TB the PII pass costs
one corpus read and nothing else. The patterns are deliberately ASCII
RE2-compatible (no lookarounds, no backreferences) so the DuckDB
oracles run the *same* regexes, not a translation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

# Pattern table: name -> (regex, redaction token). Ordered — redaction
# applies top to bottom, and the order matters (an email must be
# redacted before the bare-domain URL pass could chew on its host part;
# ipv4 before phone so `1.2.3.4`'s digit runs never half-match).
# All patterns are valid and equivalent under both Java regex (Spark)
# and RE2 (DuckDB): \b, \d, \s, char classes and bounded repetition
# only.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # the trailing \b matters beyond taste: every pattern ending on a
    # boundary leaves the char AFTER a replacement's context unchanged,
    # which is what makes the redaction chain idempotent (property-
    # tested) — without it, `a@b.co1.2.3.4` redacts to `[EMAIL]1.2.3.4`
    # whose IP only becomes matchable on a second pass.
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("id_number", r"\b\d{3}-\d{2}-\d{4}\b", "[ID]"),
    ("phone", r"(\(\d{3}\) ?|\b\d{3}[-.])\d{3}[-.]\d{4}\b", "[PHONE]"),
]

URL_PATTERN = r"https?://[^\s]+"
URL_DOMAIN_PATTERN = r"https?://([^/\s:]+)"


def _count(col: str, pat: str) -> Column:
    return F.regexp_count(F.col(col), F.lit(pat))


def pii_scan(documents: DataFrame, keep: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """Per-document PII hit counts, one column per pattern class.

    Scan-stage column expressions; the downstream filter
    (`pii_total = 0` → clean corpus) pushes into the same stage.
    `keep` carries passthrough columns so callers never re-join the
    corpus to itself to get them back.
    """
    d = documents.select(
        *keep,
        *[_count("text", pat).alias(f"n_{name}") for name, pat, _ in PII_PATTERNS],
    )
    total = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return d.withColumn("n_pii_total", total)


def pii_source_stats(documents: DataFrame) -> DataFrame:
    """Per-source PII exposure report — the go/no-go table a release
    review reads: how many documents in each source leak anything, and
    what kind. One projection + single shuffle on `source` after
    map-side combine; no join anywhere."""
    scanned = pii_scan(documents, keep=("doc_id", "source"))
    return scanned.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("n_pii_total") > 0).cast("long")).alias("docs_with_pii"),
        *[
            F.sum(f"n_{name}").alias(f"n_{name}")
            for name, _, _ in PII_PATTERNS
        ],
        F.sum("n_pii_total").alias("n_pii_total"),
    )


def pii_redact(documents: DataFrame) -> DataFrame:
    """Redacted corpus: every PII match replaced with its class token.

    Replacement chain is a single projection — Catalyst fuses the four
    `regexp_replace`s into one codegen stage, so this is still one
    corpus scan. `n_redactions` is counted BEFORE redaction (the token
    text would otherwise perturb later patterns' counts).
    """
    redacted = F.col("text")
    n_hits = None
    for _, pat, _ in PII_PATTERNS:
        c = _count("text", pat)
        n_hits = c if n_hits is None else n_hits + c
    for _, pat, token in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, token)
    return documents.select(
        "doc_id",
        n_hits.alias("n_redactions"),
        redacted.alias("text_clean"),
    )


def url_domains(documents: DataFrame) -> DataFrame:
    """Domain frequency table over all URLs in the corpus — the base
    relation for domain-level quality weighting and blocklist filtering
    (a C4/RefinedWeb-style curation stage).

    explode(regexp_extract_all) → wordcount shape: map-side combine
    collapses each partition to its distinct domains before the single
    shuffle on `domain`.
    """
    urls = documents.select(
        F.explode(F.regexp_extract_all("text", F.lit(URL_PATTERN), F.lit(0))).alias(
            "url"
        )
    )
    return (
        urls.select(
            F.lower(F.regexp_extract("url", URL_DOMAIN_PATTERN, 1)).alias("domain")
        )
        .filter(F.col("domain") != "")
        .groupBy("domain")
        .agg(F.count("*").alias("n_urls"))
    )


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
    pair_counts: DataFrame | None = None,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: the size
    distribution of QI equivalence classes, flagging classes smaller
    than k (each such class re-identifies its members) — the release
    gate that complements record-level PII scrubbing.

    Two aggregations: per-class sizes (one shuffle on the QI — map-side
    combined), then a |distinct sizes|-row summary. Nothing scales with
    row count after the first aggregate. `pair_counts` accepts a
    precomputed (qi…, sv, n_cu) relation (the privacy_audit_job fold /
    the trio-sharing hook) — class sizes are then its per-class count
    sums and the default corpus path is untouched.
    """
    if pair_counts is not None:
        classes = pair_counts.groupBy(*qi_cols).agg(
            F.sum("n_cu").cast("long").alias("class_size")
        )
    else:
        classes = df.groupBy(*qi_cols).agg(
            F.count("*").alias("class_size")
        )
    return (
        classes.groupBy("class_size")
        .agg(F.count("*").alias("n_classes"))
        .select(
            "class_size",
            "n_classes",
            (F.col("class_size") < k).alias("violates_k"),
        )
    )


# ---------------------------------------------------------------------------
# Synthetic PII sowing (oracle-input enrichment)
# ---------------------------------------------------------------------------
#
# The driver's sf corpora contain no organic PII or URLs (verified in
# round 3: zero matches for every pattern), which made the cross-engine
# checks for these operators vacuous — both engines agreed on a no-op.
# The registry queries therefore SOW deterministic synthetic PII into
# the text before scanning/redacting: emails, IPs, SSN-shaped ids,
# phones, and URLs derived arithmetically from doc_id, mirrored exactly
# in the oracle SQL (same trick multimodal.synth_assets uses for
# payloads). Moduli are chosen coprime-ish so documents carry every
# subset of classes, including none (doc_id odd & indivisible by
# 3/5/7/11 gets nothing) — the hash now witnesses real, varied
# redactions. The pure operators below stay sow-free for library use.

def sow_pii(documents: DataFrame) -> DataFrame:
    """Append deterministic synthetic PII/URLs to each document's text.

    Keep in lockstep with _SOWN_SQL — the parity gate compares the two
    engines' results string-for-string, so any drift fails loudly.
    """
    did = F.col("doc_id")

    def s(col: Column) -> Column:
        return col.cast("string")

    def lp(col: Column, n: int) -> Column:
        return F.lpad(s(col), n, "0")

    email = F.when(
        did % 3 == 0,
        F.concat(
            F.lit(" user"), s(did), F.lit("@example"), s(did % 7), F.lit(".com")
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 5 == 0,
        F.concat(
            F.lit(" 10."),
            s(did % 256),
            F.lit("."),
            s((did * 3) % 256),
            F.lit("."),
            s((did * 7) % 251),
        ),
    ).otherwise(F.lit(""))
    idnum = F.when(
        did % 7 == 0,
        F.concat(
            F.lit(" "),
            lp(did % 1000, 3),
            F.lit("-"),
            lp(did % 100, 2),
            F.lit("-"),
            lp((did * 9) % 10000, 4),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 11 == 0,
        F.concat(
            F.lit(" "),
            s((did % 900) + 100),
            F.lit("-"),
            lp((did * 3) % 1000, 3),
            F.lit("-"),
            lp((did * 7) % 10000, 4),
        ),
    ).otherwise(F.lit(""))
    url = F.when(
        did % 2 == 0,
        F.concat(
            F.lit(" https://site"),
            s(did % 23),
            F.lit(".example.org/p/"),
            s(did),
        ),
    ).otherwise(F.lit(""))
    return documents.withColumn(
        "text", F.concat(F.col("text"), email, ip, idnum, phone, url)
    )


# DuckDB mirror of sow_pii — same arithmetic, same string layout.
_SOWN_SQL = """
    SELECT doc_id, source,
           text
           || CASE WHEN doc_id % 3 = 0
                THEN ' user' || CAST(doc_id AS VARCHAR)
                     || '@example' || CAST(doc_id % 7 AS VARCHAR) || '.com'
                ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                THEN ' 10.' || CAST(doc_id % 256 AS VARCHAR)
                     || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)
                     || '.' || CAST((doc_id * 7) % 251 AS VARCHAR)
                ELSE '' END
           || CASE WHEN doc_id % 7 = 0
                THEN ' ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                     || '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                     || '-' || lpad(CAST((doc_id * 9) % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
           || CASE WHEN doc_id % 11 = 0
                THEN ' ' || CAST((doc_id % 900) + 100 AS VARCHAR)
                     || '-' || lpad(CAST((doc_id * 3) % 1000 AS VARCHAR), 3, '0')
                     || '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
           || CASE WHEN doc_id % 2 = 0
                THEN ' https://site' || CAST(doc_id % 23 AS VARCHAR)
                     || '.example.org/p/' || CAST(doc_id AS VARCHAR)
                ELSE '' END
           AS text
    FROM documents
"""


# ---------------------------------------------------------------------------
# Oracle-checked query registry
# ---------------------------------------------------------------------------

def _q(fn):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_table(spark, sf_dir, "documents"))

    return runner


def _q_sown(fn):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(sow_pii(load_table(spark, sf_dir, "documents")))

    return runner


def _q_events_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    qi = events.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    return k_anonymity_report(qi, ["event_type", "day"])


QUERIES = {
    "text_pii_source_stats": _q_sown(pii_source_stats),
    "text_pii_redacted": _q_sown(pii_redact),
    "text_url_domains": _q_sown(url_domains),
    "events_k_anonymity": _q_events_kanon,
}


def _count_sql(name: str, pat: str) -> str:
    # CAST AS INTEGER: Spark's regexp_count is int32; the driver's
    # value-hash gate is type-exact.
    return f"CAST(len(regexp_extract_all(text, '{pat}')) AS INTEGER) AS n_{name}"


_SCAN_CTE = f"""
    SELECT doc_id, source, text,
           {', '.join(_count_sql(n, p) for n, p, _ in PII_PATTERNS)},
           CAST({' + '.join(f"len(regexp_extract_all(text, '{p}'))" for _, p, _ in PII_PATTERNS)}
               AS INTEGER) AS n_pii_total
    FROM ({_SOWN_SQL})
"""

_REDACT_EXPR = "text"
for _, _pat, _token in PII_PATTERNS:
    _REDACT_EXPR = f"regexp_replace({_REDACT_EXPR}, '{_pat}', '{_token}', 'g')"

ORACLE = {
    "text_pii_source_stats": f"""
        WITH s AS ({_SCAN_CTE})
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN n_pii_total > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_with_pii,
               {', '.join(f'CAST(sum(n_{n}) AS BIGINT) AS n_{n}' for n, _, _ in PII_PATTERNS)},
               CAST(sum(n_pii_total) AS BIGINT) AS n_pii_total
        FROM s GROUP BY source
    """,
    "text_pii_redacted": f"""
        WITH s AS ({_SCAN_CTE})
        SELECT doc_id, n_pii_total AS n_redactions,
               {_REDACT_EXPR} AS text_clean
        FROM s
    """,
    "events_k_anonymity": """
        WITH classes AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   count(*) AS class_size
            FROM events GROUP BY 1, 2
        )
        SELECT class_size, count(*) AS n_classes,
               class_size < 5 AS violates_k
        FROM classes GROUP BY class_size
    """,
    "text_url_domains": f"""
        WITH u AS (
            SELECT unnest(regexp_extract_all(text, '{URL_PATTERN}')) AS url
            FROM ({_SOWN_SQL})
        )
        SELECT lower(regexp_extract(url, '{URL_DOMAIN_PATTERN}', 1)) AS domain,
               count(*) AS n_urls
        FROM u
        WHERE regexp_extract(url, '{URL_DOMAIN_PATTERN}', 1) != ''
        GROUP BY 1
    """,
}


# Shared l-diversity threshold, interpolated into BOTH the operator
# default and the oracle mirror so a change to one can't silently
# desynchronize the other (ADVICE r13; the SURVIVAL_HORIZON_DAYS
# discipline).
L_DIVERSITY_L = 3


def l_diversity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive: str,
    l: int = L_DIVERSITY_L,
    pair_counts: DataFrame | None = None,
) -> DataFrame:
    """l-diversity audit — the attribute-disclosure complement to
    `k_anonymity_report`: a QI class can be comfortably k-anonymous
    and still leak, because if all 500 of its members share ONE
    sensitive value, knowing someone is in the class reveals their
    value without identifying their row. Per class we count DISTINCT
    sensitive values, then publish the diversity spectrum (how many
    classes sit at each diversity level) with the `< l` violation
    flag — the same spectrum grain the k-report uses, so the two
    audits read side by side.

    Scale shape: one exact distinct-count shuffle on (QI, sensitive)
    collapsed map-side, then a class-grain count and a
    |distinct diversity levels|-row summary. Exact integers
    throughout. `pair_counts` accepts a precomputed (qi…, sv, n_cu)
    relation (the privacy_audit_job fold / the trio-sharing hook) —
    diversity is then its per-class row count and the default corpus
    path is untouched. Queued for round 17 (`events_l_diversity`,
    ORACLE_R17)."""
    if pair_counts is not None:
        classes = pair_counts.groupBy(*qi_cols).agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_sensitive")
        )
    else:
        classes = (
            df.select(*qi_cols, sensitive)
            .distinct()
            .groupBy(*qi_cols)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_distinct_sensitive")
            )
        )
    return (
        classes.groupBy("n_distinct_sensitive")
        .agg(F.count(F.lit(1)).cast("long").alias("n_classes"))
        .select(
            "n_distinct_sensitive",
            "n_classes",
            (F.col("n_distinct_sensitive") < l).alias("violates_l"),
        )
    )


def _q_events_ldiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    qi = events.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    return l_diversity_report(qi, ["event_type", "day"], "user_id")


# Round-17 queue (the PII module's second release-gate audit).
ORACLE_R17 = {
    "events_l_diversity": f"""
        WITH classes AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   CAST(count(DISTINCT user_id) AS BIGINT)
                       AS n_distinct_sensitive
            FROM events GROUP BY 1, 2
        )
        SELECT n_distinct_sensitive,
               CAST(count(*) AS BIGINT) AS n_classes,
               n_distinct_sensitive < {L_DIVERSITY_L} AS violates_l
        FROM classes GROUP BY 1
    """,
}

# Round 16: the R17 l-diversity audit lands at its scheduled bound
# (VERDICT r15 #2): library + fixture tests + audited oracle held
# since round 13, parity-rehearsed at sf0.01 every round since. Takes
# a window slot this round (staleness at birth).
ORACLE.update(ORACLE_R17)
QUERIES.update({
    "events_l_diversity": _q_events_ldiv,
})


# Shared t-closeness threshold as an exact rational (num/den), so the
# violation flag is an INTEGER comparison on both engines — no double
# threshold anywhere (the L_DIVERSITY_L interpolation discipline).
T_CLOSENESS_NUM = 1
T_CLOSENESS_DEN = 2  # t = 0.5


def t_closeness_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive: str,
    t_num: int = T_CLOSENESS_NUM,
    t_den: int = T_CLOSENESS_DEN,
    pair_counts: DataFrame | None = None,
) -> DataFrame:
    """t-closeness audit — the third leg of the classic privacy trio
    (k-anonymity: re-identification; l-diversity: attribute
    disclosure; t-closeness: DISTRIBUTION disclosure, Li et al., ICDE
    2007): a class can be k-anonymous AND l-diverse while its
    sensitive-value distribution still differs sharply from the
    corpus-wide one, which is itself the leak ("people in this class
    skew to value X"). Per QI class: the total-variation distance
    between the class's sensitive distribution and the global one,
    with the `> t` violation flag.

    TVD is the log-free distance (the source_token_tvd discipline —
    no KL/EMD transcendentals, so it hash-certifies exactly): with
    n_cu = rows of value u in class c, n_c = class rows, g_u = global
    rows of u, N = total rows,

        TVD(c) = Σ_u |n_cu·N − g_u·n_c| / (2·n_c·N).

    Values the class never contains fold in CLOSED FORM —
    Σ_{u∉c} g_u·n_c = n_c·(N − Σ_{u∈c} g_u) — so the engine touches
    only (class, value) pairs that EXIST; the numerator accumulates
    in DECIMAL(38,0) (exact, order-free — a double sum would be
    run-order-dependent), the reported tvd is one fixed-order double
    division, and the violation flag is the exact integer comparison
    num·t_den > t_num·2·n_c·N — no double ever decides a verdict.

    Scale shape: ONE map-side-combined shuffle to (QI, value) grain —
    the global histogram, the corpus total, AND the class sizes all
    derive from that pair relation (value-grain re-aggregate,
    QI-partitioned window), so the corpus is scanned once; one
    class-grain aggregate; N is a 1-row broadcast normalizer. No
    partition-less window anywhere. `pair_counts` accepts a
    precomputed (qi…, <sensitive>, n_cu) relation — the fold the
    streaming privacy_audit_job persists, and the sharing hook for
    running the whole trio off one aggregate. Queued for round 19
    (`events_t_closeness`, ORACLE_R19)."""
    from pyspark.sql import Window

    if pair_counts is None:
        pair_counts = (
            df.select(*qi_cols, F.col(sensitive).alias("sv"))
            .groupBy(*qi_cols, "sv")
            .agg(F.count(F.lit(1)).cast("long").alias("n_cu"))
        )
    # pair_counts contract: columns (*qi_cols, "sv", "n_cu")
    cls_val = pair_counts.select(
        *qi_cols, "sv", F.col("n_cu").cast("long").alias("n_cu")
    )
    glob = cls_val.groupBy("sv").agg(
        F.sum("n_cu").cast("long").alias("g_u")
    )
    total = cls_val.agg(F.sum("n_cu").cast("long").alias("n_total"))

    def dec(c) -> Column:
        return (c if isinstance(c, Column) else F.col(c)).cast(
            "decimal(38,0)"
        )

    w_cls = Window.partitionBy(*qi_cols)
    enriched = (
        cls_val.withColumn(
            "n_c", F.sum("n_cu").over(w_cls).cast("long")
        )
        .join(glob, "sv")
        # 1-row normalizer — the bounded crossJoin idiom
        .crossJoin(F.broadcast(total))
    )
    per_class = enriched.groupBy(*qi_cols).agg(
        F.max("n_c").cast("long").alias("n_rows"),
        F.max("n_total").cast("long").alias("n_total"),
        F.sum(
            F.abs(dec("n_cu") * dec("n_total") - dec("g_u") * dec("n_c"))
        ).alias("num_present"),
        F.sum("g_u").cast("long").alias("g_present"),
    )
    num = F.col("num_present") + dec("n_rows") * (
        dec("n_total") - dec("g_present")
    )
    tvd = num.cast("double") / (
        F.lit(2).cast("double")
        * F.col("n_rows").cast("double")
        * F.col("n_total").cast("double")
    )
    violates = (num * F.lit(int(t_den)).cast("decimal(38,0)")) > (
        F.lit(int(t_num)).cast("decimal(38,0)")
        * F.lit(2).cast("decimal(38,0)")
        * dec("n_rows")
        * dec("n_total")
    )
    return per_class.select(
        *qi_cols,
        "n_rows",
        num.cast("double").alias("sum_abs_dev"),
        tvd.alias("tvd"),
        violates.alias("violates_t"),
    )


def _q_events_tclose(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    qi = events.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    return t_closeness_report(qi, ["event_type", "day"], "user_id")


# Round-19 queue (the PII module's third release-gate audit — the trio
# k-anonymity / l-diversity / t-closeness is complete with this op).
ORACLE_R19 = {
    "events_t_closeness": f"""
        WITH rows_ AS (
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
                   user_id AS sv
            FROM events
        ),
        cv AS (
            SELECT event_type, day, sv,
                   CAST(count(*) AS BIGINT) AS n_cu
            FROM rows_ GROUP BY 1, 2, 3
        ),
        g AS (
            SELECT sv, CAST(count(*) AS BIGINT) AS g_u
            FROM rows_ GROUP BY 1
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM rows_),
        e AS (
            SELECT cv.event_type, cv.day, cv.n_cu, g.g_u, t.n_total,
                   SUM(cv.n_cu) OVER (
                       PARTITION BY cv.event_type, cv.day
                   ) AS n_c
            FROM cv JOIN g USING (sv) CROSS JOIN tot t
        ),
        pc AS (
            SELECT event_type, day,
                   CAST(MAX(n_c) AS BIGINT) AS n_rows,
                   MAX(n_total) AS n_total,
                   SUM(ABS(CAST(n_cu AS HUGEINT) * n_total
                           - CAST(g_u AS HUGEINT) * n_c))
                       AS num_present,
                   CAST(SUM(g_u) AS BIGINT) AS g_present
            FROM e GROUP BY 1, 2
        ),
        f AS (
            SELECT event_type, day, n_rows, n_total,
                   num_present
                       + CAST(n_rows AS HUGEINT) * (n_total - g_present)
                       AS num
            FROM pc
        )
        SELECT event_type, day, n_rows,
               CAST(num AS DOUBLE) AS sum_abs_dev,
               CAST(num AS DOUBLE)
                   / (CAST(2 AS DOUBLE) * CAST(n_rows AS DOUBLE)
                      * CAST(n_total AS DOUBLE)) AS tvd,
               num * {T_CLOSENESS_DEN}
                   > CAST({T_CLOSENESS_NUM} AS HUGEINT) * 2
                     * CAST(n_rows AS HUGEINT) * n_total
                   AS violates_t
        FROM f
    """,
}
