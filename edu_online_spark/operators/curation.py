"""End-to-end corpus curation: the full pipeline a release actually
ships, certified as ONE query.

Every stage here is individually driver-certified (normalize, PII
redaction, Gopher gate, MinHash near-dup collapse, stratified sample,
sequence packing, dataset card — see textops/pii/dedup), but a user of
the engine runs them CHAINED, and composition is where silent contract
breaks hide (a stage renaming a column, a gate reordering nulls, a
dedup keying on pre-scrub text). `corpus_end_to_end_curation` runs the
chain over `documents` and emits the per-source release card, with a
DuckDB oracle that mirrors every stage — so the hash certifies the
whole funnel, not just its pieces.

The reference engine has no corpus pipeline (its inputs are
pre-anonymized click logs — SURVEY.md §2); this is extension surface
for the LLM-training-data use case, composed from the certified
single-stage operators.

Plan shape (scale notes):
  stages 1-2 (normalize → redact) are ONE scan-stage regexp
  projection, materialized before the gate so Catalyst doesn't inline
  the 6-regexp chain into each of the gate's HOF expressions (measured
  2× on scrub+gate); stage 3's `keep_cols` threading means no doc_id
  re-join anywhere before the first shuffle;
  stage 4 (near-dup) is the banded MinHash join over the GATED corpus
  (collision-bounded, the dedup module's scale contract) with a
  broadcast anti-join of the (tiny) loser set;
  stage 5 (stratified sample) is the one per-source shuffle;
  stage 6 (pack) windows within each source over sampled docs only;
  stage 7 (card) joins five source-grain aggregates — broadcast-sized
  by construction (|sources| rows each).
The gated corpus is localCheckpointed once because three branches
(pair generation, anti-join probe, stage count) would otherwise
re-run the scan projection; at 100 TB that materialization becomes a
persisted intermediate table, same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.core import hash_bucket
from ..sources import load_table
from .dedup import (
    JACCARD_THRESHOLD,
    broadcast_if_bounded,
    minhash_lsh_pairs,
    near_dup_clusters,
)
from .pii import PII_PATTERNS
from .textops import (
    CONTROL_CHARS_PATTERN,
    STRATIFIED_HASH_MOD,
    STRATIFIED_PER_STRATUM,
    WS_RUN_PATTERN,
    assign_training_shards,
    gopher_quality_rules,
    pack_training_sequences,
    quality_budget_fill,
    temperature_mixture_sample,
)

# Global token budget for the release branch (stage 5b). Sized to BITE
# at the certification SFs — the deduped corpus carries ~15-20k tokens
# at sf0.01, so an 8k budget genuinely rejects the low-quality tail
# (a budget larger than the corpus would make the stage a no-op and
# certify nothing).
CURATION_FILL_BUDGET = 8_000
# Composition-scale shard target: the mixed subset carries ~3-4k tokens
# at the certification SFs, so the module default (4096) would place
# every doc in shard 0 and certify nothing about the boundary
# arithmetic. 512 yields ~6-8 shards whose cut points the card's
# per-source n_shards genuinely exercises.
CURATION_SHARD_TOKENS = 512


def corpus_end_to_end_curation(
    documents: DataFrame, per_stratum: int = STRATIFIED_PER_STRATUM
) -> DataFrame:
    """normalize → PII scrub → Gopher gate → near-dup collapse →
    {stratified sample → pack} ∥ {quality budget fill → temperature
    mixture → shard assignment} → per-source release card.

    Two release branches leave the deduped corpus (round 7 added the
    second): the ANALYSIS branch (stratified sample → packed training
    sequences — a fixed per-source quota for eyeballing/evals) and the
    RELEASE branch (the round-6 curation stages chained end-to-end:
    fill a global token budget from the highest-quality docs down,
    temperature-rebalance the survivors across sources, lay the mix
    out into training shards). Composition is where contract breaks
    hide, so both branches feed ONE certified card.

    Output (one row per source, every value an integer count or an
    int-derived sum, so the whole card hash-certifies):
      n_raw             docs entering the pipeline
      n_kept_gopher     docs surviving the quality gate
      n_after_dedup     survivors after near-dup clusters collapse to
                        their canonical (min-doc_id) representative
      n_sampled         docs in the stratified release sample
      sampled_tokens    whitespace tokens across sampled docs
      n_redactions      PII redactions inside the sampled docs
      n_packs           fixed-budget training packs built from them
      packed_tokens     tokens actually packed
      n_budget_kept     docs admitted by the global quality budget fill
      budget_tokens     tokens those docs carry
      n_mixed           docs surviving the sqrt-temperature mixture
      mixed_tokens      tokens entering the shard writer
      n_shards          distinct training shards holding this source's
                        docs (shards interleave sources by design —
                        the hash-priority epoch order — so per-source
                        shard spread is the signal worth auditing)
    """
    # --- stages 1-3: one fused scan projection ----------------------
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace("text", CONTROL_CHARS_PATTERN, ""),
            WS_RUN_PATTERN,
            " ",
        )
    )
    n_red = None
    for _, pat, _ in PII_PATTERNS:
        c = F.regexp_count(norm, F.lit(pat))
        n_red = c if n_red is None else n_red + c
    scrubbed = norm
    for _, pat, token in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    # spread_small_scan (optimization r16, guide §2): a sub-split local
    # input scans as ONE partition, and every localCheckpoint below
    # inherits that — serializing the scrub regexes, the gate HOFs and
    # the whole dedup stage onto one core. Spreading the compact doc
    # rows here parallelizes the entire chain; at scale it is a no-op.
    d_scrubbed = T.spread_small_scan(documents, "doc_id").select(
        "doc_id",
        "source",
        "lang",
        n_red.alias("n_redactions"),
        scrubbed.alias("text"),
        # materialized: the gate's HOF expressions each re-reference
        # `text`, and Catalyst would inline this 6-regexp chain into
        # every one of them (measured 12.8 s → 6.0 s at sf0.1 for
        # scrub+gate). One projection pass, stored once.
    ).localCheckpoint(eager=True)
    gated = (
        gopher_quality_rules(
            d_scrubbed, keep_cols=("source", "lang", "n_redactions", "text")
        )
        .filter(F.col("keep"))
        .select("doc_id", "source", "lang", "n_redactions", "text")
        # three consumers below (pair generation, anti-join, count) —
        # materialize the gated corpus once, same rationale as the
        # candidate sets in dedup.minhash_lsh_pairs
        .localCheckpoint(eager=True)
    )
    # --- stage 4: near-dup collapse over the gated, SCRUBBED text ---
    clusters = near_dup_clusters(
        minhash_lsh_pairs(gated, threshold=JACCARD_THRESHOLD)
    )
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_rep")).select(
        "doc_id"
    )
    # losers grow with duplicate mass (20-50% of a web corpus) — hint
    # the broadcast only while the relation is actually small
    deduped = gated.join(
        broadcast_if_bounded(losers), "doc_id", "left_anti"
    )
    # --- stage 5: deterministic stratified sample -------------------
    w = Window.partitionBy("source").orderBy(
        hash_bucket("doc_id", STRATIFIED_HASH_MOD), F.asc("doc_id")
    )
    sampled_lazy = deduped.withColumn(
        "strat_rank", F.row_number().over(w)
    ).filter(F.col("strat_rank") <= per_stratum)
    # --- stage 5b: global quality budget fill over the deduped corpus
    # quality_budget_fill keys on doc_id only; the semi-join back to
    # `deduped` re-attaches (source, text) for the downstream stages.
    # Plain shuffle join on doc_id — the kept set is corpus-sized, not
    # broadcastable at scale.
    bkept_lazy = (
        quality_budget_fill(deduped, budget=CURATION_FILL_BUDGET)
        .filter(F.col("kept"))
        .select("doc_id", "n_tokens")
        .join(deduped.select("doc_id", "source", "text"), "doc_id")
    )
    # The ANALYSIS-branch sample (consumed by the pack branch and the
    # card aggregate) and the RELEASE-branch budget fill (consumed by
    # three branches: mixture ranking, shard text re-join, card
    # aggregate) are INDEPENDENT given `deduped` — materialize their
    # checkpoints as two concurrent jobs (guide §2.6: actions are only
    # sequential because the driver calls them sequentially; the
    # second job's tasks back-fill executors freed by the first's
    # tail). Same blocking semantics as before once both return.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_sampled = pool.submit(
            lambda: sampled_lazy.localCheckpoint(eager=True)
        )
        f_bkept = pool.submit(lambda: bkept_lazy.localCheckpoint(eager=True))
        sampled = f_sampled.result()
        bkept = f_bkept.result()
    # --- stage 6: pack the sampled docs -----------------------------
    packs = pack_training_sequences(sampled.select("doc_id", "source", "text"))
    # --- stage 6b: sqrt-temperature source rebalance ----------------
    # materialized: two consumers (shard text re-join, card aggregate)
    # would each re-run the ranking windows AND re-plan the normalizer
    # crossJoin; one checkpoint collapses both
    mixed = temperature_mixture_sample(
        bkept.select("doc_id", "source")
    ).localCheckpoint(eager=True)
    # --- stage 7b: shard assignment over the mixed subset -----------
    shards = assign_training_shards(
        bkept.join(mixed.select("doc_id"), "doc_id").select(
            "doc_id", "source", "text"
        ),
        shard_tokens=CURATION_SHARD_TOKENS,
    )
    # --- stage 7: per-source release card ---------------------------
    card_raw = documents.groupBy("source").agg(F.count("*").alias("n_raw"))
    card_gate = gated.groupBy("source").agg(F.count("*").alias("n_kept_gopher"))
    card_dedup = deduped.groupBy("source").agg(
        F.count("*").alias("n_after_dedup")
    )
    card_sample = sampled.groupBy("source").agg(
        F.count("*").alias("n_sampled"),
        F.sum(F.size(T.tokens("text"))).alias("sampled_tokens"),
        F.sum("n_redactions").alias("n_redactions"),
    )
    card_pack = packs.groupBy("source").agg(
        F.count("*").alias("n_packs"),
        F.sum("pack_tokens").alias("packed_tokens"),
    )
    card_budget = bkept.groupBy("source").agg(
        F.count("*").alias("n_budget_kept"),
        F.sum("n_tokens").alias("budget_tokens"),
    )
    card_mix = mixed.groupBy("source").agg(F.count("*").alias("n_mixed"))
    card_shard = shards.groupBy("source").agg(
        F.sum("n_tokens").alias("mixed_tokens"),
        F.countDistinct("shard_id").alias("n_shards"),
    )
    return (
        card_raw.join(card_gate, "source", "left")
        .join(card_dedup, "source", "left")
        .join(card_sample, "source", "left")
        .join(card_pack, "source", "left")
        .join(card_budget, "source", "left")
        .join(card_mix, "source", "left")
        .join(card_shard, "source", "left")
        .select(
            "source",
            "n_raw",
            F.coalesce("n_kept_gopher", F.lit(0)).alias("n_kept_gopher"),
            F.coalesce("n_after_dedup", F.lit(0)).alias("n_after_dedup"),
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            F.coalesce("sampled_tokens", F.lit(0)).alias("sampled_tokens"),
            F.coalesce("n_redactions", F.lit(0)).alias("n_redactions"),
            F.coalesce("n_packs", F.lit(0)).alias("n_packs"),
            F.coalesce("packed_tokens", F.lit(0)).alias("packed_tokens"),
            F.coalesce("n_budget_kept", F.lit(0)).alias("n_budget_kept"),
            F.coalesce("budget_tokens", F.lit(0)).alias("budget_tokens"),
            F.coalesce("n_mixed", F.lit(0)).alias("n_mixed"),
            F.coalesce("mixed_tokens", F.lit(0)).alias("mixed_tokens"),
            F.coalesce("n_shards", F.lit(0)).alias("n_shards"),
        )
    )


def _q(fn):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_table(spark, sf_dir, "documents"))

    return runner


QUERIES = {
    "corpus_end_to_end_curation": _q(corpus_end_to_end_curation),
}

# ---------------------------------------------------------------------------
# Oracle: every stage mirrored in DuckDB over the same funnel. Stage
# mirrors are the SAME SQL fragments the single-stage certifications
# use (textops/pii/dedup ORACLE), re-pointed at the previous stage's
# CTE instead of raw `documents`; near-dup is the exact-Jaccard
# recursive-closure mirror from dedup_neardup_curated. Certified at
# sf0.01 (the driver's gate SF): the closure CTE is the quadratic
# exact baseline, the same sf0.01-only policy as the pair oracles —
# the Spark side is measured at sf0.1/sf1 in SCALE.md §4 instead.
# ---------------------------------------------------------------------------

from .textops import CHUNK_STRIDE, CHUNK_TOKENS  # noqa: E402
from .textops import _STOP_LIST as _GOPHER_STOPS  # noqa: E402
from .textops import (  # noqa: E402
    BUDGET_HASH_MOD,
    GOPHER_MAX_MEAN_WORD_LEN,
    GOPHER_MAX_TOP_TOKEN_SHARE,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_MEAN_WORD_LEN,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_WORDS,
    TEMP_SAMPLE_HALF_DIVISOR,
)

_PRI_SQL = f"((doc_id % 2147483647) * 2654435761) % {BUDGET_HASH_MOD}"

_NORM_SQL = (
    f"trim(regexp_replace(regexp_replace(text, '{CONTROL_CHARS_PATTERN}', "
    f"'', 'g'), '{WS_RUN_PATTERN}', ' ', 'g'))"
)
_REDACT_SQL = _NORM_SQL
for _, _pat, _token in PII_PATTERNS:
    _REDACT_SQL = f"regexp_replace({_REDACT_SQL}, '{_pat}', '{_token}', 'g')"
_NRED_SQL = " + ".join(
    f"len(regexp_extract_all({_NORM_SQL}, '{p}'))" for _, p, _ in PII_PATTERNS
)

ORACLE = {
    "corpus_end_to_end_curation": f"""
        WITH RECURSIVE scrubbed AS (
            SELECT doc_id, source, lang,
                   CAST({_NRED_SQL} AS INTEGER) AS n_redactions,
                   {_REDACT_SQL} AS text
            FROM documents
        ),
        gm AS (
            SELECT *, regexp_split_to_array(trim(text), ' +') AS w
            FROM scrubbed
        ),
        gated AS (
            SELECT doc_id, source, lang, n_redactions, text, w
            FROM gm
            WHERE len(w) BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
              AND list_sum(list_transform(w, x -> length(x)))::DOUBLE / len(w)
                  BETWEEN {GOPHER_MIN_MEAN_WORD_LEN} AND {GOPHER_MAX_MEAN_WORD_LEN}
              AND list_max(list_transform(list_distinct(w),
                      u -> len(list_filter(w, x -> x = u))))::DOUBLE / len(w)
                  <= {GOPHER_MAX_TOP_TOKEN_SHARE}
              AND len(list_filter(w, x -> x IN ({_GOPHER_STOPS})))
                  >= {GOPHER_MIN_STOPWORDS}
        ),
        sh AS (
            SELECT doc_id,
                   list_distinct([array_to_string(w[i:i+2], ' ')
                                  for i in range(1, len(w) - 1)]) AS sh
            FROM gated WHERE len(w) >= 3
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                      / len(list_distinct(list_concat(a.sh, b.sh)))
                  >= {JACCARD_THRESHOLD}
        ),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach(src, dst) AS (
            SELECT src, src FROM edges
            UNION SELECT src, dst FROM edges
            UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        labels AS (
            SELECT src AS doc_id, min(dst) AS cluster_rep
            FROM reach GROUP BY src
        ),
        deduped AS (
            SELECT * FROM gated
            WHERE doc_id NOT IN (SELECT doc_id FROM labels
                                 WHERE doc_id <> cluster_rep)
        ),
        sampled AS (
            SELECT * FROM (
                SELECT *,
                       ROW_NUMBER() OVER (
                           PARTITION BY source
                           ORDER BY ((doc_id % 2147483647) * 2654435761)
                                        % {STRATIFIED_HASH_MOD},
                                    doc_id
                       ) AS strat_rank
                FROM deduped
            ) WHERE strat_rank <= {STRATIFIED_PER_STRATUM}
        ),
        chunk_rows AS (
            SELECT doc_id, source, w,
                   unnest(range(0, CAST(ceil(greatest(len(w), 1)
                                             / {CHUNK_STRIDE}.0) AS BIGINT)))
                       AS chunk_idx
            FROM sampled
        ),
        chunks AS (
            SELECT doc_id, source, chunk_idx,
                   least(len(w) - chunk_idx * {CHUNK_STRIDE}, {CHUNK_TOKENS})
                       AS n_chunk_tokens
            FROM chunk_rows
            WHERE chunk_idx * {CHUNK_STRIDE} < len(w)
              AND (chunk_idx = 0
                   OR (chunk_idx - 1) * {CHUNK_STRIDE} + {CHUNK_TOKENS} < len(w))
        ),
        win AS (
            SELECT source, n_chunk_tokens,
                   SUM(n_chunk_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id, chunk_idx
                       ROWS UNBOUNDED PRECEDING) - n_chunk_tokens AS cum_before
            FROM chunks
        ),
        packs AS (
            SELECT source, CAST(floor(cum_before / 128) AS INTEGER) AS pack_id,
                   CAST(sum(n_chunk_tokens) AS BIGINT) AS pack_tokens
            FROM win GROUP BY 1, 2
        ),
        qscored AS (
            SELECT doc_id, source,
                   CAST(len(w) AS BIGINT) AS n_tokens,
                   CASE WHEN length(text) > 0 AND len(w) > 0
                        THEN (len(list_filter(w,
                                  x -> x IN ({_GOPHER_STOPS})))::DOUBLE
                              / len(w))
                             - (len(regexp_extract_all(text,
                                    '[.,!?;:]'))::DOUBLE / length(text))
                   END AS quality_score,
                   {_PRI_SQL} AS pri
            FROM deduped
        ),
        bkept AS (
            SELECT doc_id, source, n_tokens FROM (
                SELECT doc_id, source, n_tokens,
                       CAST(SUM(n_tokens) OVER (
                           ORDER BY quality_score DESC NULLS LAST, pri,
                                    doc_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                           AS cum_tokens
                FROM qscored
            ) WHERE cum_tokens <= {CURATION_FILL_BUDGET}
        ),
        minv AS (
            SELECT source, count(*) AS n_docs FROM bkept GROUP BY source
        ),
        mnorm AS (
            SELECT list_sum(list(sqrt(n_docs::DOUBLE) ORDER BY source))
                       AS w_total,
                   (SELECT count(*) // {TEMP_SAMPLE_HALF_DIVISOR}
                    FROM bkept) AS sample_n
            FROM minv
        ),
        mtargets AS (
            SELECT i.source,
                   CAST(floor(n.sample_n
                              * (sqrt(i.n_docs::DOUBLE) / n.w_total))
                        AS BIGINT) AS target_n
            FROM minv i CROSS JOIN mnorm n
        ),
        mixed AS (
            SELECT r.doc_id, r.source FROM (
                SELECT doc_id, source,
                       ROW_NUMBER() OVER (
                           PARTITION BY source
                           ORDER BY {_PRI_SQL}, doc_id) AS rank
                FROM bkept
            ) r JOIN mtargets t USING (source)
            WHERE r.rank <= t.target_n
        ),
        mshard AS (
            SELECT doc_id, source, n_tokens,
                   CAST((cum_tokens - n_tokens) // {CURATION_SHARD_TOKENS}
                        AS BIGINT) AS shard_id
            FROM (
                SELECT doc_id, source, n_tokens,
                       CAST(SUM(n_tokens) OVER (
                           ORDER BY {_PRI_SQL}, doc_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                           AS cum_tokens
                FROM bkept
                WHERE doc_id IN (SELECT doc_id FROM mixed)
            )
        ),
        card_raw AS (
            SELECT source, count(*) AS n_raw FROM documents GROUP BY source
        ),
        card_gate AS (
            SELECT source, count(*) AS n_kept_gopher FROM gated GROUP BY source
        ),
        card_dedup AS (
            SELECT source, count(*) AS n_after_dedup FROM deduped GROUP BY source
        ),
        card_sample AS (
            SELECT source, count(*) AS n_sampled,
                   CAST(sum(len(w)) AS BIGINT) AS sampled_tokens,
                   CAST(sum(n_redactions) AS BIGINT) AS n_redactions
            FROM sampled GROUP BY source
        ),
        card_pack AS (
            SELECT source, count(*) AS n_packs,
                   CAST(sum(pack_tokens) AS BIGINT) AS packed_tokens
            FROM packs GROUP BY source
        ),
        card_budget AS (
            SELECT source, count(*) AS n_budget_kept,
                   CAST(sum(n_tokens) AS BIGINT) AS budget_tokens
            FROM bkept GROUP BY source
        ),
        card_mix AS (
            SELECT source, count(*) AS n_mixed FROM mixed GROUP BY source
        ),
        card_shard AS (
            SELECT source,
                   CAST(sum(n_tokens) AS BIGINT) AS mixed_tokens,
                   CAST(count(DISTINCT shard_id) AS BIGINT) AS n_shards
            FROM mshard GROUP BY source
        )
        SELECT r.source, r.n_raw,
               COALESCE(g.n_kept_gopher, 0) AS n_kept_gopher,
               COALESCE(d.n_after_dedup, 0) AS n_after_dedup,
               COALESCE(s.n_sampled, 0) AS n_sampled,
               COALESCE(s.sampled_tokens, 0) AS sampled_tokens,
               COALESCE(s.n_redactions, 0) AS n_redactions,
               COALESCE(p.n_packs, 0) AS n_packs,
               COALESCE(p.packed_tokens, 0) AS packed_tokens,
               COALESCE(b.n_budget_kept, 0) AS n_budget_kept,
               COALESCE(b.budget_tokens, 0) AS budget_tokens,
               COALESCE(m.n_mixed, 0) AS n_mixed,
               COALESCE(h.mixed_tokens, 0) AS mixed_tokens,
               COALESCE(h.n_shards, 0) AS n_shards
        FROM card_raw r
        LEFT JOIN card_gate g USING (source)
        LEFT JOIN card_dedup d USING (source)
        LEFT JOIN card_sample s USING (source)
        LEFT JOIN card_pack p USING (source)
        LEFT JOIN card_budget b USING (source)
        LEFT JOIN card_mix m USING (source)
        LEFT JOIN card_shard h USING (source)
    """,
}
