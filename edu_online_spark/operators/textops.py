"""Text-analysis operators over the `documents` table (extension surface).

Quality scoring, language-ID, token counting, fingerprinting — all pure
column expressions (functions/text.py), so at 100 TB they execute
inside the parquet scan stage with zero Python. Aggregate variants show
the downstream group-by shapes a data-curation pipeline runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..sources import load_table


def text_quality(documents: DataFrame) -> DataFrame:
    """Per-document quality metrics + a composite score.

    Score: stopword presence and sane token length are up-weighted,
    punctuation soup is penalized — the usual cheap pre-LM filters.
    """
    d = documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        T.token_count("text").alias("n_tokens"),
        T.bpe_token_count("text").alias("n_bpe_tokens"),
        T.punct_count("text").alias("n_punct"),
        T.marker_hits("text", T.STOPWORDS_EN).alias("n_stop"),
    )
    return d.select(
        "*",
        (F.col("n_chars") / F.col("n_tokens")).alias("avg_token_len"),
        (F.col("n_punct") / F.col("n_chars")).alias("punct_ratio"),
        (F.col("n_stop") / F.col("n_tokens")).alias("stop_ratio"),
    ).withColumn(
        "quality_score",
        (F.col("n_stop") / F.col("n_tokens"))
        - (F.col("n_punct") / F.col("n_chars")),
    )


def lang_confusion(documents: DataFrame) -> DataFrame:
    """Marker-lexicon language-ID vs the labeled lang column."""
    return (
        documents.select("lang", T.predict_lang("text").alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("cnt"))
    )


def doc_fingerprints(documents: DataFrame, variant: str = "fast") -> DataFrame:
    """Deterministic content fingerprint per document.

    variant='fast' (default): xxhash64 — codegen, scan-stage, the form
    to run at corpus scale. variant='poly': the character-fold rolling
    hash whose arithmetic the DuckDB oracle reproduces bit-for-bit
    (registered separately so the hash-match gate still exercises it).
    """
    fp = T.fingerprint_fast if variant == "fast" else T.fingerprint
    return documents.select("doc_id", fp("text").alias("fp"))


def top_bigrams(documents: DataFrame, k: int = 20) -> DataFrame:
    """Corpus-wide top-k word bigrams.

    shingle_rows (codegen, one shuffle) → count → bounded top-k with a
    deterministic (cnt desc, bigram asc) tie-break. The count shuffle
    carries (bigram, partial_count) thanks to map-side combine — at
    100 TB the heavy hitters aggregate locally before moving.
    """
    from ..functions.text import shingle_rows

    counts = (
        shingle_rows(documents, "doc_id", "text", 2)
        .groupBy(F.col("shingle").alias("bigram"))
        .agg(F.count("*").alias("cnt"))
    )
    return counts.orderBy(F.desc("cnt"), F.asc("bigram")).limit(k)


def token_stats_by_source(documents: DataFrame) -> DataFrame:
    """Corpus curation roll-up: token volume and doc sizes per source."""
    per_doc = documents.select(
        "source", T.token_count("text").alias("n_tokens"), F.length("text").alias("n_chars")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .withColumn(
            "avg_tokens_per_doc", F.col("total_tokens") / F.col("n_docs")
        )
    )


def curate_documents(
    documents: DataFrame,
    min_tokens: int = 20,
    max_punct_ratio: float = 0.1,
    langs: tuple[str, ...] = ("en", "es", "de", "fr"),
) -> DataFrame:
    """The composed curation pipeline: language allowlist + length floor
    + punctuation-soup ceiling + exact dedup (keep min doc_id per text).
    Output: surviving doc ids with the metrics that admitted them —
    the shape of a pre-training data filter stage.

    All filters are scan-stage expressions (pushdown-friendly); dedup is
    the only shuffle.
    """
    scored = documents.select(
        "doc_id",
        "text",
        "lang",
        T.token_count("text").alias("n_tokens"),
        (T.punct_count("text") / F.length("text")).alias("punct_ratio"),
    ).filter(
        F.col("lang").isin(*langs)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
    )
    return (
        scored.groupBy("text")
        .agg(
            F.min("doc_id").alias("doc_id"),
            # min, not first(): identical texts could carry different
            # lang labels and first() is partition-order-dependent
            F.min("lang").alias("lang"),
            F.min("n_tokens").alias("n_tokens"),
        )
        .select("doc_id", "lang", "n_tokens")
    )


# ---------------------------------------------------------------------------
# Oracle-checked query registry
# ---------------------------------------------------------------------------

def _q(fn):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_table(spark, sf_dir, "documents"))

    return runner


QUERIES = {
    "text_quality": _q(text_quality),
    "text_lang_confusion": _q(lang_confusion),
    # hash-matched against the DuckDB polynomial-fold oracle
    "text_fingerprints": _q(lambda d: doc_fingerprints(d, variant="poly")),
    # the scale default (xxhash64 is Spark-specific → rows-only check;
    # determinism is pinned by tests/test_decoders.py instead)
    "text_fingerprints_fast": _q(doc_fingerprints),
    "text_token_stats": _q(token_stats_by_source),
    "text_top_bigrams": _q(top_bigrams),
    "documents_curated": _q(curate_documents),
}

_TOKENS = "regexp_split_to_array(trim(text), ' +')"
_STOP_LIST = ", ".join(f"'{w}'" for w in T.STOPWORDS_EN)


def _marker_sql(words) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_TOKENS}, w -> w IN ({lst})))"


def _pred_lang_sql() -> str:
    """Mirror functions/text.predict_lang: strict-'>' fold over languages
    in reverse-lexicographic order ⇒ lexicographically-first wins ties."""
    best = "'und'"
    best_score = "0"
    for lang in sorted(T.LANG_MARKERS, reverse=True):
        s = _marker_sql(T.LANG_MARKERS[lang])
        best = f"(CASE WHEN {s} > {best_score} THEN '{lang}' ELSE {best} END)"
        best_score = f"(CASE WHEN {s} > {best_score} THEN {s} ELSE {best_score} END)"
    return best


ORACLE = {
    "text_quality": f"""
        WITH d AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len({_TOKENS}) AS n_tokens,
                   len(regexp_extract_all(text, '{T.BPE_TOKEN_PATTERN}')) AS n_bpe_tokens,
                   len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
                   len(list_filter({_TOKENS}, w -> w IN ({_STOP_LIST}))) AS n_stop
            FROM documents
        )
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_tokens AS INTEGER) AS n_tokens,
               CAST(n_bpe_tokens AS INTEGER) AS n_bpe_tokens,
               CAST(n_punct AS INTEGER) AS n_punct,
               CAST(n_stop AS INTEGER) AS n_stop,
               n_chars::DOUBLE / n_tokens AS avg_token_len,
               n_punct::DOUBLE / n_chars AS punct_ratio,
               n_stop::DOUBLE / n_tokens AS stop_ratio,
               (n_stop::DOUBLE / n_tokens) - (n_punct::DOUBLE / n_chars)
                   AS quality_score
        FROM d
    """,
    "text_lang_confusion": f"""
        SELECT lang, {_pred_lang_sql()} AS pred_lang, count(*) AS cnt
        FROM documents GROUP BY 1, 2
    """,
    "text_fingerprints": f"""
        SELECT doc_id,
               CAST(CASE WHEN length(text) = 0 THEN 0 ELSE list_reduce(
                   [ascii(text[i])::BIGINT for i in range(1, length(text) + 1)],
                   (a, b) -> (a * {T.FINGERPRINT_BASE} + b) % {T.FINGERPRINT_MOD}
               ) END AS BIGINT) AS fp
        FROM documents
    """,
    "text_top_bigrams": f"""
        WITH bg AS (
            SELECT unnest([array_to_string(w[i:i+1], ' ')
                           for i in range(1, len(w))]) AS bigram
            FROM (SELECT {_TOKENS} AS w FROM documents)
            WHERE len(w) >= 2
        )
        SELECT bigram, count(*) AS cnt FROM bg
        GROUP BY 1 ORDER BY cnt DESC, bigram ASC LIMIT 20
    """,
    "documents_curated": f"""
        WITH scored AS (
            SELECT doc_id, text, lang,
                   len({_TOKENS}) AS n_tokens,
                   len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE / length(text)
                       AS punct_ratio
            FROM documents
        )
        SELECT min(doc_id) AS doc_id, min(lang) AS lang,
               CAST(min(n_tokens) AS INTEGER) AS n_tokens
        FROM scored
        WHERE lang IN ('en', 'es', 'de', 'fr')
          AND n_tokens >= 20 AND punct_ratio <= 0.1
        GROUP BY text
    """,
    "text_token_stats": f"""
        WITH per_doc AS (
            SELECT source, len({_TOKENS}) AS n_tokens, length(text) AS n_chars
            FROM documents
        )
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens_per_doc
        FROM per_doc GROUP BY source
    """,
}
