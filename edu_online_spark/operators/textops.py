"""Text-analysis operators over the `documents` table (extension surface).

Quality scoring, language-ID, token counting, fingerprinting — all pure
column expressions (functions/text.py), so at 100 TB they execute
inside the parquet scan stage with zero Python. Aggregate variants show
the downstream group-by shapes a data-curation pipeline runs.
"""

from __future__ import annotations

import pandas as pd
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
    # tokenize ONCE, score five lexicons over the array (optimization
    # r16 — the separate projection is the CollapseProject barrier that
    # keeps the multi-referenced split() materialized per row)
    return (
        documents.select("lang", T.tokens("text").alias("_ts"))
        .select("lang", T.predict_lang("_ts", pre_split=True).alias("pred_lang"))
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


# Shared between the Spark expression and the DuckDB oracle: \xhh
# escapes and \s are valid in both Java regex and RE2.
CONTROL_CHARS_PATTERN = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
WS_RUN_PATTERN = r"\s+"


def normalize_documents(documents: DataFrame) -> DataFrame:
    """Whitespace/control-character normalization — the first cleanup
    stage of every web-scrape curation pipeline (C4 et al.): strip
    ASCII control characters, collapse whitespace runs to single
    spaces, trim. Emits the normalized text plus audit columns
    (changed flag, chars saved) so the pipeline can report what the
    pass actually did.

    Two fused regexp_replaces + trim — one codegen projection in the
    scan stage, zero Python, zero shuffle.
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace("text", CONTROL_CHARS_PATTERN, ""),
            WS_RUN_PATTERN,
            " ",
        )
    )
    return documents.select(
        "doc_id",
        norm.alias("text_norm"),
        (norm != F.col("text")).alias("changed"),
        (F.length("text") - F.length(norm)).alias("n_chars_saved"),
    )


def char_diversity_scores(documents: DataFrame) -> DataFrame:
    """Character-distribution quality metrics per document — the cheap
    perplexity-proxy filter (gibberish and template spam sit at the
    distribution extremes; natural text clusters in a band).

      gini_diversity = 1 − Σcᵢ²/n²   (0 = one repeated char, →1 = flat)
      top_char_ratio = max cᵢ / n    (repetitiveness spike detector)

    Deliberately RATIONAL metrics, not Shannon entropy: ln() is a libm
    call whose low bits differ between the JVM and C implementations
    (measured 2-ULP divergence vs DuckDB), so an entropy column can
    never bit-match a cross-engine oracle. Σcᵢ² is integer-exact and
    the single final division is deterministic. Two shuffles:
    (doc, char) counts, then the per-doc aggregate.
    """
    counts = (
        documents.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count("*").alias("c"))
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.count("*").alias("n_distinct_chars"),
            F.sum(F.col("c") * F.col("c")).alias("ss"),
            F.max(F.struct("c", "ch")).alias("top"),
        )
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_chars"),
            "n_distinct_chars",
            (F.lit(1.0) - F.col("ss") / (F.col("n") * F.col("n"))).alias(
                "gini_diversity"
            ),
            F.col("top.ch").alias("top_char"),
            (F.col("top.c") / F.col("n")).alias("top_char_ratio"),
        )
    )


BENCH_SOURCE = "src0"  # stand-in benchmark/eval corpus
CHUNK_TOKENS = 64
CHUNK_STRIDE = 56  # 8-token overlap between consecutive chunks


def benchmark_contamination(
    documents: DataFrame, bench_source: str = BENCH_SOURCE, n: int = 3
) -> DataFrame:
    """Benchmark-contamination scan: for every training document, the
    fraction of its word 3-shingles that also appear in the benchmark
    corpus (here: the docs of one source). The decontamination step
    every serious pre-training pipeline runs before training.

    Plan: shingle rows for both sides (codegen explode+window form),
    the benchmark side reduced to DISTINCT shingles, one equi join on
    the shingle string + per-doc aggregate. The join key is the
    shingle, so heavy-hitter shingles (stopword runs) fan out — at
    100 TB you'd pre-hash shingles (32-byte keys) and optionally drop
    the top-0.1% document-frequency shingles, which are useless for
    contamination evidence anyway.
    """
    from ..functions.text import shingle_rows

    sh = shingle_rows(documents, "doc_id", "text", n)
    bench_ids = documents.filter(F.col("source") == bench_source).select("doc_id")
    bench_sh = (
        sh.join(bench_ids, "doc_id", "left_semi").select("shingle").distinct()
    )
    train_sh = sh.join(bench_ids, "doc_id", "left_anti")
    hits = train_sh.join(
        bench_sh.withColumn("_hit", F.lit(1)), "shingle", "left"
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
        )
        .withColumn(
            "contamination_rate", F.col("n_contaminated") / F.col("n_shingles")
        )
    )


CONTAM_MAX_RATE = 0.2


def decontamination_stats(
    documents: DataFrame,
    bench_source: str = BENCH_SOURCE,
    n: int = 3,
    max_rate: float = CONTAM_MAX_RATE,
) -> DataFrame:
    """The REMOVAL step downstream of `benchmark_contamination`: drop
    training documents whose benchmark-shingle contamination rate
    reaches `max_rate` and report the per-source cost — docs flagged,
    docs kept, and the flagged token share (the number a data lead
    reads before approving the cut). The report form keeps the output
    small; the kept corpus itself is the same left-join + filter
    without the aggregate.

    Documents too short to shingle (< n words) carry no contamination
    evidence and are KEPT (rate coalesced to 0) — absence of evidence,
    not evidence. Cost is one contamination scan + a per-source
    aggregate; rates are exact-integer divisions, so the threshold
    comparison agrees bit-for-bit across engines.

    Registered as `docs_decontamination_stats` (round 9), hash-checked
    against the DuckDB mirror in ORACLE.
    """
    rates = benchmark_contamination(documents, bench_source, n)
    train = documents.filter(F.col("source") != bench_source)
    scored = train.join(rates, "doc_id", "left").select(
        "source",
        F.coalesce("contamination_rate", F.lit(0.0)).alias("rate"),
        T.token_count("text").cast("long").alias("n_tokens"),
    )
    flagged = F.col("rate") >= max_rate
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(flagged.cast("long")).cast("long").alias("n_flagged"),
            F.sum((~flagged).cast("long")).cast("long").alias("n_kept"),
            F.sum(F.when(flagged, F.col("n_tokens")).otherwise(F.lit(0)))
            .cast("long")
            .alias("flagged_tokens"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .withColumn(
            "flagged_token_share",
            F.col("flagged_tokens").cast("double") / F.col("total_tokens"),
        )
    )


def chunk_documents(
    documents: DataFrame, chunk_tokens: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Fixed-size token chunking with overlap — the doc→training-sample
    fan-out stage of an LLM data pipeline.

    1→N row expansion stays inside the scan stage: chunk start offsets
    are a `sequence(...)` literal range (no data motion), `slice` +
    `array_join` cut each chunk — all JVM expressions, no Python, no
    shuffle at all. Chunks inherit doc_id + chunk_idx so downstream
    dedup/shuffling can trace provenance.

    A chunk is emitted only if the PREVIOUS chunk didn't already reach
    the document's end — otherwise a doc of exactly chunk_tokens words
    would emit a redundant tail chunk fully contained in chunk 0
    (a duplicate training sample; caught by tests/test_textops.py).
    """
    toks = F.split(F.trim(F.col("text")), " +")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )
    return (
        documents.select(
            "doc_id",
            "source",
            toks.alias("w"),
            F.posexplode(starts).alias("chunk_idx", "start"),
        )
        .filter(
            (F.col("start") < F.size("w"))
            & (
                (F.col("start") == 0)
                | (F.col("start") - stride + chunk_tokens < F.size("w"))
            )
        )
        .select(
            "doc_id",
            "source",
            "chunk_idx",
            F.array_join(
                F.slice("w", F.col("start") + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(F.size("w") - F.col("start"), F.lit(chunk_tokens)).alias(
                "n_chunk_tokens"
            ),
        )
    )


def pack_training_sequences(
    documents: DataFrame, budget: int = 128
) -> DataFrame:
    """Sequence packing: assign chunks to fixed-token-budget packs —
    the batching stage between chunking and a training loader (packed
    sequences waste no pad tokens).

    Assignment is by each chunk's START offset in its source's
    cumulative token stream (`pack_id = floor(cum_before / budget)`), a
    pure window cumsum — deterministic and fully relational. A greedy
    no-overflow packer is a sequential recurrence (each decision
    depends on the previous pack's fill), which would serialize the
    corpus; this start-offset scheme lets a pack overrun by at most one
    chunk's tail and keeps the whole pass parallel. Windows partition
    by `source`, so parallelism is per-source and no single global sort
    exists; at 100 TB you'd sub-salt giant sources (same recipe as
    functions/skew.py).

    Output is the per-pack manifest (chunk count, token count) the
    loader reads.
    """
    from pyspark.sql import Window

    chunks = chunk_documents(documents)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = F.sum("n_chunk_tokens").over(w) - F.col("n_chunk_tokens")
    packed = chunks.withColumn(
        "pack_id", F.floor(cum_before / budget).cast("int")
    )
    return packed.groupBy("source", "pack_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_chunk_tokens").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc_id"),
    )


def quality_tiered_sample(documents: DataFrame) -> DataFrame:
    """Quality-tiered deterministic sampling: keep all of the best
    tier, down-sample the middle, keep a sliver of the worst — the
    quality-weighted mixture step between scoring and training.

    Tier thresholds are integer token counts and the keep decision is
    an integer hash-bucket compare (functions/core.hash_bucket — same
    replay-stable recipe as the events samplers; no rand(), no floats
    in the predicate), so membership is bit-identical on every engine,
    partitioning, and retry. Scan-stage only.
    """
    from ..functions.core import hash_bucket

    n_tokens = T.token_count("text")
    tier_pct = (
        F.when(n_tokens >= 40, F.lit(100))
        .when(n_tokens >= 20, F.lit(50))
        .otherwise(F.lit(10))
    )
    return (
        documents.select(
            "doc_id",
            "source",
            n_tokens.alias("n_tokens"),
            tier_pct.alias("tier_pct"),
            hash_bucket("doc_id", 100).alias("bucket"),
        )
        .filter(F.col("bucket") < F.col("tier_pct"))
        .select("doc_id", "source", "n_tokens", "tier_pct")
    )


WEIGHTED_SAMPLE_K = 100
_WS_HASH_MOD = 1_000_003  # prime ≫ corpus buckets; +1 keeps u > 0


def weighted_sample(
    documents: DataFrame, k: int = WEIGHTED_SAMPLE_K
) -> DataFrame:
    """Deterministic weighted top-k sample — k docs chosen with
    probability increasing in document mass (weight = n_chars + 1), by
    ranking on priority = u / w with u a hash-derived uniform integer:
    the integer-exact analogue of Efraimidis–Spirakis u^(1/w) keys
    (selection is weight-monotone, replay-stable, and engine-exact;
    NOT exactly ∝ w — the exact-proportional key needs ln/pow, which
    is libm territory and would demote this to rows-only).

    The tiered/stratified samplers answer "keep x% of each class";
    this answers the other recurring curation ask, "give me exactly k,
    favoring heavy documents" (seed-set picks, eval-slice draws,
    mixture pilots). Priority is the hash_bucket integer recipe plus
    ONE double division (IEEE-exact on every engine), tie-broken by
    doc_id.

    Scale shape: no shuffle at all — orderBy().limit(k) compiles to
    TakeOrderedAndProject (a bounded k-heap per partition, then a
    driver merge of P·k rows), so the 100 TB cost is one scan-stage
    pass over (doc_id, source, n_chars). Queued for round 12
    (`docs_weighted_sample`, ORACLE_R12)."""
    return (
        documents.select(
            "doc_id",
            "source",
            "n_chars",
            ws_priority("doc_id", "n_chars").alias("priority"),
        )
        .orderBy("priority", "doc_id")
        .limit(k)
    )


def ws_priority(doc_id, n_chars):
    """The weighted-sample priority expression (shared with the
    streaming seed-set job so batch/stream parity is structural):
    hash-uniform integer in [1, mod] ÷ (n_chars + 1), ONE IEEE double
    division — smaller is better, heavier docs draw smaller keys."""
    h = (
        F.pmod(
            F.pmod(F.col(doc_id), F.lit(2147483647)) * F.lit(2654435761),
            F.lit(_WS_HASH_MOD),
        )
        + 1
    )
    return h.cast("double") / (F.col(n_chars) + 1)


MIXTURE_WEIGHTS = {"src0": 4, "src1": 2, "src2": 1, "src3": 1}
MIXTURE_TOKEN_BUDGET = 20_000


def corpus_mixture_plan(
    documents: DataFrame,
    weights: dict[str, int] | None = None,
    token_budget: int = MIXTURE_TOKEN_BUDGET,
) -> DataFrame:
    """Data-mixing plan: given per-source mixture weights and a total
    token budget, compute each source's token inventory, its target
    share, and the sampling rate that hits it — the manifest a mixture
    dataloader (or the sampler above) consumes.

    One per-source aggregate (map-side combined); the arithmetic is a
    single multiply/divide per source so the plan is engine-exact.
    Sources outside the weight map get weight 0 (excluded, rate 0).
    """
    weights = MIXTURE_WEIGHTS if weights is None else weights
    total_w = sum(weights.values())
    w = F.lit(0)
    for src, wt in sorted(weights.items()):
        w = F.when(F.col("source") == src, F.lit(wt)).otherwise(w)
    inv = documents.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(T.token_count("text")).alias("total_tokens"),
    )
    return inv.select(
        "source",
        "n_docs",
        "total_tokens",
        w.alias("weight"),
        (F.lit(token_budget) * w / F.lit(total_w)).alias("target_tokens"),
        F.least(
            F.lit(1.0),
            (F.lit(token_budget) * w / F.lit(total_w)) / F.col("total_tokens"),
        ).alias("sample_rate"),
    )


VOCAB_SIZE = 64


def encode_documents(documents: DataFrame, vocab_size: int = VOCAB_SIZE) -> DataFrame:
    """Vocabulary encoding: map each document's tokens to integer ids
    from the corpus top-`vocab_size` vocabulary (OOV → -1) — the
    tokenizer-apply stage that turns curated text into model input.

    The vocabulary is the wordcount top-k (tiny — vocab_size rows), so
    the token→id join BROADCASTS it; the heavy side is one
    posexplode → broadcast-join → per-doc re-assembly shuffle. Ids are
    assigned by (count desc, token asc) rank — deterministic across
    engines, no hash collisions to reconcile. Sequence order is
    restored with array_sort over (pos, id) structs, not collect order
    (collect_list is partition-order-dependent).
    """
    from pyspark.sql import Window

    # Bounded top-k FIRST (TakeOrderedAndProject — never a global sort),
    # then rank the vocab_size-row result; a row_number over the full
    # distinct-token relation would funnel the whole vocabulary through
    # one partition.
    top = (
        _token_rows(documents)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(vocab_size)
    )
    vocab = top.withColumn(
        "id",
        F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("token"))) - 1,
    ).select("token", "id")
    toks = documents.select(
        "doc_id", F.posexplode(T.tokens("text")).alias("pos", "token")
    ).filter(F.col("token") != "")
    encoded = toks.join(F.broadcast(vocab), "token", "left").select(
        "doc_id",
        "pos",
        F.coalesce(F.col("id"), F.lit(-1)).alias("id"),
    )
    return (
        encoded.groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "id"))).alias("seq"),
            F.sum((F.col("id") == -1).cast("int")).alias("n_oov"),
        )
        .select(
            "doc_id",
            # CSV, not array<int>: engines render arrays differently in
            # comparison layers; a joined string is canonical everywhere
            # (same convention as quiz_mastery's questionids)
            F.array_join(
                F.transform("seq", lambda s: s.getField("id").cast("string")),
                ",",
            ).alias("ids_csv"),
            "n_oov",
        )
    )


def train_val_test_split(
    documents: DataFrame, val_pct: int = 10, test_pct: int = 10
) -> DataFrame:
    """Deterministic train/val/test assignment + per-(source, split)
    counts — the final hand-off of a curation pipeline. Assignment is
    the engine's standard integer hash-bucket compare (no rand(): the
    same document lands in the same split on every run, engine, and
    partitioning — a replay that shuffles documents between train and
    eval silently contaminates the benchmark). One aggregate after a
    scan-stage projection.
    """
    from ..functions.core import hash_bucket

    b = hash_bucket("doc_id", 100)
    split = (
        F.when(b < test_pct, F.lit("test"))
        .when(b < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return (
        documents.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"))
    )


# Gopher-style rule thresholds (Rae et al. 2021, table A1), adapted to
# the synthetic corpus so every rule is live (some docs pass, some
# fail) rather than vacuously green: the corpus' uniform word lengths
# cluster at ~4.5 (Gopher's real-text bound is 3), and its word-soup
# has no punctuation, so the symbol-ratio rule is replaced by the
# repetition (top-token-share) rule from the same suite.
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 1000
GOPHER_MIN_MEAN_WORD_LEN = 4.2
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_TOP_TOKEN_SHARE = 0.12
GOPHER_MIN_STOPWORDS = 2


def gopher_quality_rules(
    documents: DataFrame, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Rule-based quality gate with per-rule verdicts and a drop reason.

    `keep_cols` rides extra input columns through unchanged so pipeline
    compositions (operators/curation.py) can gate without a doc_id
    re-join — the certified single-stage query uses the () default.

    The Gopher/MassiveText filter shape: each rule is an independent
    boolean column (so curation can audit WHICH rule fired, not just
    that a doc vanished), `keep` is their conjunction, and `drop_reason`
    names the first failing rule in a fixed precedence order. All pure
    higher-order-function column expressions over the token array —
    scan-stage, zero Python, zero shuffles; the per-doc top-token-share
    fold is O(distinct·n) on a ≤1000-token doc, i.e. bounded work per
    row, which is exactly what survives a 100 TB scan.
    """
    tk = T.tokens("text")
    d = documents.select(
        "doc_id",
        *keep_cols,
        F.size(tk).alias("n_tokens"),
        (
            F.aggregate(tk, F.lit(0), lambda a, x: a + F.length(x)).cast("double")
            / F.size(tk)
        ).alias("mean_word_len"),
        (
            F.array_max(
                F.transform(
                    F.array_distinct(tk),
                    lambda u: F.size(F.filter(tk, lambda t: t == u)),
                )
            ).cast("double")
            / F.size(tk)
        ).alias("top_token_share"),
        T.marker_hits("text", T.STOPWORDS_EN).alias("n_stop"),
    )
    rules = d.select(
        "*",
        F.col("n_tokens").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS).alias(
            "pass_word_count"
        ),
        F.col("mean_word_len")
        .between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        .alias("pass_word_len"),
        (F.col("top_token_share") <= GOPHER_MAX_TOP_TOKEN_SHARE).alias(
            "pass_repetition"
        ),
        (F.col("n_stop") >= GOPHER_MIN_STOPWORDS).alias("pass_stopwords"),
    )
    return rules.select(
        "*",
        (
            F.col("pass_word_count")
            & F.col("pass_word_len")
            & F.col("pass_repetition")
            & F.col("pass_stopwords")
        ).alias("keep"),
        F.when(~F.col("pass_word_count"), F.lit("word_count"))
        .when(~F.col("pass_word_len"), F.lit("word_len"))
        .when(~F.col("pass_repetition"), F.lit("repetition"))
        .when(~F.col("pass_stopwords"), F.lit("stopwords"))
        .alias("drop_reason"),
    )


def quality_calibrated(documents: DataFrame) -> DataFrame:
    """Per-source calibration of the quality score: decile rank and
    min-max normalization within each source.

    Raw quality scores aren't comparable across sources (a web crawl
    and a books corpus have different score distributions), so
    curation thresholds like "keep the top 30%" must be per-source —
    exactly what a per-source decile gives. Both columns come from ONE
    shuffle on source: ntile + min/max window aggregates over the same
    partition. Deterministic ties via (score, doc_id) total order.
    Degenerate single-score sources yield NULL minmax_norm (0/0)
    rather than a misleading constant.
    """
    from pyspark.sql import Window

    # the text_quality composite, inlined as one scan-stage projection
    # (re-joining text_quality's output would scan the corpus twice)
    d = documents.select(
        "doc_id",
        "source",
        # CASE-guarded: an empty/whitespace doc has length 0 and would
        # throw DIVIDE_BY_ZERO under ANSI mode mid-scan — degenerate
        # docs score NULL instead (mirrored in the oracle)
        F.when(
            F.length("text") > 0,
            (T.marker_hits("text", T.STOPWORDS_EN) / T.token_count("text"))
            - (T.punct_count("text") / F.length("text")),
        ).alias("quality_score"),
    )
    by_src = Window.partitionBy("source")
    # explicit NULLS FIRST: Spark defaults ASC to nulls-first but
    # DuckDB to nulls-last, so the NULL scores the CASE guard emits for
    # empty/whitespace docs would otherwise shift every ntile in that
    # source cross-engine (oracle carries the matching NULLS FIRST)
    order = Window.partitionBy("source").orderBy(
        F.asc_nulls_first("quality_score"), "doc_id"
    )
    return d.select(
        "doc_id",
        "source",
        "quality_score",
        F.ntile(10).over(order).alias("decile"),
        F.when(
            F.max("quality_score").over(by_src)
            != F.min("quality_score").over(by_src),
            (F.col("quality_score") - F.min("quality_score").over(by_src))
            / (
                F.max("quality_score").over(by_src)
                - F.min("quality_score").over(by_src)
            ),
        ).alias("minmax_norm"),
    )


def corpus_dataset_card(documents: DataFrame) -> DataFrame:
    """Per-source "dataset card" — the one-page documentation block a
    corpus release ships with: volume (docs/tokens/chars), language
    spread and dominant language, exact-duplicate rate, the
    quality-gate pass rate, and the median quality score.

    One per-doc scan-stage projection feeds two bounded aggregations
    (per-source stats; per-(source, lang) counts → deterministic
    dominant language via (cnt desc, lang asc) rank) joined broadcast
    on source. Duplicate rate counts sha2 content hashes, so the
    distinct state is 32-byte keys, not document bytes. The median is
    percentile_disc — discrete selection, engine-portable. Everything
    else is integer counts and int/int double divisions, so the whole
    card hash-certifies cross-engine.
    """
    from pyspark.sql import Window

    tk = T.tokens("text")
    base = documents.select(
        "source",
        "lang",
        F.size(tk).alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.sha2("text", 256).alias("h"),
        # same ANSI divide-by-zero guard as quality_calibrated
        F.when(
            F.length("text") > 0,
            (T.marker_hits("text", T.STOPWORDS_EN) / T.token_count("text"))
            - (T.punct_count("text") / F.length("text")),
        ).alias("quality_score"),
        F.size(tk).between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS).alias("pass_wc"),
    )
    per_source = base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        (1 - F.countDistinct("h") / F.count("*")).alias("exact_dup_rate"),
        (F.sum(F.col("pass_wc").cast("int")) / F.count("*")).alias(
            "word_count_pass_rate"
        ),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY quality_score)"
        ).alias("median_quality"),
    )
    lang_rank = Window.partitionBy("source").orderBy(
        F.desc("cnt"), F.asc("lang")
    )
    top_lang = (
        base.groupBy("source", "lang")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rk", F.row_number().over(lang_rank))
        .filter(F.col("rk") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return per_source.join(F.broadcast(top_lang), "source")


STRATIFIED_HASH_MOD = 1_000_003
STRATIFIED_PER_STRATUM = 10


def stratified_sample(
    documents: DataFrame, per_stratum: int = STRATIFIED_PER_STRATUM
) -> DataFrame:
    """Deterministic stratified sample: exactly min(per_stratum, |s|)
    docs per source, selected by hash order — no rand(), so the sample
    is replay-, engine-, and partitioning-stable (the same property
    train_val_test_split relies on), and re-drawing after corpus growth
    keeps previously-sampled docs with high probability (hash order is
    stable; only rank boundaries move).

    Plan shape: one shuffle on `source`, rank within stratum, filter.
    At 100 TB with a bounded per_stratum this is the top-k-per-key
    pattern — the window sort is per-stratum and the filter keeps a
    constant number of rows per group, so no stage materializes more
    than the scan itself.
    """
    from pyspark.sql import Window
    from ..functions.core import hash_bucket

    w = Window.partitionBy("source").orderBy(
        hash_bucket("doc_id", STRATIFIED_HASH_MOD), F.asc("doc_id")
    )
    return (
        documents.select(
            "doc_id", "source", "lang", F.row_number().over(w).alias("strat_rank")
        )
        .filter(F.col("strat_rank") <= per_stratum)
    )


def corpus_snapshot_diff(documents: DataFrame) -> DataFrame:
    """Content diff between two corpus snapshots → one verdict row per
    doc_id: added / removed / changed / unchanged.

    The pipeline-ops primitive behind incremental reprocessing: only
    `added`+`changed` docs need re-curation, `removed` docs need their
    derived artifacts retired. Here the two snapshots are deterministic
    views of the same table (old = doc_id % 7 != 3, new = doc_id % 11
    != 5 with every 5th doc's text revised) so the oracle can mirror
    them exactly; in production the inputs are two partitions of a
    versioned corpus. FULL OUTER join on doc_id; the null pattern of
    the two sides is the verdict. At scale, diff sha2 fingerprints
    instead of raw text so the shuffle carries 32-byte keys — the
    direct text compare here keeps the oracle trivially portable.
    """
    j = (
        _snapshot_old(documents)
        .alias("o")
        .join(_snapshot_new(documents).alias("n"), "doc_id", "full_outer")
    )
    return j.select(
        "doc_id",
        F.when(F.col("o.text").isNull(), F.lit("added"))
        .when(F.col("n.text").isNull(), F.lit("removed"))
        .when(F.col("o.text") != F.col("n.text"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


DRIFT_BIN_WIDTH = 10


def _snapshot_old(documents: DataFrame) -> DataFrame:
    """Deterministic 'previous corpus version' view (shared with
    corpus_snapshot_diff so the two operators describe the same pair
    of snapshots)."""
    return documents.filter(F.col("doc_id") % 7 != 3).select("doc_id", "text")


def _snapshot_new(documents: DataFrame) -> DataFrame:
    """Deterministic 'current corpus version' view: different membership
    and every 5th doc's text revised (the revision appends a token, so
    the two snapshots genuinely differ in length distribution — the
    drift this report exists to detect)."""
    return documents.filter(F.col("doc_id") % 11 != 5).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def corpus_drift_report(
    documents: DataFrame, bin_width: int = DRIFT_BIN_WIDTH
) -> DataFrame:
    """Distribution-drift monitor between two corpus snapshots: the
    token-count histogram of each version, per-bin shares, and the
    chi-square contribution of each bin — the release gate that catches
    'the new crawl skews short' before training does.

    Chi-square, not PSI/KL: the divergence stays RATIONAL (share
    deltas squared over the reference share — squaring is a multiply,
    not libm pow), so the whole report hash-certifies cross-engine
    where a log-based divergence could not. Two histogram aggregations
    (bounded by n_bins) full-outer-joined on bin; totals enter via a
    broadcast of two 1-row aggregates. Bins with no reference mass
    yield NULL contribution (new-only bins are drift by existence —
    flagged by n_old = 0, not by an infinite statistic).
    """
    ho = token_length_histogram(_snapshot_old(documents), bin_width, "n_old")
    hn = token_length_histogram(_snapshot_new(documents), bin_width, "n_new")
    return drift_between_histograms(ho, hn)


def token_length_histogram(
    docs: DataFrame, bin_width: int = DRIFT_BIN_WIDTH, cnt_name: str = "n"
) -> DataFrame:
    """(bin, count) token-length histogram — bounded state regardless of
    corpus size; the mergeable form both drift surfaces build on."""
    return (
        docs.select(F.floor(T.token_count("text") / bin_width).alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias(cnt_name))
    )


def drift_between_histograms(ho: DataFrame, hn: DataFrame) -> DataFrame:
    """The comparison core shared by the batch snapshot report and the
    streaming monitor: full-outer join two (bin, count) histograms,
    normalize to shares, emit per-bin chi-square contributions
    (rational arithmetic throughout — see corpus_drift_report)."""
    j = ho.join(hn, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    totals = j.agg(F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new"))
    shared = j.crossJoin(F.broadcast(totals))
    p_old, p_new = F.col("n_old") / F.col("t_old"), F.col("n_new") / F.col("t_new")
    return shared.select(
        "bin",
        "n_old",
        "n_new",
        p_old.alias("p_old"),
        p_new.alias("p_new"),
        F.when(
            F.col("n_old") > 0, (p_new - p_old) * (p_new - p_old) / p_old
        ).alias("chi2_term"),
    )


FEATURE_HASH_DIM = 64


def feature_hash_vectors(
    documents: DataFrame, dim: int = FEATURE_HASH_DIM
) -> DataFrame:
    """Feature hashing (the hashing trick, Weinberger et al. 2009 —
    sklearn's HashingVectorizer): text → sparse `dim`-dimensional
    bag-of-words vector with NO vocabulary table. Each token hashes to
    a dimension; a second hash bit supplies a ±1 sign so collisions
    cancel in expectation instead of biasing counts. The cheap
    everywhere-deterministic featurizer for similarity, clustering,
    and quality-classifier features when real embeddings are too
    expensive — and unlike vocabulary encoding, completely stateless
    (no fit step, no vocab broadcast, nothing to version).

    Output is COLUMNAR sparse form (doc_id, dim, v) with exact-zero
    cells dropped — the layout the centroid/cosine operators consume,
    and the one that scales (no per-row array materialization). The
    token hash is the char-fold polynomial (functions/text.fingerprint)
    so DuckDB reproduces every cell bit-for-bit; at 100 TB swap in
    xxhash64 per token (fingerprint_fast's rationale — rows-only then).
    Everything else is integer arithmetic: dim = h mod dim, sign from
    the next hash bit (h mod 2·dim ≥ dim → −1), v = Σ sign.
    """
    tok = documents.select(
        "doc_id", F.explode(T.tokens("text")).alias("token")
    ).filter(F.col("token") != "")
    h = T.fingerprint(F.col("token"))
    signed = tok.select(
        "doc_id",
        F.pmod(h, F.lit(dim)).cast("int").alias("dim"),
        F.when(F.pmod(h, F.lit(2 * dim)) >= dim, F.lit(-1))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("sign"),
    )
    return (
        signed.groupBy("doc_id", "dim")
        .agg(F.sum("sign").alias("v"))
        .filter(F.col("v") != 0)
    )


HASHED_KNN_QUERY_MOD = 100  # every 100th doc is a query (bounded batch)
HASHED_KNN_K = 5


def hashed_knn(
    documents: DataFrame,
    k: int = HASHED_KNN_K,
    query_mod: int = HASHED_KNN_QUERY_MOD,
) -> DataFrame:
    """Exact cosine top-k over the feature-hashed vectors — retrieval
    on the stateless featurizer, no embedding model anywhere. The
    sparse COLUMNAR form makes the dot product a dim-keyed equi-join +
    sum (only dimensions where BOTH sides are non-zero ever pair), and
    with a bounded query batch (every query_mod-th doc) the work is
    |query nnz| × per-dim corpus density — the same bounded-batch
    contract as knn_bruteforce, minus the dense arrays.

    Fully hash-certifiable: dot products and squared norms are integer
    sums; sqrt is IEEE-correctly-rounded and the final division
    deterministic, so cosine values match DuckDB bit-for-bit. Ties
    break (cosine desc, nid asc).
    """
    from pyspark.sql import Window

    vec = feature_hash_vectors(documents)
    norms = vec.groupBy("doc_id").agg(F.sum(F.col("v") * F.col("v")).alias("sq"))
    q = vec.filter(F.col("doc_id") % query_mod == 0).select(
        F.col("doc_id").alias("qid"), "dim", F.col("v").alias("vq")
    )
    c = vec.select(F.col("doc_id").alias("nid"), "dim", F.col("v").alias("vn"))
    dots = (
        q.join(c, "dim")
        .filter(F.col("qid") != F.col("nid"))
        .groupBy("qid", "nid")
        .agg(F.sum(F.col("vq") * F.col("vn")).alias("dot"))
    )
    scored = (
        dots.join(
            norms.select(F.col("doc_id").alias("qid"), F.col("sq").alias("sq_q")),
            "qid",
        )
        .join(
            norms.select(F.col("doc_id").alias("nid"), F.col("sq").alias("sq_n")),
            "nid",
        )
        .select(
            "qid",
            "nid",
            (
                F.col("dot")
                / (F.sqrt(F.col("sq_q")) * F.sqrt(F.col("sq_n")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", "cosine", "rank")
    )


def compression_ratio_scores(documents: DataFrame) -> DataFrame:
    """DEFLATE compression ratio per document — the classic cheap
    redundancy signal (highly repetitive text compresses far below
    ~0.5; near-random word soup stays high). Used as a quality gate
    alongside the LM perplexity score.

    zlib is stdlib and deterministic at a fixed level, but not
    expressible in SQL → rows-only registry entry; the ordering
    semantics (repetitive ≪ diverse) are pinned by test instead.
    Arrow-vectorized pandas_udf: the only Python boundary is batched,
    and the operator is embarrassingly parallel (scan-stage, no
    shuffle).
    """
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def comp_ratio(texts: pd.Series) -> pd.Series:
        import zlib

        def ratio(t: str) -> float:
            raw = t.encode("utf-8")
            if not raw:
                return 1.0
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(ratio)

    return documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        comp_ratio(F.col("text")).alias("comp_ratio"),
    )


# ---------------------------------------------------------------------------
# Oracle-checked query registry
# ---------------------------------------------------------------------------

def _q(fn):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_table(spark, sf_dir, "documents"))

    return runner


def _token_rows(documents: DataFrame) -> DataFrame:
    """(doc_id, token) row form — explode + empty-token guard, all
    codegen. The base relation for every frequency operator below."""
    return documents.select(
        "doc_id", F.explode(T.tokens("text")).alias("token")
    ).filter(F.col("token") != "")


def vocabulary_topk(documents: DataFrame, k: int = 50) -> DataFrame:
    """Global top-k vocabulary with counts — the corpus-statistics pass
    every tokenizer-training / vocab-pruning pipeline starts with.

    Classic wordcount shape: the per-partition partial aggregation
    (map-side combine) collapses each partition to its distinct tokens
    before the single shuffle on `token`; the top-k is
    TakeOrderedAndProject, never a full sort. Deterministic tie-break
    (count desc, token asc) so results are replay-stable."""
    return (
        _token_rows(documents)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(k)
    )


COVERAGE_TOPNS = (100, 1_000, 10_000)


def vocab_coverage_curve(
    documents: DataFrame, top_ns: tuple[int, ...] = COVERAGE_TOPNS
) -> DataFrame:
    """What fraction of the corpus token mass the top-N vocabulary
    terms cover, at several N — the tokenizer/vocab-size design
    diagnostic (the coverage a BPE vocab truncated at N would retain
    against whole-word tokens; vocabulary_topk shows WHO the head is,
    this shows how heavy it is).

    Scale shape: one wordcount exchange (map-side combined), then the
    HEAD of the distribution via TakeOrderedAndProject at max(top_ns)
    rows (bounded per-partition heaps — never a global sort of the
    vocabulary), ranked by a single window over those <= max-N rows
    (driver-bounded, constant). The total token mass is a 1-row
    aggregate joined by the broadcast-normalizer idiom; coverage is
    an exact bigint/bigint divide. Deterministic head tie-break
    (cnt desc, token asc) — replay-stable even across engines where
    rank-boundary ties exist.

    Queued for round 11 (`corpus_vocab_coverage`, ORACLE_R11)."""
    from pyspark.sql import Window

    counts = _token_rows(documents).groupBy("token").agg(
        F.count("*").alias("cnt")
    )
    top_n = max(top_ns)
    head = (
        counts.orderBy(F.desc("cnt"), F.asc("token"))
        .limit(top_n)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("cnt"), F.asc("token"))
            ),
        )
    )
    total = counts.agg(
        F.sum("cnt").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
    )
    ns = documents.sparkSession.createDataFrame(
        [(int(n),) for n in sorted(top_ns)], "top_n long"
    )
    return (
        head.join(F.broadcast(ns), F.col("rank") <= F.col("top_n"))
        .groupBy("top_n")
        .agg(F.sum("cnt").cast("long").alias("covered_tokens"))
        .crossJoin(F.broadcast(total))  # 1-row normalizer
        .select(
            "top_n",
            "covered_tokens",
            "total_tokens",
            "vocab_size",
            (
                F.col("covered_tokens").cast("double")
                / F.col("total_tokens")
            ).alias("coverage"),
        )
    )


def bigram_simpson(documents: DataFrame) -> DataFrame:
    """Per-source bigram concentration report — Simpson's index over
    the word-bigram distribution (Σ cᵢ² / total², the probability two
    random bigrams coincide) plus the top-1 bigram share and distinct
    counts. The diversity/templatedness diagnostic: scraped template
    corpora show high concentration (few bigrams dominate) long before
    per-doc repetition scores flag any single page — entropy is the
    textbook measure but needs ln(); Simpson is its RATIONAL twin
    (exact bigint squares + one IEEE division), so the result is
    engine-exact and hash-checkable.

    Plan: per-doc bigram rows (posexplode + lead window, codegen'd,
    one doc_id shuffle) → (source, bigram) counts (map-side combined —
    the heavy hitters collapse locally, so the exchange carries the
    distinct-bigram relation, not the corpus) → per-source rollup.
    Overflow note: Σ cᵢ² ≤ total² fits bigint while total < 3×10⁹
    bigrams per source; at 100 TB promote the square to decimal(38,0)
    — flagged here rather than silently wrapped.

    Queued for round 13 (`corpus_bigram_simpson`, ORACLE_R13)."""
    from pyspark.sql import Window

    tok = documents.select(
        "source", "doc_id", F.posexplode(T.tokens("text")).alias("pos", "t")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        tok.select(
            "source",
            F.concat_ws(" ", F.col("t"), F.lead("t", 1).over(w)).alias("bigram"),
            F.lead("t", 1).over(w).alias("_next"),
        )
        .filter(F.col("_next").isNotNull())
        .drop("_next")
    )
    counts = bg.groupBy("source", "bigram").agg(F.count("*").alias("cnt"))
    return (
        counts.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("total_bigrams"),
            F.count(F.lit(1)).cast("long").alias("distinct_bigrams"),
            F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("simpson_num"),
            F.max("cnt").cast("long").alias("top1_cnt"),
        )
        .select(
            "source",
            "total_bigrams",
            "distinct_bigrams",
            "simpson_num",
            "top1_cnt",
            (
                F.col("simpson_num").cast("double")
                / (F.col("total_bigrams") * F.col("total_bigrams"))
            ).alias("simpson"),
            (F.col("top1_cnt").cast("double") / F.col("total_bigrams")).alias(
                "top1_share"
            ),
        )
    )


def repetition_scores(documents: DataFrame) -> DataFrame:
    """Per-document repetition metrics — the Gopher/C4-style quality
    heuristic that drops boilerplate and degenerate pages: the share of
    the single most-frequent token, and the type/token ratio.

    Two aggregations: (doc_id, token) term frequencies, then a per-doc
    rollup. The second shuffle moves one row per (doc, distinct token)
    — already combiner-reduced. Ratios are rational (exact-int divides
    in double), never ln() — bit-stable across engines."""
    tf = (
        _token_rows(documents)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.max("tf").alias("top_tf"),
            F.count("*").alias("n_types"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "top_tf",
            "n_types",
            (F.col("top_tf").cast("double") / F.col("n_tokens")).alias(
                "top_token_share"
            ),
            (F.col("n_types").cast("double") / F.col("n_tokens")).alias(
                "type_token_ratio"
            ),
        )
    )


def token_doc_frequency(documents: DataFrame) -> DataFrame:
    """Document frequency per token plus the rational inverse ratio
    n_docs/df. ln() is deliberately absent: libm low bits differ across
    engines (a log-based IDF can never hash-match an oracle), and the
    monotone ratio ranks terms identically.

    distinct(doc_id, token) → one shuffle on token; the corpus-size
    scalar joins in as a broadcast of a 1-row aggregate."""
    df_tbl = (
        _token_rows(documents)
        .dropDuplicates(["doc_id", "token"])
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )
    total = documents.agg(F.count("*").alias("n_docs"))
    return df_tbl.crossJoin(F.broadcast(total)).select(
        "token",
        "df",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("df")).alias("idf_ratio"),
    )


def tfidf_top_terms(documents: DataFrame, k: int = 3) -> DataFrame:
    """Top-k characteristic terms per document by tf × (n_docs/df) —
    the keyword-extraction / dedup-feature pass, with the rational IDF
    above. Score = (tf·n_docs)/df computed as exact-int product over
    exact-int divisor in double — bit-stable.

    The tf↔df join shuffles on `token`. The df side is vocabulary-sized
    — orders smaller than the token stream but not provably
    broadcast-small at 100 TB, so no broadcast hint: AQE picks
    broadcast when the built vocabulary actually fits."""
    tf = (
        _token_rows(documents)
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    scored = tf.join(token_doc_frequency(documents), "token").select(
        "doc_id",
        "token",
        "tf",
        (
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df").cast("double")
        ).alias("tfidf"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "tfidf", "rank")
    )


BOILERPLATE_N = 5
BOILERPLATE_MIN_DOCS = 3


def boilerplate_ngrams(
    documents: DataFrame, n: int = BOILERPLATE_N, min_docs: int = BOILERPLATE_MIN_DOCS
) -> DataFrame:
    """Cross-document repeated n-grams — C4-style boilerplate/template
    detection: a shingle appearing verbatim in ≥ min_docs documents is
    navigation chrome, a license header, a scraped template.

    shingle_rows (posexplode + lead, all codegen) → distinct per doc →
    one shuffle on the shingle. The distinct BEFORE the count makes the
    metric docs-containing, not occurrences — a single spammy doc can't
    promote its own refrain to 'boilerplate'."""
    sh = T.shingle_rows(documents, "doc_id", "text", n, distinct=True)
    return (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def doc_boilerplate_fraction(
    documents: DataFrame, n: int = BOILERPLATE_N, min_docs: int = BOILERPLATE_MIN_DOCS
) -> DataFrame:
    """Per-document boilerplate share: the fraction of a doc's distinct
    n-gram shingles that are corpus-level boilerplate — the score the
    curation filter thresholds on.

    The shingle relation feeds two branches (corpus counts + per-doc
    join-back), so it localCheckpoints once (DAG branches recompute
    otherwise); the boilerplate set is vocabulary-small after the
    min_docs filter and broadcasts into the join-back."""
    sh = (
        T.shingle_rows(documents, "doc_id", "text", n, distinct=True)
        .localCheckpoint(eager=True)
    )
    common = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("shingle")
    )
    flagged = sh.join(F.broadcast(common), "shingle", "left_semi")
    per_doc = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    per_doc_common = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_boilerplate")
    )
    return (
        per_doc.join(per_doc_common, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_boilerplate"), F.lit(0)).alias("n_boilerplate"),
            (
                F.coalesce(F.col("n_boilerplate"), F.lit(0)).cast("double")
                / F.col("n_shingles")
            ).alias("boilerplate_frac"),
        )
    )


def lm_perplexity_scores(documents: DataFrame, add_k: float = 0.5) -> DataFrame:
    """CCNet-style n-gram LM quality scoring: train a bigram language
    model on a deterministic half of the corpus (xxhash64 doc split —
    replay-stable, no rand()), then score EVERY document by its average
    negative log-probability. High avg_nll ⇒ out-of-distribution text
    (gibberish, boilerplate soup, wrong language) — the classic
    perplexity gate between heuristic filters and dedup in an LLM
    curation stack.

    Model: P(w₂|w₁) = (c(w₁,w₂) + k) / (c(w₁) + k·V), add-k smoothed,
    V = training vocabulary size. Scoring is two LEFT joins of the
    document bigram rows against the count tables — at real vocabulary
    sizes those tables shard by key (no broadcast hint; AQE broadcasts
    only if they measure small), the document side streams, and unseen
    bigrams fall back to the smoothed floor via coalesce.

    Rows-only by design: ln() is libm (not bit-portable across
    engines); correctness is pinned by the in-distribution <
    out-of-distribution ordering test instead.
    """
    from pyspark.sql import Window

    toks = documents.select(
        "doc_id", F.posexplode(T.tokens("text")).alias("pos", "token")
    ).filter(F.col("token") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        toks.withColumn("next", F.lead("token").over(w))
        .filter(F.col("next").isNotNull())
        .select("doc_id", "token", "next")
    )
    is_train = F.xxhash64(F.col("doc_id")) % 2 == 0
    train = bigrams.filter(is_train)
    c2 = train.groupBy("token", "next").agg(F.count("*").alias("c2"))
    c1 = train.groupBy("token").agg(F.count("*").alias("c1"))
    vocab = train.select(F.col("token").alias("v_tok")).union(
        train.select(F.col("next"))
    ).distinct().agg(F.count("*").alias("v"))
    scored = (
        bigrams.join(c2, ["token", "next"], "left")
        .join(c1, ["token"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (
                -F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(add_k))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(add_k) * F.col("v"))
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.avg("nll").alias("avg_nll"),
    )


# --- round-6 curation-budget operators ------------------------------------

TOKEN_BUDGET_PER_SOURCE = 1500
BUDGET_HASH_MOD = 1_000_003
BUDGET_PREFIX_BUCKETS = 32


def token_budget_cap(
    documents: DataFrame, budget: int = TOKEN_BUDGET_PER_SOURCE
) -> DataFrame:
    """Per-source token-budget capping: admit each source's documents
    in deterministic hash-priority order until the source's cumulative
    token count exceeds `budget` — the quota stage that stops one
    crawler dump from drowning the mixture. No rand(): the admitted
    set is identical on every run, engine, and partitioning.

    Built as a DISTRIBUTED PREFIX SUM, not a naive per-source window:
    `Window.partitionBy(source)` would drag a whole source through ONE
    task — with 5 sources and 100 TB that is 5 tasks doing 20 TB each.
    Instead the hash-priority space is cut into BUDGET_PREFIX_BUCKETS
    ordered ranges; stage 1 aggregates per-(source, bucket) token
    totals (tiny: sources × 32 rows), stage 2 turns them into running
    offsets with a window over that TINY relation, stage 3 broadcasts
    the offsets back and cumulates only WITHIN each (source, bucket)
    partition — every heavy window partition is 1/32 of a source and
    the cut count scales with the cluster. Result is bit-identical to
    the single-window form (all-integer arithmetic), which is exactly
    what the oracle runs.
    """
    from pyspark.sql import Window

    from ..functions.core import hash_bucket

    per_bucket = BUDGET_HASH_MOD // BUDGET_PREFIX_BUCKETS + 1
    d = documents.select(
        "doc_id",
        "source",
        T.token_count("text").cast("long").alias("n_tokens"),
        hash_bucket("doc_id", BUDGET_HASH_MOD).alias("h"),
    ).withColumn("bucket", (F.col("h") / per_bucket).cast("int"))
    totals = d.groupBy("source", "bucket").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    off_w = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "source",
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(off_w), F.lit(0)).alias(
            "offset"
        ),
    )
    cum_w = (
        Window.partitionBy("source", "bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.join(F.broadcast(offsets), ["source", "bucket"])
        .select(
            "doc_id",
            "source",
            "n_tokens",
            (F.sum("n_tokens").over(cum_w) + F.col("offset")).alias(
                "cum_tokens"
            ),
        )
        .withColumn("kept", F.col("cum_tokens") <= budget)
    )


TEMP_SAMPLE_HALF_DIVISOR = 2  # draw total_docs // 2 across all sources


def temperature_mixture_sample(documents: DataFrame) -> DataFrame:
    """Temperature-smoothed source mixture (the GPT-3 / multilingual-LM
    rebalancing trick): sampling weight ∝ n_docs^α flattens the source
    distribution so head sources stop dominating and tail sources are
    upsampled relative to their share. α is fixed at 0.5 — not just a
    reasonable temperature but the ONE exponent computable as sqrt(),
    which IEEE 754 requires to be correctly rounded; pow(x, 0.7) is
    libm and its low bits differ across engines, so a 0.7-temperature
    plan could never hash-certify. The weight normalizer folds the
    per-source sqrt terms in source order (double addition is
    order-sensitive; both engines fold the identical sorted list).

    Output: the sampled documents (doc_id, source, rank, target_n) —
    per-source hash-priority rank ≤ target_n = floor(N · share), with
    N = total_docs // 2. The per-source rank window carries the same
    scale caveat as any per-key ranking; at 100 TB it becomes the
    bucketed prefix-count of token_budget_cap (count per hash bucket,
    find the threshold bucket, rank within it).
    """
    from ..functions.core import hash_bucket

    inv = documents.groupBy("source").agg(F.count("*").alias("n_docs"))
    norm = inv.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "n_docs"))),
            F.lit(0.0),
            lambda acc, x: acc + F.sqrt(x["n_docs"].cast("double")),
        ).alias("w_total"),
        F.floor(
            F.sum("n_docs") / F.lit(TEMP_SAMPLE_HALF_DIVISOR)
        ).cast("long").alias("sample_n"),
    )
    targets = inv.crossJoin(F.broadcast(norm)).select(
        "source",
        F.floor(
            F.col("sample_n")
            * (F.sqrt(F.col("n_docs").cast("double")) / F.col("w_total"))
        ).cast("long").alias("target_n"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        hash_bucket("doc_id", BUDGET_HASH_MOD), "doc_id"
    )
    return (
        documents.select("doc_id", "source")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .join(F.broadcast(targets), "source")
        .filter(F.col("rank") <= F.col("target_n"))
        .select("doc_id", "source", "rank", "target_n")
    )


def curriculum_stages(documents: DataFrame) -> DataFrame:
    """Curriculum ordering: stage each document 1 (easiest) → 4
    (hardest) by mean token commonness — the average document
    frequency of its token occurrences. Documents made of corpus-common
    vocabulary land early; rare-vocabulary documents land late — the
    standard frequency-based curriculum signal.

    Stage boundaries are the corpus quartiles of the score, computed
    with percentile_disc (a SELECTION of an actual score — no
    interpolation, so the thresholds are bit-identical cross-engine)
    and broadcast as a 1-row aggregate; assignment is then a pure
    scan-stage CASE — no global ntile() window, which would funnel the
    whole corpus through one task at scale. Join shape: token
    occurrences ⋈ the df table on token (shards by key; AQE broadcasts
    the df side only if it measures small).
    """
    occ = _token_rows(documents)
    df_tbl = (
        occ.dropDuplicates(["doc_id", "token"])
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )
    per_doc = (
        occ.join(df_tbl, "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (F.sum("df").cast("double") / F.count("*")).alias("mean_df"),
        )
    )
    qs = per_doc.agg(
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY mean_df)"
        ).alias("q25"),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY mean_df)"
        ).alias("q50"),
        F.expr(
            "percentile_disc(0.75) WITHIN GROUP (ORDER BY mean_df)"
        ).alias("q75"),
    )
    scored = documents.select("doc_id").join(per_doc, "doc_id", "left")
    return scored.crossJoin(F.broadcast(qs)).select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("mean_df", F.lit(0.0)).alias("mean_df"),
        F.when(F.coalesce("mean_df", F.lit(0.0)) >= F.col("q75"), 1)
        .when(F.coalesce("mean_df", F.lit(0.0)) >= F.col("q50"), 2)
        .when(F.coalesce("mean_df", F.lit(0.0)) >= F.col("q25"), 3)
        .otherwise(4)
        .alias("stage"),
    )


SHARD_TOKEN_TARGET = 4096


def assign_training_shards(
    documents: DataFrame, shard_tokens: int = SHARD_TOKEN_TARGET
) -> DataFrame:
    """Deterministic training-shard assignment: lay the whole corpus
    out in ONE global hash-priority order (the epoch shuffle — no
    rand(), so every run, engine, and partitioning produces the same
    training order) and cut it into shards of ~`shard_tokens` tokens
    by the document's STARTING offset in the global token stream. This
    is the WebDataset/tar-shard writer's placement problem: shards of
    near-equal token mass, reproducible order, no driver-side sort.

    Same distributed prefix sum as token_budget_cap — but GLOBAL
    rather than per-source: a single `Window.orderBy(...)` would drag
    100 TB through one task, so the hash space is cut into
    BUDGET_PREFIX_BUCKETS ordered ranges; per-bucket token totals
    (32 rows) become running offsets via a window over that tiny
    relation, and the heavy cumsum runs per-bucket. All-integer
    arithmetic → bit-identical to the single-window oracle form.
    shard_id uses integer `div` (not float /): cum_tokens exceeds
    2^53 long before 100 TB, where double division would misplace
    boundary documents. A doc longer than `shard_tokens` still gets
    the shard of its starting offset (spans are the reader's concern).
    """
    from pyspark.sql import Window

    from ..functions.core import hash_bucket

    per_bucket = BUDGET_HASH_MOD // BUDGET_PREFIX_BUCKETS + 1
    d = documents.select(
        "doc_id",
        "source",
        T.token_count("text").cast("long").alias("n_tokens"),
        hash_bucket("doc_id", BUDGET_HASH_MOD).alias("h"),
    ).withColumn("bucket", (F.col("h") / per_bucket).cast("int"))
    totals = d.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    off_w = (
        Window.orderBy("bucket")  # BUDGET_PREFIX_BUCKETS rows — tiny
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(off_w), F.lit(0)).alias(
            "offset"
        ),
    )
    cum_w = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            (F.sum("n_tokens").over(cum_w) + F.col("offset")).alias(
                "cum_tokens"
            ),
        )
        .withColumn(
            "shard_id",
            F.expr(f"(cum_tokens - n_tokens) div {int(shard_tokens)}"),
        )
    )


def shard_manifest(
    documents: DataFrame, shard_tokens: int = SHARD_TOKEN_TARGET
) -> DataFrame:
    """Shard manifest — the writer's output contract: one row per
    shard with its document count, token mass, and an order-independent
    integrity checksum (bit_xor of member doc_ids: overflow-free,
    partitioning-invariant, and cheap to re-verify after any copy).
    first/last global offsets pin each shard's byte-range analogue so
    a reader can address the epoch stream without scanning neighbors.
    Single exchange over shard_id on top of the prefix-sum assignment."""
    return (
        assign_training_shards(documents, shard_tokens)
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("shard_token_mass"),
            F.min(F.col("cum_tokens") - F.col("n_tokens")).alias(
                "first_offset"
            ),
            F.max("cum_tokens").alias("last_offset"),
            F.bit_xor(F.col("doc_id").cast("long")).alias("id_xor"),
        )
    )


def assign_training_shards_incremental(
    new_docs: DataFrame,
    corpus: DataFrame | None = None,
    shard_tokens: int = SHARD_TOKEN_TARGET,
    base_tokens: int | None = None,
) -> DataFrame:
    """Append a delta batch to an EXISTING shard layout without
    re-sharding: the standing corpus' epoch layout (and every shard
    file already written from it) stays untouched, and the delta is
    laid out in its own hash-priority order starting at the standing
    corpus' total token mass — the batch twin of the streaming
    global-offset continuation in `curation_ingest_job` (one corpus
    grows across many ingest runs; re-running `assign_training_shards`
    on the union would reshuffle every existing doc into different
    shards and invalidate the already-written files).

    The standing corpus contributes ONE number (sum of token counts —
    a map-side-combined aggregate, no window, no ordering); only the
    delta runs the bucketed prefix sum (same shape as
    `assign_training_shards`). A shard straddling the boundary
    receives both old and new docs — by the same starting-offset rule
    the reader already handles for long documents.

    ADVICE r9: even that one aggregate is a full-corpus scan PER
    delta, and the caller usually already knows the number — the
    streaming twin (`curation_ingest_job`) persists used_tokens as
    state, and a batch pipeline can read the previous run's
    max(cum_tokens). Pass it as `base_tokens` to skip the scan
    entirely (then `corpus` may be None); the corpus aggregate is the
    fallback for first runs / callers without a manifest.

    Registered as `corpus_shards_incremental` (round 9, delta =
    `doc_id % 10 == 0` per the cross-corpus convention), hash-checked
    against the DuckDB mirror in ORACLE.
    """
    from pyspark.sql import Window

    from ..functions.core import hash_bucket

    if base_tokens is not None:
        base = new_docs.sparkSession.range(1).select(
            F.lit(int(base_tokens)).cast("long").alias("base_tokens")
        )
    elif corpus is not None:
        base = corpus.agg(
            F.coalesce(
                F.sum(T.token_count("text").cast("long")), F.lit(0)
            ).alias("base_tokens")
        )
    else:
        raise ValueError("pass either a standing corpus or base_tokens")
    per_bucket = BUDGET_HASH_MOD // BUDGET_PREFIX_BUCKETS + 1
    d = new_docs.select(
        "doc_id",
        "source",
        T.token_count("text").cast("long").alias("n_tokens"),
        hash_bucket("doc_id", BUDGET_HASH_MOD).alias("h"),
    ).withColumn("bucket", (F.col("h") / per_bucket).cast("int"))
    totals = d.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    off_w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )  # ≤ BUDGET_PREFIX_BUCKETS rows
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(off_w), F.lit(0)).alias(
            "offset"
        ),
    )
    cum_w = (
        Window.partitionBy("bucket")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.join(F.broadcast(offsets), "bucket")
        .crossJoin(F.broadcast(base))  # 1-row global-offset normalizer
        .select(
            "doc_id",
            "source",
            "n_tokens",
            (
                F.sum("n_tokens").over(cum_w)
                + F.col("offset")
                + F.col("base_tokens")
            ).alias("cum_tokens"),
        )
        .withColumn(
            "shard_id",
            F.expr(f"(cum_tokens - n_tokens) div {int(shard_tokens)}"),
        )
    )


QUALITY_FILL_BUDGET = 30_000  # global token budget for the registry query
# Fixed score ranges for the ordered prefix sum. Width matters for
# PARALLELISM, not correctness: bucket = floor((1-q)/width) is
# monotonically non-increasing in q for ANY bucket count, so the
# concatenated (bucket, score desc, h, doc_id) ordering — and thus
# every cum_tokens value — is identical at any Q. Real corpora
# concentrate: at 64 buckets the sf1 rehearsal put 92% of documents in
# THREE buckets (scores cluster near 0), capping the cumsum stage at
# ~3 tasks and driving the 5.5× wall at 10× (SCALE.md §4-r7b). 8192
# slices of width ~0.00024 spread the same corpus over ~10² buckets
# and keep per-bucket window work bounded as depth grows; the offsets
# relation stays ≤ used-buckets rows — broadcast-tiny either way.
QUALITY_BUCKETS = 8192


def quality_budget_fill(
    documents: DataFrame, budget: int = QUALITY_FILL_BUDGET
) -> DataFrame:
    """Best-documents-under-a-budget: fill a GLOBAL token budget from
    the highest-quality documents down — the curation decision "we can
    afford N tokens of training data; take the best N" as one query.
    Ordering key is text_quality's composite score (two
    correctly-rounded IEEE double divisions of exact integer operands —
    single rounding step per term, so cross-engine deterministic), ties
    broken by hash then doc_id so equal-quality docs admit reproducibly.

    Scale shape: the same distributed prefix sum as token_budget_cap /
    assign_training_shards, but ordered by QUALITY, not hash — the
    score's bounded range [-1, 1] is cut into QUALITY_BUCKETS fixed
    width ranges (quantization is data-independent, so bucket
    boundaries are deterministic — no sampled rangepartitioning),
    per-bucket token totals become running offsets, and the heavy
    cumsum runs within buckets. Degenerate empty docs score NULL and
    sort last (they consume budget only after every scored doc).

    Round-8 refinement (SCALE.md §4-r7b showed 5.5× wall at 10×): real
    score distributions have ATOMS — at sf1, 30% of the corpus scores
    exactly 0.0 (no stopwords and no punctuation) — and an atom defeats
    any score quantization, serializing its whole cumsum onto one task.
    Within an equal-score run, though, the ordering key CONTINUES with
    (h, doc_id), and hash ranges cut that order contiguously. So:
    buckets whose min score equals their max score (detected with one
    tiny bucket-level aggregate — data-dependent but deterministic, and
    exact by construction) are sub-cut into BUDGET_PREFIX_BUCKETS hash
    ranges; heterogeneous buckets keep sub = 0. The offsets walk
    (bucket, sub) in lexicographic order, which is exactly the global
    ordering either way.

    The scored per-doc relation (5 narrow columns, no text) is
    materialized once (eager localCheckpoint) and feeds all three
    consumers (bucket stats, totals, final cumsum). Without it the
    score expression tree — big enough that the shuffle-write
    projection drops out of whole-stage codegen into interpreted eval,
    which shares NO subexpressions, re-splitting the text per
    reference — is recomputed per consumer: measured 5.1 s → 1.65 s at
    sf1 (SCALE.md §4-r8). O(corpus-rows) narrow bytes, the same
    reuse-vs-recompute trade the winnowing family makes.
    """
    from pyspark.sql import Window

    from ..functions.core import hash_bucket

    score = F.when(
        (F.length("text") > 0) & (T.token_count("text") > 0),
        (T.marker_hits("text", T.STOPWORDS_EN) / T.token_count("text"))
        - (T.punct_count("text") / F.length("text")),
    )
    d = documents.select(
        "doc_id",
        T.token_count("text").cast("long").alias("n_tokens"),
        score.alias("quality_score"),
        hash_bucket("doc_id", BUDGET_HASH_MOD).alias("h"),
    ).withColumn(
        "bucket",
        F.when(
            F.col("quality_score").isNull(), F.lit(QUALITY_BUCKETS)
        ).otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(QUALITY_BUCKETS - 1),
                    F.floor(
                        (F.lit(1.0) - F.col("quality_score"))
                        / F.lit(2.0 / QUALITY_BUCKETS)
                    ).cast("int"),
                ),
            )
        ),
    ).localCheckpoint(eager=True)  # one scan feeds all three consumers
    # constant-score buckets (incl. the all-NULL bucket) → h-range
    # sub-cut is order-exact; ~score-bucket-count rows, broadcast
    bstats = d.groupBy("bucket").agg(
        F.min("quality_score").alias("_qmin"),
        F.max("quality_score").alias("_qmax"),
    )
    per_h = BUDGET_HASH_MOD // BUDGET_PREFIX_BUCKETS + 1
    d = d.join(F.broadcast(bstats), "bucket").withColumn(
        "sub",
        F.when(
            F.col("_qmin").eqNullSafe(F.col("_qmax")),
            (F.col("h") / per_h).cast("int"),
        ).otherwise(F.lit(0)),
    )
    totals = d.groupBy("bucket", "sub").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    off_w = Window.orderBy("bucket", "sub").rowsBetween(  # tiny relation
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "bucket",
        "sub",
        F.coalesce(F.sum("bucket_tokens").over(off_w), F.lit(0)).alias(
            "offset"
        ),
    )
    cum_w = (
        Window.partitionBy("bucket", "sub")
        .orderBy(F.desc_nulls_last("quality_score"), "h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.join(F.broadcast(offsets), ["bucket", "sub"])
        .select(
            "doc_id",
            "n_tokens",
            "quality_score",
            (F.sum("n_tokens").over(cum_w) + F.col("offset")).alias(
                "cum_tokens"
            ),
        )
        .withColumn("kept", F.col("cum_tokens") <= budget)
    )


NOVELTY_SHINGLE_N = 3


def ngram_novelty(documents: DataFrame, n: int = NOVELTY_SHINGLE_N) -> DataFrame:
    """Per-document n-gram novelty against the corpus ordered by
    doc_id: what fraction of a document's distinct word n-grams appear
    here FIRST (no earlier doc contains them)? The curation signal
    behind "is this document adding anything": boilerplate reposts
    score near 0, genuinely fresh text near 1 — and the novelty curve
    over ingest order is the standard diminishing-returns diagnostic
    for corpus growth (RefinedWeb/Gopher-style dedup analyses track
    exactly this before paying for full near-dup passes).

    Shape: distinct (doc, shingle) rows → min(doc_id) per shingle (the
    first-occurrence table, map-side combined) → equi-join back on
    shingle → one count/count aggregate per doc. Everything is keyed
    by shingle or doc_id — corpus-token-linear, the same scale class
    as corpus_token_df; no pairwise comparison anywhere. Docs shorter
    than n tokens have no shingles and drop out (nothing to be novel
    with). novelty_frac is one double division of two exact BIGINTs.
    """
    from ..functions.text import shingle_rows

    sh = shingle_rows(documents, "doc_id", "text", n, distinct=True)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_shingles")).alias(
                "novelty_frac"
            ),
        )
    )


def source_vocab_overlap(documents: DataFrame) -> DataFrame:
    """Pairwise source-level vocabulary overlap — the mixture-design
    diagnostic: before weighting sources into a training mix, know
    which ones are near-copies of each other (high Jaccard) and which
    are subsets (high containment). One row per unordered source pair
    (a < b) with exact distinct-token intersection, per-source
    vocabulary sizes, Jaccard, and containment-of-the-smaller.

    Shape: distinct (source, token) rows → token-keyed self-join
    (a.source < b.source) → count per pair. A token present in all S
    sources contributes S(S-1)/2 pair rows — S is a constant (~20), so
    the join output is vocabulary-linear, never quadratic in corpus
    size. Vocabulary sizes are an S-row aggregate, broadcast into the
    (at most S²-row) pair grid built from itself — zero-overlap pairs
    surface with n_inter = 0 rather than vanishing. Ratios are single
    double divisions of exact BIGINTs.
    """
    st = (
        documents.select("source", F.explode(T.tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .dropDuplicates(["source", "token"])
    )
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).alias("n_vocab"))
    inter = (
        st.alias("a")
        .join(
            st.alias("b"),
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    grid = (
        sizes.select(F.col("source").alias("source_a"), F.col("n_vocab").alias("n_a"))
        .join(
            sizes.select(
                F.col("source").alias("source_b"), F.col("n_vocab").alias("n_b")
            ),
            F.col("source_a") < F.col("source_b"),
        )
    )
    return (
        grid.join(F.broadcast(inter), ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            F.coalesce("n_inter", F.lit(0)).alias("n_inter"),
            "n_a",
            "n_b",
            (
                F.coalesce("n_inter", F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce("n_inter", F.lit(0)))
            ).alias("jaccard"),
            (
                F.coalesce("n_inter", F.lit(0)).cast("double")
                / F.least("n_a", "n_b")
            ).alias("containment_min"),
        )
    )


WINNOW_K = 3  # words per gram
WINNOW_W = 4  # grams per winnowing window


def winnowing_fingerprints(
    documents: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    variant: str = "fast",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word k-gram, slide a
    w-gram window, keep each window's MINIMUM hash (rightmost position
    on ties), dedup selections. The guarantee the plain
    every-nth-fingerprint schemes lack: any shared run of at least
    w+k-1 words between two documents is caught by at least one
    common fingerprint, while storing only ~2/(w+1) of the grams.

    Output: one row per selected fingerprint (doc_id, fp_pos, fp) —
    the inventory substring-plagiarism/overlap detection joins on.

    variant='fast' (default): xxhash64 gram hashes — codegen, the
    corpus-scale form. variant='poly': the character-fold rolling hash
    the DuckDB oracle reproduces bit-for-bit (certified separately,
    the doc_fingerprints pattern).

    Shape (optimization r16, guide §2.4): the whole selection is
    per-row ARRAY work — tokenize once, build the gram-hash array with
    a higher-order transform, slide the window with array slices, dedup
    selections with array_distinct — so the inventory is produced with
    ZERO exchanges (the previous posexplode + lead-window form shuffled
    and sorted the entire token stream by doc_id first). Values are
    identical: same gram strings, same hashes, same rightmost-argmin
    tie-break, same (doc_id, fp_pos) dedup. Docs with fewer than
    w+k-1 words emit nothing (no full window; the substring-dedup
    family owns that regime).
    """
    return _winnow_selections(documents, k, w, variant).select(
        "doc_id",
        F.explode(F.array_distinct("_sels")).alias("_s"),
    ).select("doc_id", F.col("_s.fp_pos").alias("fp_pos"), F.col("_s.fp").alias("fp"))


def _winnow_selections(
    documents: DataFrame, k: int, w: int, variant: str
) -> DataFrame:
    """(doc_id, _sels: array<struct<fp_pos long, fp long>>) — one
    winnowing selection struct per sliding window (duplicates across
    windows NOT yet deduped; callers array_distinct before exploding).

    Three chained projections, each materializing the array the next
    one references multiple times (the CollapseProject barrier
    functions.text.shingle_rows documents): tokens → gram hashes →
    window selections. split() and the gram hashing run once per row.
    spread_small_scan parallelizes the per-row work for sub-split
    local inputs (no-op at scale — see functions.text).
    """
    from ..functions.text import spread_small_scan

    step1 = spread_small_scan(documents, "doc_id").select(
        "doc_id", T.tokens("text").alias("_ts")
    )
    t = F.col("_ts")
    if variant == "poly":
        # Per-TOKEN pre-fold (optimization r16, guide §1.2 step 2 —
        # per-task work): the naive form char-folds every GRAM, so each
        # character is folded k times and every gram allocates a
        # concat_ws string plus a split() char array. Instead fold each
        # token's characters ONCE into (h = poly hash, pw = 31^len mod p)
        # and combine k token structs per gram with the rolling-hash
        # identity  H(a ++ ' ' ++ b) = H(a)·31^(len(b)+1)
        #                              + 32·31^len(b) + H(b)  (mod p),
        # which is exact integer arithmetic (every factor < p ≈ 2^30,
        # products < 2^60 — no overflow, no float). Values are
        # bit-identical to the char fold (property-tested in
        # tests/test_textops.py), so the DuckDB oracle is unchanged.
        mod = T.FINGERPRINT_MOD
        base = T.FINGERPRINT_BASE
        tok_fold = lambda tok: F.aggregate(  # noqa: E731
            F.filter(F.split(tok, ""), lambda ch: ch != ""),
            F.struct(
                F.lit(0).cast("long").alias("h"),
                F.lit(1).cast("long").alias("pw"),
            ),
            lambda acc, ch: F.struct(
                ((acc["h"] * base + F.ascii(ch)) % mod).alias("h"),
                ((acc["pw"] * base) % mod).alias("pw"),
            ),
        )
        # separate projection: _tp is referenced k times per gram, so
        # CollapseProject keeps the (expensive) per-token fold out of
        # the gram lambda — one fold per token, the shingle_rows rule
        step1 = step1.select(
            "doc_id", "_ts", F.transform(t, tok_fold).alias("_tp")
        )
        tp = F.col("_tp")
        def gram_hash(i):
            acc = F.element_at(tp, i)["h"]
            for j in range(1, k):
                nxt = F.element_at(tp, i + j)
                acc = (
                    acc * ((nxt["pw"] * base) % mod)
                    + (nxt["pw"] * 32) % mod
                    + nxt["h"]
                ) % mod
            return acc
    else:
        gram = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(t, i + j) for j in range(k)]
        )
        gram_hash = lambda i: F.xxhash64(gram(i))  # noqa: E731
    harr = F.when(
        F.size(t) >= k,
        F.transform(F.sequence(F.lit(1), F.size(t) - (k - 1)), gram_hash),
    ).otherwise(F.array().cast("array<long>"))
    step2 = step1.select("doc_id", harr.alias("_h"))
    h = F.col("_h")
    # window starting at gram s (1-based) covers h[s .. s+w-1]; the
    # selected gram is the RIGHTMOST one attaining the window minimum
    # (array_position over the reversed window), reported at its
    # 0-based gram position to match the posexplode-era fp_pos.
    sel = lambda s: F.struct(  # noqa: E731
        (s + w - F.array_position(F.reverse(F.slice(h, s, w)),
                                  F.array_min(F.slice(h, s, w))) - 1
         ).cast("long").alias("fp_pos"),
        F.array_min(F.slice(h, s, w)).alias("fp"),
    )
    sels = F.when(
        F.size(h) >= w,
        F.transform(F.sequence(F.lit(1), F.size(h) - (w - 1)), sel),
    ).otherwise(F.array().cast("array<struct<fp_pos:bigint,fp:bigint>>"))
    return step2.select("doc_id", sels.alias("_sels"))


WINNOW_MIN_SHARED = 2   # pairs must share at least this many prints
WINNOW_MAX_FP_DF = 50   # boilerplate guard: drop prints in > this many docs


def winnowing_overlap_pairs(
    documents: DataFrame,
    min_shared: int = WINNOW_MIN_SHARED,
    max_fp_df: int = WINNOW_MAX_FP_DF,
    variant: str = "fast",
    fps: DataFrame | None = None,
) -> DataFrame:
    """Document-overlap detection over the winnowing fingerprints —
    the MOSS use of the inventory: pairs of documents sharing at least
    `min_shared` selected fingerprints, i.e. near-certain shared runs
    of ≥ w+k-1 words each. The boilerplate guard drops fingerprints
    present in more than `max_fp_df` documents BEFORE pairing
    (licenses/headers selected everywhere would otherwise pair
    quadratically within their posting list — the same hot-key
    exclusion as corpus_boilerplate_ngrams, and at MOSS's own
    suggestion: ubiquitous prints carry no plagiarism signal).

    Shape: fingerprint inventory → df count per fp (map-side combined)
    → rare-fp semi-join → fp-keyed self-join (posting lists bounded by
    max_fp_df, so pair output per fp is ≤ df²/2 with df capped) → pair
    count. Everything is keyed; no pairwise stage over the corpus.

    Pass a precomputed distinct (doc_id, fp) relation via `fps` to
    share ONE winnowing selection across diagnostics (the composed
    entry's contract) — a caller-provided relation is already
    materialized by the sharing caller and is not re-checkpointed
    (the threshold_yield_curve / ADVICE r15 #2 discipline).
    """
    if fps is None:
        fps = (
            winnowing_fingerprints(documents, variant=variant)
            .select("doc_id", "fp")
            .dropDuplicates(["doc_id", "fp"])
            # both sides of the self-join plus the df count read this
            # — materialize the (expensive) selection once
            .localCheckpoint(eager=True)
        )
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_fp_df)
        .select("fp")
    )
    kept = fps.join(rare, "fp", "left_semi")
    return (
        kept.alias("a")
        .join(
            kept.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnowing_overlap_clusters(
    documents: DataFrame,
    min_shared: int = WINNOW_MIN_SHARED,
    max_fp_df: int = WINNOW_MAX_FP_DF,
    variant: str = "fast",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Passage-sharing document CLUSTERS: connected components over
    the winnowing overlap pairs, through the same candidate-source-
    agnostic min-label engine every dup family reuses
    (dedup.near_dup_clusters). Where MinHash clusters group documents
    that are near-copies AS A WHOLE, these group documents stitched
    together by SHARED PASSAGES (license pools, quote chains,
    template families) — the grouping a curation pass reviews before
    deciding whether a passage pool is boilerplate to scrub
    (substring_dedup's job) or duplication to collapse. Output:
    (doc_id, cluster_rep) for every doc in a sharing component.

    Pass a precomputed (doc_a, doc_b, …) overlap relation via `pairs`
    to share one pairing pass (the composed entry's contract)."""
    from .dedup import near_dup_clusters

    if pairs is None:
        pairs = winnowing_overlap_pairs(
            documents, min_shared=min_shared, max_fp_df=max_fp_df,
            variant=variant,
        )
    return near_dup_clusters(pairs.select("doc_a", "doc_b"))


def winnowing_overlap_cross_corpus(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    min_shared: int = WINNOW_MIN_SHARED,
    max_fp_df: int = WINNOW_MAX_FP_DF,
    variant: str = "fast",
    new_fps: DataFrame | None = None,
    corpus_fps: DataFrame | None = None,
) -> DataFrame:
    """Delta-vs-corpus winnowing overlap — the production ingest shape
    (cross_corpus_minhash_pairs' pattern applied to MOSS): a daily
    delta is checked against a 100 TB corpus WITHOUT corpus-internal
    or delta-internal pairing — only delta prints ⋈ corpus prints
    join. The corpus fingerprint relation is exactly what a deployment
    persists once and reuses per delta (content-addressed: append-only
    corpus ⇒ append-only print index — the same artifact
    winnow_index_job accumulates); here it is computed fresh for the
    honest cold cost, LIBRARY operator (the registry certifies the
    within-corpus form, `docs_winnowing_overlap`, whose oracle covers
    the identical selection + pairing arithmetic).

    The df cap is computed over the CORPUS side — boilerplate is a
    property of the corpus, and judging it from the delta would let a
    small delta smuggle a ubiquitous print past the guard.
    Output: (new_id, corpus_id, n_shared) with n_shared ≥ min_shared.

    `new_fps`/`corpus_fps` accept precomputed distinct (doc_id, fp)
    relations for each side (a doc's fingerprints are independent of
    which side it lands on, so the composed entry splits ONE shared
    selection) — caller-provided relations are already materialized
    and are not re-checkpointed.
    """
    if new_fps is None:
        new_fps = (
            winnowing_fingerprints(new_docs, variant=variant)
            .select("doc_id", "fp")
            .dropDuplicates(["doc_id", "fp"])
        )
    if corpus_fps is None:
        corpus_fps = (
            winnowing_fingerprints(corpus_docs, variant=variant)
            .select("doc_id", "fp")
            .dropDuplicates(["doc_id", "fp"])
            .localCheckpoint(eager=True)  # df count + probe join
        )
    nf = new_fps.select(F.col("doc_id").alias("new_id"), "fp")
    cf = corpus_fps.select(F.col("doc_id").alias("corpus_id"), "fp")
    rare = (
        cf.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_fp_df)
        .select("fp")
    )
    return (
        nf.join(cf.join(rare, "fp", "left_semi"), "fp")
        .groupBy("new_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def source_winnow_overlap_matrix(
    documents: DataFrame,
    max_fp_df: int = WINNOW_MAX_FP_DF,
    variant: str = "fast",
    fps: DataFrame | None = None,
) -> DataFrame:
    """Source-pair PASSAGE-overlap matrix: the winnowing analogue of
    `dedup.source_dup_matrix`. Exact-text overlap between two crawl
    sources only catches byte-identical re-fetches; shared winnowing
    fingerprints catch sources that carry the same PASSAGES inside
    different framing (mirrors with injected boilerplate, partial
    scrapes, syndicated articles). For every source pair (a < b):
    each side's distinct rare-fingerprint count, the count shared by
    both, and the Jaccard of the two fingerprint sets — the
    source-level triage number read before paying for document-level
    winnowing dedup across that pair.

    Plan shape mirrors source_dup_matrix: the winnowing selection is
    the only corpus-sized pass; fingerprints collapse to distinct
    (source, fp) rows (per-fp fan-out in the pair join is then ≤ S
    per side, S = source count); ubiquitous prints (document-df >
    max_fp_df) are dropped FIRST — license headers shared by every
    source are noise, not signal, and would otherwise dominate every
    pair's overlap count. The S-row sizes relation broadcasts into an
    S×S grid left join so zero-overlap pairs surface as 0 rows.
    Sources with no surviving fingerprints (every doc shorter than
    one winnowing window) carry no overlap evidence and are absent.

    variant='poly' is the DuckDB-certified form (registered round 9
    as `source_winnow_overlap_matrix`); 'fast' (xxhash64) is the
    corpus-scale default, same selection algorithm. `fps` accepts a
    precomputed distinct (doc_id, fp) relation to share one selection
    across diagnostics (already materialized by the sharing caller,
    so not re-checkpointed here).
    """
    if fps is None:
        fps = (
            winnowing_fingerprints(documents, variant=variant)
            .select("doc_id", "fp")
            .dropDuplicates(["doc_id", "fp"])
            # the df count and the semi-join back both read this —
            # materialize the (expensive) selection once, the
            # winnowing_overlap_pairs pattern
            .localCheckpoint(eager=True)
        )
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_fp_df)
        .select("fp")
    )
    src_fp = (
        fps.join(rare, "fp", "left_semi")
        .join(documents.select("doc_id", "source"), "doc_id")
        .select("source", "fp")
        .distinct()
        # three consumers: sizes and both sides of the pair join
        .localCheckpoint(eager=True)
    )
    sizes = src_fp.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("fps")
    )
    grid = (
        sizes.alias("ga")
        .join(
            F.broadcast(sizes.alias("gb")),
            F.col("ga.source") < F.col("gb.source"),
        )
        .select(
            F.col("ga.source").alias("source_a"),
            F.col("gb.source").alias("source_b"),
            F.col("ga.fps").alias("fps_a"),
            F.col("gb.fps").alias("fps_b"),
        )
    )
    overlaps = (
        src_fp.alias("a")
        .join(src_fp.alias("b"), "fp")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
    )
    return (
        grid.join(overlaps, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "fps_a",
            "fps_b",
            F.coalesce("shared_fps", F.lit(0)).cast("long").alias("shared_fps"),
            (
                F.coalesce("shared_fps", F.lit(0)).cast("double")
                / (
                    F.col("fps_a")
                    + F.col("fps_b")
                    - F.coalesce("shared_fps", F.lit(0))
                )
            ).alias("fp_jaccard"),
        )
    )


FERTILITY_VOCAB_SIZE = 64


def source_token_fertility(
    documents: DataFrame, vocab_size: int = FERTILITY_VOCAB_SIZE
) -> DataFrame:
    """Per-source tokenizer-fertility report: how many subword tokens
    each source pays per whitespace word (fertility), and what share
    of its words fall outside the corpus top-`vocab_size` vocabulary
    (oov_rate) — the mixture-design diagnostic that says which
    sources will consume more of a fixed TOKEN budget than their word
    mass suggests, and which will shatter into fallback bytes. Both
    ratios use the engine's certified token accountants: whitespace
    words (`token_count`) and the BPE-ish regex tokenizer
    (`bpe_token_count` — letter runs / digit runs / single symbols,
    RE2-compatible so DuckDB evaluates the identical pattern).

    Scale shape: the word/subword counts are ONE scan aggregate (JVM
    regexp_count, no explode); only the OOV rate explodes tokens, and
    its vocabulary side is the bounded top-k (TakeOrderedAndProject,
    never a global sort — the encode_documents rule) broadcast into
    the token stream. Ratios are single IEEE divisions of exact longs
    (deterministic cross-engine); word-less sources report 0.0 rather
    than a division by zero, whose NULL-vs-Infinity handling differs
    between engines.

    Registered round 9 as `source_token_fertility`, hash-checked
    against the DuckDB mirror in ORACLE.
    """
    base = (
        documents.select(
            "source",
            T.token_count("text").cast("long").alias("w"),
            T.bpe_token_count("text").cast("long").alias("s"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("n_words"),
            F.sum("s").cast("long").alias("n_subword_tokens"),
        )
    )
    tok = documents.select(
        "source", F.explode(T.tokens("text")).alias("token")
    ).filter(F.col("token") != "")
    top = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(vocab_size)
        .select("token", F.lit(1).alias("_v"))
    )
    oov = (
        tok.join(F.broadcast(top), "token", "left")
        .groupBy("source")
        .agg(
            F.sum(F.col("_v").isNull().cast("long"))
            .cast("long")
            .alias("n_oov_words")
        )
    )
    ratio = lambda num: F.when(  # noqa: E731
        F.col("n_words") > 0, num.cast("double") / F.col("n_words")
    ).otherwise(F.lit(0.0))
    return base.join(oov, "source", "left").select(
        "source",
        "n_docs",
        "n_words",
        "n_subword_tokens",
        F.coalesce("n_oov_words", F.lit(0)).cast("long").alias("n_oov_words"),
        ratio(F.col("n_subword_tokens")).alias("fertility"),
        ratio(F.coalesce("n_oov_words", F.lit(0))).alias("oov_rate"),
    )


def length_quantiles_exact(documents: DataFrame) -> DataFrame:
    """Per-source EXACT token-length quartiles + p95 via explicit
    row_number selection — the corpus length report every tokenizer /
    packing / truncation decision reads, certified with the
    convention-free pattern COVERAGE.md's round-7 portability rule
    prescribes: 'the element at sorted position ceil(q·n)' computed
    with integer arithmetic ((q_num·n + q_den − 1) div q_den), no
    percentile_disc anywhere, so no discrete-quantile index convention
    can drift between engine releases.

    Shape: one per-source rank window over doc-grain rows plus one
    aggregate — two shuffles on source. Ties in n_tokens cannot
    perturb the selected VALUE (position k of a sorted multiset is
    value-determined)."""
    from pyspark.sql import Window

    d = documents.select(
        "source", T.token_count("text").cast("long").alias("n_tokens")
    )
    ws = Window.partitionBy("source").orderBy("n_tokens")
    ranked = (
        d.withColumn("rn", F.row_number().over(ws))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("source")))
    )
    picks = {
        "p25_tokens": "(n + 3) div 4",
        "p50_tokens": "(n + 1) div 2",
        "p75_tokens": "(3 * n + 3) div 4",
        "p95_tokens": "(19 * n + 19) div 20",
    }
    return ranked.groupBy("source").agg(
        F.max("n").alias("n_docs"),
        *[
            F.max(
                F.when(F.col("rn") == F.expr(pos), F.col("n_tokens"))
            ).alias(name)
            for name, pos in picks.items()
        ],
    )


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
    "benchmark_contamination": _q(benchmark_contamination),
    "documents_chunked": _q(chunk_documents),
    "text_char_diversity": _q(char_diversity_scores),
    "corpus_vocabulary_topk": _q(vocabulary_topk),
    "text_repetition_scores": _q(repetition_scores),
    "corpus_token_df": _q(token_doc_frequency),
    "text_tfidf_top_terms": _q(tfidf_top_terms),
    "corpus_boilerplate_ngrams": _q(boilerplate_ngrams),
    "text_boilerplate_fraction": _q(doc_boilerplate_fraction),
    "text_normalized": _q(normalize_documents),
    "chunks_packed": _q(pack_training_sequences),
    "docs_quality_tiered_sample": _q(quality_tiered_sample),
    "docs_vocab_encoded": _q(encode_documents),
    "docs_train_val_test": _q(train_val_test_split),
    "corpus_mixture_plan": _q(corpus_mixture_plan),
    # rows-only: ln() is libm, not bit-portable cross-engine; ordering
    # semantics pinned by test instead
    "docs_lm_perplexity": _q(lm_perplexity_scores),
    "docs_gopher_quality": _q(gopher_quality_rules),
    "docs_quality_calibrated": _q(quality_calibrated),
    "corpus_dataset_card": _q(corpus_dataset_card),
    "docs_stratified_sample": _q(stratified_sample),
    "corpus_snapshot_diff": _q(corpus_snapshot_diff),
    "corpus_drift_report": _q(corpus_drift_report),
    # rows-only: DEFLATE output length is not SQL-expressible; ordering
    # semantics (repetitive ≪ diverse) pinned by test
    "docs_compression_ratio": _q(compression_ratio_scores),
    "docs_feature_hashed": _q(feature_hash_vectors),
    "docs_hashed_knn": _q(hashed_knn),
    "docs_token_budget_cap": _q(token_budget_cap),
    "docs_mixture_temperature": _q(temperature_mixture_sample),
    "docs_curriculum_stages": _q(curriculum_stages),
    "corpus_shard_manifest": _q(shard_manifest),
    "docs_quality_budget_fill": _q(quality_budget_fill),
    # round 7
    "docs_ngram_novelty": _q(ngram_novelty),
    "source_vocab_overlap": _q(source_vocab_overlap),
    # hash-matched against the DuckDB char-fold mirror (the
    # doc_fingerprints two-variant pattern; xxhash64 is the scale
    # default, exercised by tests)
    "docs_winnowing_fingerprints": _q(
        lambda d: winnowing_fingerprints(d, variant="poly")
    ),
    # the scale default (xxhash64 gram hashes → rows-only check; the
    # positions selected depend on the hash values, so the two variants
    # differ row-for-row — the poly twin certifies the selection
    # ALGORITHM, and the shared-run detection guarantee is test-pinned
    # for both variants)
    "docs_winnowing_fingerprints_fast": _q(winnowing_fingerprints),
    # hash-certified end-to-end through the poly variant (detection is
    # hash-dependent: which prints exist decides which pairs surface)
    "docs_winnowing_overlap": _q(
        lambda d: winnowing_overlap_pairs(d, variant="poly")
    ),
    "docs_length_quantiles_exact": _q(length_quantiles_exact),
    # round 8: the two r7 library ops promoted to certified slots
    "docs_winnowing_clusters": _q(
        lambda d: winnowing_overlap_clusters(d, variant="poly")
    ),
    "docs_winnowing_cross_corpus": _q(
        # deterministic new/corpus split, same contract as
        # dedup_cross_corpus: every 10th doc is the arriving delta
        lambda d: winnowing_overlap_cross_corpus(
            d.filter(F.col("doc_id") % 10 == 0),
            d.filter(F.col("doc_id") % 10 != 0),
            variant="poly",
        )
    ),
    # round 9: the two queued library ops promoted to certified slots
    # (oracles written and type-audited in round 8)
    "docs_decontamination_stats": _q(decontamination_stats),
    "corpus_shards_incremental": _q(
        # deterministic delta/corpus split, same contract as
        # dedup_cross_corpus: every 10th doc is the arriving delta
        lambda d: assign_training_shards_incremental(
            d.filter(F.col("doc_id") % 10 == 0),
            d.filter(F.col("doc_id") % 10 != 0),
        )
    ),
    # round 9 additions: source-pair passage overlap (the winnowing
    # analogue of source_dup_matrix; poly variant certified, the
    # doc_fingerprints two-variant pattern) and per-source tokenizer
    # fertility
    "source_winnow_overlap_matrix": _q(
        lambda d: source_winnow_overlap_matrix(d, variant="poly")
    ),
    "source_token_fertility": _q(source_token_fertility),
}

_TOKENS = "regexp_split_to_array(trim(text), ' +')"

# Round-11 promotion queue (the ORACLE_R10 pattern: library op + tests
# + ready oracle now, window slot next round). BIGINT[] cast on the
# top_n dim for the same reason the yield-curve dim casts DOUBLE[]
# (bare literals bind narrow types the typed-row hash would reject).
ORACLE_R11 = {
    "corpus_vocab_coverage": """
        WITH tok AS (
            SELECT unnest(__TOKENS__) AS token FROM documents
        ),
        counts AS (
            SELECT token, count(*) AS cnt
            FROM tok WHERE token <> '' GROUP BY token
        ),
        total AS (
            SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens,
                   CAST(count(*) AS BIGINT) AS vocab_size
            FROM counts
        ),
        head AS (
            SELECT cnt,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS rank
            FROM counts
            QUALIFY rank <= __COV_MAX_N__
        ),
        ns AS (
            SELECT unnest(CAST([__COV_NS__] AS BIGINT[])) AS top_n
        )
        SELECT n.top_n,
               CAST(SUM(h.cnt) AS BIGINT) AS covered_tokens,
               t.total_tokens, t.vocab_size,
               CAST(SUM(h.cnt) AS DOUBLE) / t.total_tokens AS coverage
        FROM ns n JOIN head h ON h.rank <= n.top_n, total t
        GROUP BY 1, 3, 4
    """.replace("__TOKENS__", _TOKENS)
       .replace("__COV_MAX_N__", str(max(COVERAGE_TOPNS)))
       .replace("__COV_NS__", ", ".join(str(n) for n in sorted(COVERAGE_TOPNS))),
}

# Round-12 promotion queue. Same hash_bucket integer recipe the
# split/tier samplers certify against; the one double division is
# IEEE-exact on both engines, and the (priority, doc_id) sort makes
# the k-boundary deterministic even under priority collisions.
ORACLE_R12 = {
    "docs_weighted_sample": f"""
        SELECT doc_id, source, n_chars,
               CAST(h AS DOUBLE) / (n_chars + 1) AS priority
        FROM (
            SELECT doc_id, source, n_chars,
                   ((doc_id % 2147483647) * 2654435761)
                       % {_WS_HASH_MOD} + 1 AS h
            FROM documents
        )
        ORDER BY priority, doc_id
        LIMIT {WEIGHTED_SAMPLE_K}
    """,
}
_STOP_LIST = ", ".join(f"'{w}'" for w in T.STOPWORDS_EN)

# Shared winnowing-selection mirror (char-fold gram hashes → w-window
# minima → rightmost-on-ties → distinct selections), used by the
# fingerprint inventory, overlap-pair, cluster, and cross-corpus
# oracles. CTE body only — callers prepend WITH / WITH RECURSIVE.
_WINNOW_SEL_SQL = f"""g AS (
            SELECT doc_id,
                   [list_reduce(
                        [ascii(s[j])::BIGINT
                         for j in range(1, length(s) + 1)],
                        (a, b) -> (a * {T.FINGERPRINT_BASE} + b)
                                      % {T.FINGERPRINT_MOD})
                    for s in [array_to_string(w[i:i+{WINNOW_K - 1}], ' ')
                              for i in range(1, len(w) - {WINNOW_K - 2})]]
                       AS hs
            FROM (SELECT doc_id, {_TOKENS} AS w FROM documents)
            WHERE len(w) >= {WINNOW_K}
        ),
        wins AS (
            SELECT doc_id, hs, unnest(range(0, len(hs) - {WINNOW_W} + 1))
                       AS p
            FROM g WHERE len(hs) >= {WINNOW_W}
        ),
        winnow_sel AS (
            SELECT DISTINCT doc_id,
                   CAST(p + list_max(
                       [i for i in range(1, {WINNOW_W} + 1)
                        if hs[p + i] = list_min(hs[p+1:p+{WINNOW_W}])]) - 1
                       AS BIGINT) AS fp_pos,
                   CAST(list_min(hs[p+1:p+{WINNOW_W}]) AS BIGINT) AS fp
            FROM wins
        )"""

# Selection → rare-fp gate → pair counting, shared by the overlap-pair
# and cluster oracles. CTE body only, like _WINNOW_SEL_SQL.
_WINNOW_PAIR_CTES = f"""{_WINNOW_SEL_SQL},
        fps AS (SELECT DISTINCT doc_id, fp FROM winnow_sel),
        rare AS (
            SELECT fp FROM fps GROUP BY fp
            HAVING count(*) <= {WINNOW_MAX_FP_DF}
        ),
        kept AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp)),
        wpairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM kept a JOIN kept b
              ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING count(*) >= {WINNOW_MIN_SHARED}
        )"""


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
    "text_normalized": f'''
        WITH n AS (
            SELECT doc_id, text,
                   trim(regexp_replace(regexp_replace(text,
                       '{CONTROL_CHARS_PATTERN}', '', 'g'),
                       '{WS_RUN_PATTERN}', ' ', 'g')) AS text_norm
            FROM documents
        )
        SELECT doc_id, text_norm,
               text_norm != text AS changed,
               CAST(length(text) - length(text_norm) AS INTEGER)
                   AS n_chars_saved
        FROM n
    ''',
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
    # sparse dot-product join over the hashed vectors; integer dots and
    # squared norms, IEEE sqrt, (cosine desc, nid) ties
    "docs_hashed_knn": f"""
        WITH tok AS (
            SELECT doc_id, unnest({_TOKENS}) AS token FROM documents
        ),
        h AS (
            SELECT doc_id,
                   list_reduce(
                       [ascii(token[i])::BIGINT
                        for i in range(1, length(token) + 1)],
                       (a, b) -> (a * {T.FINGERPRINT_BASE} + b)
                                     % {T.FINGERPRINT_MOD}
                   ) AS hv
            FROM tok WHERE token != ''
        ),
        vec AS (
            SELECT doc_id,
                   CAST(hv % {FEATURE_HASH_DIM} AS INTEGER) AS dim,
                   CAST(sum(CASE WHEN (hv % {2 * FEATURE_HASH_DIM})
                                      >= {FEATURE_HASH_DIM}
                                 THEN -1 ELSE 1 END) AS BIGINT) AS v
            FROM h GROUP BY 1, 2
            HAVING sum(CASE WHEN (hv % {2 * FEATURE_HASH_DIM})
                                 >= {FEATURE_HASH_DIM}
                            THEN -1 ELSE 1 END) != 0
        ),
        norms AS (
            SELECT doc_id, sum(v * v) AS sq FROM vec GROUP BY doc_id
        ),
        dots AS (
            SELECT q.doc_id AS qid, c.doc_id AS nid, sum(q.v * c.v) AS dot
            FROM vec q JOIN vec c ON q.dim = c.dim
            WHERE q.doc_id % {HASHED_KNN_QUERY_MOD} = 0
              AND q.doc_id != c.doc_id
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT d.qid, d.nid,
                   d.dot / (sqrt(nq.sq) * sqrt(nc.sq)) AS cosine
            FROM dots d
            JOIN norms nq ON d.qid = nq.doc_id
            JOIN norms nc ON d.nid = nc.doc_id
        )
        SELECT qid, nid, cosine,
               CAST(ROW_NUMBER() OVER (PARTITION BY qid
                    ORDER BY cosine DESC, nid ASC) AS INTEGER) AS rank
        FROM scored
        QUALIFY rank <= {HASHED_KNN_K}
    """,
    # per-token char-fold hash (same arithmetic as text_fingerprints),
    # dim + sign as pure integer mod/compare, signed counts summed
    "docs_feature_hashed": f"""
        WITH tok AS (
            SELECT doc_id, unnest({_TOKENS}) AS token FROM documents
        ),
        h AS (
            SELECT doc_id,
                   list_reduce(
                       [ascii(token[i])::BIGINT
                        for i in range(1, length(token) + 1)],
                       (a, b) -> (a * {T.FINGERPRINT_BASE} + b)
                                     % {T.FINGERPRINT_MOD}
                   ) AS hv
            FROM tok WHERE token != ''
        )
        SELECT doc_id,
               CAST(hv % {FEATURE_HASH_DIM} AS INTEGER) AS dim,
               CAST(sum(CASE WHEN (hv % {2 * FEATURE_HASH_DIM})
                                  >= {FEATURE_HASH_DIM}
                             THEN -1 ELSE 1 END) AS BIGINT) AS v
        FROM h GROUP BY 1, 2
        HAVING sum(CASE WHEN (hv % {2 * FEATURE_HASH_DIM})
                             >= {FEATURE_HASH_DIM}
                        THEN -1 ELSE 1 END) != 0
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
    "text_char_diversity": """
        WITH counts AS (
            SELECT doc_id, ch, count(*) AS c
            FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
                  FROM documents)
            WHERE ch <> ''
            GROUP BY doc_id, ch
        )
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_chars,
               count(*) AS n_distinct_chars,
               1.0 - CAST(sum(c * c) AS DOUBLE)
                     / (CAST(sum(c) AS DOUBLE) * sum(c)) AS gini_diversity,
               max({'c': c, 'ch': ch}).ch AS top_char,
               CAST(max({'c': c, 'ch': ch}).c AS DOUBLE) / sum(c)
                   AS top_char_ratio
        FROM counts GROUP BY doc_id
    """,
    "benchmark_contamination": f"""
        WITH sh AS (
            SELECT doc_id, unnest([array_to_string(w[i:i+2], ' ')
                                   for i in range(1, len(w) - 1)]) AS shingle
            FROM (SELECT doc_id, {_TOKENS} AS w FROM documents)
            WHERE len(w) >= 3
        ),
        bench AS (
            SELECT DISTINCT shingle FROM sh
            WHERE doc_id IN (SELECT doc_id FROM documents
                             WHERE source = '{BENCH_SOURCE}')
        ),
        train AS (
            SELECT * FROM sh
            WHERE doc_id NOT IN (SELECT doc_id FROM documents
                                 WHERE source = '{BENCH_SOURCE}')
        )
        SELECT t.doc_id,
               count(*) AS n_shingles,
               CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_contaminated,
               CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*) AS contamination_rate
        FROM train t LEFT JOIN bench b ON t.shingle = b.shingle
        GROUP BY t.doc_id
    """,
    "documents_chunked": f"""
        WITH toks AS (SELECT doc_id, source, {_TOKENS} AS w FROM documents),
        chunks AS (
            SELECT doc_id, source, w,
                   unnest(range(0, CAST(ceil(greatest(len(w), 1)
                                             / {CHUNK_STRIDE}.0) AS BIGINT)))
                       AS chunk_idx
            FROM toks
        )
        SELECT doc_id, source, CAST(chunk_idx AS INTEGER) AS chunk_idx,
               array_to_string(w[chunk_idx * {CHUNK_STRIDE} + 1
                                 : chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}],
                               ' ') AS chunk_text,
               CAST(least(len(w) - chunk_idx * {CHUNK_STRIDE}, {CHUNK_TOKENS})
                    AS INTEGER) AS n_chunk_tokens
        FROM chunks
        WHERE chunk_idx * {CHUNK_STRIDE} < len(w)
          AND (chunk_idx = 0
               OR (chunk_idx - 1) * {CHUNK_STRIDE} + {CHUNK_TOKENS} < len(w))
    """,
    "docs_train_val_test": """
        WITH d AS (
            SELECT source,
                   CASE WHEN ((doc_id % 2147483647) * 2654435761) % 100 < 10
                            THEN 'test'
                        WHEN ((doc_id % 2147483647) * 2654435761) % 100 < 20
                            THEN 'val'
                        ELSE 'train' END AS split
            FROM documents
        )
        SELECT source, split, count(*) AS n_docs FROM d GROUP BY 1, 2
    """,
    "docs_vocab_encoded": f"""
        WITH w AS (SELECT doc_id, {_TOKENS} AS w FROM documents),
        tok AS (
            SELECT doc_id, unnest(range(1, len(w) + 1)) AS pos, w FROM w
        ),
        t AS (
            SELECT doc_id, pos, w[pos] AS token FROM tok WHERE w[pos] != ''
        ),
        vcounts AS (
            SELECT token, count(*) AS cnt FROM t GROUP BY token
        ),
        vocab AS (
            SELECT token, id FROM (
                SELECT token,
                       row_number() OVER (ORDER BY cnt DESC, token ASC) - 1
                           AS id
                FROM vcounts
            ) WHERE id < {VOCAB_SIZE}
        ),
        enc AS (
            SELECT t.doc_id, t.pos, COALESCE(v.id, -1) AS id
            FROM t LEFT JOIN vocab v USING (token)
        )
        SELECT doc_id,
               array_to_string(list(id ORDER BY pos), ',') AS ids_csv,
               CAST(sum(CASE WHEN id = -1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_oov
        FROM enc GROUP BY doc_id
    """,
    "docs_quality_tiered_sample": f"""
        WITH d AS (
            SELECT doc_id, source, len({_TOKENS}) AS n_tokens,
                   CASE WHEN len({_TOKENS}) >= 40 THEN 100
                        WHEN len({_TOKENS}) >= 20 THEN 50
                        ELSE 10 END AS tier_pct
            FROM documents
        )
        SELECT doc_id, source, CAST(n_tokens AS INTEGER) AS n_tokens,
               CAST(tier_pct AS INTEGER) AS tier_pct
        FROM d
        WHERE ((doc_id % 2147483647) * 2654435761) % 100 < tier_pct
    """,
    "corpus_mixture_plan": f"""
        WITH inv AS (
            SELECT source, count(*) AS n_docs,
                   CAST(sum(len({_TOKENS})) AS BIGINT) AS total_tokens
            FROM documents GROUP BY source
        ),
        wt AS (
            SELECT *, CASE source
                        {' '.join(f"WHEN '{s}' THEN {w}" for s, w in sorted(MIXTURE_WEIGHTS.items()))}
                        ELSE 0 END AS weight
            FROM inv
        )
        SELECT source, n_docs, total_tokens, CAST(weight AS INTEGER) AS weight,
               {MIXTURE_TOKEN_BUDGET} * weight / {float(sum(MIXTURE_WEIGHTS.values()))} AS target_tokens,
               least(1.0, ({MIXTURE_TOKEN_BUDGET} * weight / {float(sum(MIXTURE_WEIGHTS.values()))}) / total_tokens) AS sample_rate
        FROM wt
    """,
    "chunks_packed": f"""
        WITH toks AS (SELECT doc_id, source, {_TOKENS} AS w FROM documents),
        chunks AS (
            SELECT doc_id, source, w,
                   unnest(range(0, CAST(ceil(greatest(len(w), 1)
                                             / {CHUNK_STRIDE}.0) AS BIGINT)))
                       AS chunk_idx
            FROM toks
        ),
        c AS (
            SELECT doc_id, source, chunk_idx,
                   least(len(w) - chunk_idx * {CHUNK_STRIDE}, {CHUNK_TOKENS})
                       AS n_chunk_tokens
            FROM chunks
            WHERE chunk_idx * {CHUNK_STRIDE} < len(w)
              AND (chunk_idx = 0
                   OR (chunk_idx - 1) * {CHUNK_STRIDE} + {CHUNK_TOKENS} < len(w))
        ),
        win AS (
            SELECT source, doc_id, n_chunk_tokens,
                   SUM(n_chunk_tokens) OVER (
                       PARTITION BY source ORDER BY doc_id, chunk_idx
                       ROWS UNBOUNDED PRECEDING) - n_chunk_tokens AS cum_before
            FROM c
        )
        SELECT source, CAST(floor(cum_before / 128) AS INTEGER) AS pack_id,
               count(*) AS n_chunks,
               CAST(sum(n_chunk_tokens) AS BIGINT) AS pack_tokens,
               min(doc_id) AS first_doc_id
        FROM win GROUP BY 1, 2
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
    "corpus_vocabulary_topk": f"""
        WITH tok AS (
            SELECT unnest({_TOKENS}) AS token FROM documents
        )
        SELECT token, count(*) AS cnt
        FROM tok WHERE token <> ''
        GROUP BY token
        ORDER BY cnt DESC, token ASC
        LIMIT 50
    """,
    "text_repetition_scores": f"""
        WITH tok AS (
            SELECT doc_id, unnest({_TOKENS}) AS token FROM documents
        ),
        tf AS (
            SELECT doc_id, token, count(*) AS tf
            FROM tok WHERE token <> ''
            GROUP BY doc_id, token
        )
        SELECT doc_id,
               CAST(sum(tf) AS BIGINT) AS n_tokens,
               max(tf) AS top_tf,
               count(*) AS n_types,
               CAST(max(tf) AS DOUBLE) / CAST(sum(tf) AS BIGINT)
                   AS top_token_share,
               CAST(count(*) AS DOUBLE) / CAST(sum(tf) AS BIGINT)
                   AS type_token_ratio
        FROM tf GROUP BY doc_id
    """,
    "corpus_token_df": f"""
        WITH tok AS (
            SELECT DISTINCT doc_id, unnest({_TOKENS}) AS token FROM documents
        ),
        dfreq AS (
            SELECT token, count(*) AS df
            FROM tok WHERE token <> ''
            GROUP BY token
        )
        SELECT token, df,
               (SELECT count(*) FROM documents) AS n_docs,
               CAST((SELECT count(*) FROM documents) AS DOUBLE) / df AS idf_ratio
        FROM dfreq
    """,
    "text_tfidf_top_terms": f"""
        WITH tok AS (
            SELECT doc_id, unnest({_TOKENS}) AS token FROM documents
        ),
        clean AS (SELECT * FROM tok WHERE token <> ''),
        tf AS (
            SELECT doc_id, token, count(*) AS tf FROM clean GROUP BY doc_id, token
        ),
        dfreq AS (
            SELECT token, count(*) AS df
            FROM (SELECT DISTINCT doc_id, token FROM clean) GROUP BY token
        ),
        scored AS (
            SELECT tf.doc_id, tf.token, tf.tf,
                   CAST(tf.tf * (SELECT count(*) FROM documents) AS DOUBLE)
                       / CAST(dfreq.df AS DOUBLE) AS tfidf
            FROM tf JOIN dfreq USING (token)
        ),
        ranked AS (
            SELECT doc_id, token, tf, tfidf,
                   CAST(row_number() OVER (PARTITION BY doc_id
                                           ORDER BY tfidf DESC, token ASC)
                        AS INTEGER) AS rank
            FROM scored
        )
        SELECT * FROM ranked WHERE rank <= 3
    """,
    "corpus_boilerplate_ngrams": f"""
        WITH toks AS (SELECT doc_id, {_TOKENS} AS w FROM documents),
        sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(w[i : i + {BOILERPLATE_N - 1}], ' ') AS shingle
            FROM (SELECT doc_id, w,
                         unnest(range(1, len(w) - {BOILERPLATE_N} + 2)) AS i
                  FROM toks)
        )
        SELECT shingle, count(*) AS n_docs
        FROM sh GROUP BY shingle
        HAVING count(*) >= {BOILERPLATE_MIN_DOCS}
    """,
    "text_boilerplate_fraction": f"""
        WITH toks AS (SELECT doc_id, {_TOKENS} AS w FROM documents),
        sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(w[i : i + {BOILERPLATE_N - 1}], ' ') AS shingle
            FROM (SELECT doc_id, w,
                         unnest(range(1, len(w) - {BOILERPLATE_N} + 2)) AS i
                  FROM toks)
        ),
        common AS (
            SELECT shingle FROM sh GROUP BY shingle
            HAVING count(*) >= {BOILERPLATE_MIN_DOCS}
        ),
        per_doc AS (
            SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id
        ),
        per_doc_common AS (
            SELECT doc_id, count(*) AS n_boilerplate
            FROM sh WHERE shingle IN (SELECT shingle FROM common)
            GROUP BY doc_id
        )
        SELECT p.doc_id, p.n_shingles,
               COALESCE(c.n_boilerplate, 0) AS n_boilerplate,
               CAST(COALESCE(c.n_boilerplate, 0) AS DOUBLE) / p.n_shingles
                   AS boilerplate_frac
        FROM per_doc p LEFT JOIN per_doc_common c ON p.doc_id = c.doc_id
    """,
    # Per-rule verdicts: integer folds over the token list, DOUBLE
    # divisions of exact integers (same IEEE op both engines), rule
    # thresholds interpolated from the module constants so editing them
    # cannot desynchronize the oracle.
    "docs_gopher_quality": f"""
        WITH d AS (
            SELECT doc_id, {_TOKENS} AS w FROM documents
        ), m AS (
            SELECT doc_id,
                   len(w) AS n_tokens,
                   list_sum(list_transform(w, x -> length(x)))::DOUBLE
                       / len(w) AS mean_word_len,
                   list_max(list_transform(list_distinct(w),
                       u -> len(list_filter(w, x -> x = u))))::DOUBLE
                       / len(w) AS top_token_share,
                   len(list_filter(w, x -> x IN ({_STOP_LIST}))) AS n_stop
            FROM d
        ), r AS (
            SELECT doc_id,
                   CAST(n_tokens AS INTEGER) AS n_tokens,
                   mean_word_len,
                   top_token_share,
                   CAST(n_stop AS INTEGER) AS n_stop,
                   n_tokens BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
                       AS pass_word_count,
                   mean_word_len BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}
                       AND {GOPHER_MAX_MEAN_WORD_LEN} AS pass_word_len,
                   top_token_share <= {GOPHER_MAX_TOP_TOKEN_SHARE}
                       AS pass_repetition,
                   n_stop >= {GOPHER_MIN_STOPWORDS} AS pass_stopwords
            FROM m
        )
        SELECT *,
               (pass_word_count AND pass_word_len AND pass_repetition
                AND pass_stopwords) AS keep,
               CASE WHEN NOT pass_word_count THEN 'word_count'
                    WHEN NOT pass_word_len THEN 'word_len'
                    WHEN NOT pass_repetition THEN 'repetition'
                    WHEN NOT pass_stopwords THEN 'stopwords' END AS drop_reason
        FROM r
    """,
    # Distinct-text stands in for the Spark side's distinct-sha2 (equal
    # by construction absent collisions); every rate is an int/int
    # double division, the median a discrete selection — the whole
    # card hash-certifies.
    "corpus_dataset_card": f"""
        WITH base AS (
            SELECT source, lang, text,
                   len({_TOKENS}) AS n_tokens,
                   length(text) AS n_chars,
                   CASE WHEN length(text) > 0 THEN
                       (len(list_filter({_TOKENS}, w -> w IN ({_STOP_LIST})))::DOUBLE
                            / len({_TOKENS}))
                       - (len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE
                            / length(text)) END AS quality_score,
                   len({_TOKENS}) BETWEEN {GOPHER_MIN_WORDS}
                       AND {GOPHER_MAX_WORDS} AS pass_wc
            FROM documents
        ),
        per_source AS (
            SELECT source,
                   count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   count(DISTINCT lang) AS n_langs,
                   1 - count(DISTINCT text)::DOUBLE / count(*)
                       AS exact_dup_rate,
                   sum(CASE WHEN pass_wc THEN 1 ELSE 0 END)::DOUBLE
                       / count(*) AS word_count_pass_rate,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY quality_score)
                       AS median_quality
            FROM base GROUP BY source
        ),
        tl AS (
            SELECT source, lang AS top_lang
            FROM (SELECT source, lang,
                         ROW_NUMBER() OVER (PARTITION BY source
                             ORDER BY count(*) DESC, lang ASC) AS rk
                  FROM base GROUP BY source, lang)
            WHERE rk = 1
        )
        SELECT p.*, t.top_lang FROM per_source p JOIN tl t USING (source)
    """,
    # Same composite score as text_quality (identical IEEE divisions),
    # same (score, doc_id) tie order for the deterministic ntile; the
    # single-score-source guard mirrors the NULL-not-constant choice.
    "docs_quality_calibrated": f"""
        WITH d AS (
            SELECT doc_id, source,
                   CASE WHEN length(text) > 0 THEN
                       (len(list_filter({_TOKENS}, w -> w IN ({_STOP_LIST})))::DOUBLE
                            / len({_TOKENS}))
                       - (len(regexp_extract_all(text, '[.,!?;:]'))::DOUBLE
                            / length(text)) END AS quality_score
            FROM documents
        )
        SELECT doc_id, source, quality_score,
               CAST(NTILE(10) OVER (PARTITION BY source
                    ORDER BY quality_score NULLS FIRST, doc_id) AS INTEGER)
                   AS decile,
               CASE WHEN max(quality_score) OVER s != min(quality_score) OVER s
                    THEN (quality_score - min(quality_score) OVER s)
                         / (max(quality_score) OVER s
                            - min(quality_score) OVER s)
               END AS minmax_norm
        FROM d
        WINDOW s AS (PARTITION BY source)
    """,
    # Same multiplicative-hash order as the Spark side (hash_bucket's
    # documented SQL mirror), same (hash, doc_id) tie-break.
    "docs_stratified_sample": f"""
        WITH r AS (
            SELECT doc_id, source, lang,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY ((doc_id % 2147483647) * 2654435761)
                                    % {STRATIFIED_HASH_MOD},
                                doc_id
                   ) AS INTEGER) AS strat_rank
            FROM documents
        )
        SELECT doc_id, source, lang, strat_rank
        FROM r WHERE strat_rank <= {STRATIFIED_PER_STRATUM}
    """,
    # Same snapshot views and bin arithmetic as the Spark side; squaring
    # by multiplication keeps the statistic rational and hash-exact.
    "corpus_drift_report": f"""
        WITH old AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 7 != 3
        ), new AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 11 != 5
        ),
        ho AS (
            SELECT CAST(floor(len({_TOKENS})::DOUBLE / {DRIFT_BIN_WIDTH})
                       AS BIGINT) AS bin,
                   count(*) AS n_old
            FROM old GROUP BY 1
        ),
        hn AS (
            SELECT CAST(floor(len({_TOKENS})::DOUBLE / {DRIFT_BIN_WIDTH})
                       AS BIGINT) AS bin,
                   count(*) AS n_new
            FROM new GROUP BY 1
        ),
        j AS (
            SELECT coalesce(ho.bin, hn.bin) AS bin,
                   coalesce(n_old, 0) AS n_old,
                   coalesce(n_new, 0) AS n_new
            FROM ho FULL OUTER JOIN hn ON ho.bin = hn.bin
        ),
        t AS (SELECT sum(n_old) AS t_old, sum(n_new) AS t_new FROM j)
        SELECT bin, n_old, n_new,
               n_old::DOUBLE / t_old AS p_old,
               n_new::DOUBLE / t_new AS p_new,
               CASE WHEN n_old > 0 THEN
                   (n_new::DOUBLE / t_new - n_old::DOUBLE / t_old)
                   * (n_new::DOUBLE / t_new - n_old::DOUBLE / t_old)
                   / (n_old::DOUBLE / t_old) END AS chi2_term
        FROM j CROSS JOIN t
    """,
    "corpus_snapshot_diff": """
        WITH old AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 7 != 3
        ), new AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 11 != 5
        )
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.text IS NULL THEN 'added'
                    WHEN n.text IS NULL THEN 'removed'
                    WHEN o.text != n.text THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    """,
    # Single-window form of the same all-integer prefix sum the Spark
    # side computes in two bucketed stages (hash_bucket's documented
    # SQL mirror as the priority order).
    "docs_token_budget_cap": f"""
        SELECT doc_id, source, n_tokens, cum_tokens,
               cum_tokens <= {TOKEN_BUDGET_PER_SOURCE} AS kept
        FROM (
            SELECT doc_id, source, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       PARTITION BY source
                       ORDER BY ((doc_id % 2147483647) * 2654435761)
                                % {BUDGET_HASH_MOD}, doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM (SELECT doc_id, source,
                         CAST(len({_TOKENS}) AS BIGINT) AS n_tokens
                  FROM documents)
        )
    """,
    # Same sqrt temperature (IEEE-exact), same source-ordered fold for
    # the normalizer (list_sum over list(... ORDER BY source) ≡ Spark's
    # aggregate over the sorted struct list), same floor targets and
    # hash-priority ranks.
    "docs_mixture_temperature": f"""
        WITH inv AS (
            SELECT source, count(*) AS n_docs FROM documents GROUP BY source
        ),
        norm AS (
            SELECT list_sum(list(sqrt(n_docs::DOUBLE) ORDER BY source))
                       AS w_total,
                   (SELECT count(*) // {TEMP_SAMPLE_HALF_DIVISOR}
                    FROM documents) AS sample_n
            FROM inv
        ),
        targets AS (
            SELECT i.source,
                   CAST(floor(n.sample_n
                              * (sqrt(i.n_docs::DOUBLE) / n.w_total))
                        AS BIGINT) AS target_n
            FROM inv i CROSS JOIN norm n
        ),
        ranked AS (
            SELECT doc_id, source,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY ((doc_id % 2147483647) * 2654435761)
                                % {BUDGET_HASH_MOD}, doc_id) AS BIGINT)
                       AS rank
            FROM documents
        )
        SELECT r.doc_id, r.source, r.rank, t.target_n
        FROM ranked r JOIN targets t USING (source)
        WHERE r.rank <= t.target_n
    """,
    # Same occurrence-weighted mean document frequency (BIGINT sum, one
    # double division), same percentile_disc quartile thresholds
    # (selections — no interpolation), same CASE staging.
    "docs_curriculum_stages": f"""
        WITH occf AS (
            SELECT doc_id, t.token
            FROM (SELECT doc_id, unnest({_TOKENS}) AS token
                  FROM documents) t
            WHERE t.token != ''
        ),
        dfq AS (
            SELECT token, count(DISTINCT doc_id) AS df
            FROM occf GROUP BY token
        ),
        per_doc AS (
            SELECT o.doc_id, count(*) AS n_tokens,
                   CAST(sum(d.df) AS DOUBLE) / count(*) AS mean_df
            FROM occf o JOIN dfq d USING (token) GROUP BY o.doc_id
        ),
        qs AS (
            SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY mean_df)
                       AS q25,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY mean_df)
                       AS q50,
                   percentile_disc(0.75) WITHIN GROUP (ORDER BY mean_df)
                       AS q75
            FROM per_doc
        )
        SELECT doc.doc_id,
               COALESCE(p.n_tokens, 0) AS n_tokens,
               COALESCE(p.mean_df, 0.0) AS mean_df,
               CAST(CASE WHEN COALESCE(p.mean_df, 0.0) >= q.q75 THEN 1
                         WHEN COALESCE(p.mean_df, 0.0) >= q.q50 THEN 2
                         WHEN COALESCE(p.mean_df, 0.0) >= q.q25 THEN 3
                         ELSE 4 END AS INTEGER) AS stage
        FROM documents doc
        LEFT JOIN per_doc p USING (doc_id)
        CROSS JOIN qs q
    """,
    # Single-window form of the same quality-ordered prefix sum the
    # Spark side computes in fixed score-range buckets; the score is
    # two correctly-rounded double divisions of integer operands, ties
    # broken by the documented hash mirror then doc_id.
    "docs_quality_budget_fill": f"""
        WITH scored AS (
            SELECT doc_id,
                   CAST(len({_TOKENS}) AS BIGINT) AS n_tokens,
                   CASE WHEN length(text) > 0 AND len({_TOKENS}) > 0
                        THEN (len(list_filter({_TOKENS},
                                  w -> w IN ({_STOP_LIST})))::DOUBLE
                              / len({_TOKENS}))
                             - (len(regexp_extract_all(text,
                                    '[.,!?;:]'))::DOUBLE / length(text))
                   END AS quality_score,
                   ((doc_id % 2147483647) * 2654435761)
                       % {BUDGET_HASH_MOD} AS pri
            FROM documents
        )
        SELECT doc_id, n_tokens, quality_score, cum_tokens,
               cum_tokens <= {QUALITY_FILL_BUDGET} AS kept
        FROM (
            SELECT doc_id, n_tokens, quality_score,
                   CAST(SUM(n_tokens) OVER (
                       ORDER BY quality_score DESC NULLS LAST, pri, doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM scored
        )
    """,
    # Single-window form of the same GLOBAL all-integer prefix sum the
    # Spark side computes in two bucketed stages; shard_id via integer
    # division (// ≡ Spark's `div`), checksum via order-independent
    # bit_xor — both engines, both exact.
    "corpus_shard_manifest": f"""
        WITH assigned AS (
            SELECT doc_id, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       ORDER BY pri, doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
            FROM (SELECT doc_id,
                         CAST(len({_TOKENS}) AS BIGINT) AS n_tokens,
                         ((doc_id % 2147483647) * 2654435761)
                             % {BUDGET_HASH_MOD} AS pri
                  FROM documents)
        )
        SELECT CAST((cum_tokens - n_tokens) // {SHARD_TOKEN_TARGET}
                   AS BIGINT) AS shard_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS shard_token_mass,
               CAST(MIN(cum_tokens - n_tokens) AS BIGINT) AS first_offset,
               CAST(MAX(cum_tokens) AS BIGINT) AS last_offset,
               CAST(bit_xor(CAST(doc_id AS BIGINT)) AS BIGINT) AS id_xor
        FROM assigned
        GROUP BY 1
    """,
    # Same distinct 3-gram rows, same min-doc_id first-occurrence
    # table, same count/count per doc; novelty_frac is one double
    # division of exact BIGINTs.
    "docs_ngram_novelty": f"""
        WITH sh AS (
            SELECT doc_id,
                   unnest(list_distinct([array_to_string(w[i:i+2], ' ')
                                         for i in range(1, len(w) - 1)]))
                       AS shingle
            FROM (SELECT doc_id, {_TOKENS} AS w FROM documents)
            WHERE len(w) >= 3
        ),
        first AS (
            SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle
        )
        SELECT s.doc_id,
               CAST(count(*) AS BIGINT) AS n_shingles,
               CAST(sum(CASE WHEN f.first_doc = s.doc_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
               CAST(sum(CASE WHEN f.first_doc = s.doc_id
                             THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
                   AS novelty_frac
        FROM sh s JOIN first f USING (shingle)
        GROUP BY s.doc_id
    """,
    # Same distinct (source, token) relation, same token-keyed pair
    # counting, same grid of source pairs with zero-overlap rows
    # preserved; both ratios are single double divisions.
    "source_vocab_overlap": f"""
        WITH st AS (
            SELECT DISTINCT source, t.token
            FROM (SELECT source, unnest({_TOKENS}) AS token
                  FROM documents) t
            WHERE t.token != ''
        ),
        sizes AS (
            SELECT source, count(*) AS n_vocab FROM st GROUP BY source
        ),
        inter AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   count(*) AS n_inter
            FROM st a JOIN st b
              ON a.token = b.token AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT g.source_a, g.source_b,
               CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
               CAST(g.n_a AS BIGINT) AS n_a,
               CAST(g.n_b AS BIGINT) AS n_b,
               CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                   / (g.n_a + g.n_b - COALESCE(i.n_inter, 0)) AS jaccard,
               CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                   / least(g.n_a, g.n_b) AS containment_min
        FROM (
            SELECT sa.source AS source_a, sb.source AS source_b,
                   sa.n_vocab AS n_a, sb.n_vocab AS n_b
            FROM sizes sa JOIN sizes sb ON sa.source < sb.source
        ) g
        LEFT JOIN inter i USING (source_a, source_b)
    """,
    # Winnowing mirror: the same char-fold gram hashes (list_reduce ≡
    # the Spark fold — acc starts at the first term either way), the
    # same w-gram window minima, the same RIGHTMOST-on-ties selection
    # (list position of the last index attaining the window min), and
    # the same distinct-(doc, pos) dedup of selections.
    "docs_winnowing_fingerprints": f"""
        WITH {_WINNOW_SEL_SQL}
        SELECT doc_id, fp_pos, fp FROM winnow_sel
    """,
    # Same rare-fingerprint gate (df cap) and pair counting over the
    # shared winnowing selection mirror.
    "docs_winnowing_overlap": f"""
        WITH {_WINNOW_PAIR_CTES}
        SELECT doc_a, doc_b, n_shared FROM wpairs
    """,
    # Clusters: the same recursive transitive closure + min-reachable-id
    # labeling as dedup_near_dup_clusters, over the winnowing overlap
    # pairs instead of the MinHash pairs.
    "docs_winnowing_clusters": f"""
        WITH RECURSIVE {_WINNOW_PAIR_CTES},
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM wpairs
            UNION SELECT doc_b, doc_a FROM wpairs
        ),
        reach(src, dst) AS (
            SELECT src, src FROM edges
            UNION SELECT src, dst FROM edges
            UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT src AS doc_id, min(dst) AS cluster_rep
        FROM reach GROUP BY src
    """,
    # Cross-corpus: same selection mirror, split AFTER selection (a
    # doc's fingerprints do not depend on which side it lands on), df
    # cap judged over the CORPUS side only — exactly the Spark
    # operator's contract.
    "docs_winnowing_cross_corpus": f"""
        WITH {_WINNOW_SEL_SQL},
        nf AS (
            SELECT DISTINCT doc_id AS new_id, fp FROM winnow_sel
            WHERE doc_id % 10 = 0
        ),
        cf AS (
            SELECT DISTINCT doc_id AS corpus_id, fp FROM winnow_sel
            WHERE doc_id % 10 <> 0
        ),
        rare AS (
            SELECT fp FROM cf GROUP BY fp
            HAVING count(*) <= {WINNOW_MAX_FP_DF}
        )
        SELECT n.new_id, c.corpus_id, CAST(count(*) AS BIGINT) AS n_shared
        FROM nf n
        JOIN (SELECT cf.corpus_id, cf.fp FROM cf JOIN rare USING (fp)) c
          ON n.fp = c.fp
        GROUP BY 1, 2
        HAVING count(*) >= {WINNOW_MIN_SHARED}
    """,
    # Same explicit ceil(q·n) integer positions, same row_number
    # selection — no percentile function anywhere (COVERAGE.md round-7
    # portability rule).
    "docs_length_quantiles_exact": f"""
        WITH d AS (
            SELECT source, CAST(len({_TOKENS}) AS BIGINT) AS n_tokens
            FROM documents
        ),
        ranked AS (
            SELECT source, n_tokens,
                   ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY n_tokens) AS rn,
                   COUNT(*) OVER (PARTITION BY source) AS n
            FROM d
        )
        SELECT source,
               CAST(max(n) AS BIGINT) AS n_docs,
               CAST(max(CASE WHEN rn = (n + 3) // 4
                             THEN n_tokens END) AS BIGINT) AS p25_tokens,
               CAST(max(CASE WHEN rn = (n + 1) // 2
                             THEN n_tokens END) AS BIGINT) AS p50_tokens,
               CAST(max(CASE WHEN rn = (3 * n + 3) // 4
                             THEN n_tokens END) AS BIGINT) AS p75_tokens,
               CAST(max(CASE WHEN rn = (19 * n + 19) // 20
                             THEN n_tokens END) AS BIGINT) AS p95_tokens
        FROM ranked
        GROUP BY source
    """,
}

# Round-9 promotions (queued + type-audited in round 8, registered when
# the round-9 window's free slots opened).
ORACLE.update({
    "docs_decontamination_stats": f"""
        WITH sh AS (
            SELECT doc_id, unnest([array_to_string(w[i:i+2], ' ')
                                   for i in range(1, len(w) - 1)]) AS shingle
            FROM (SELECT doc_id, {_TOKENS} AS w FROM documents)
            WHERE len(w) >= 3
        ),
        bench AS (
            SELECT DISTINCT shingle FROM sh
            WHERE doc_id IN (SELECT doc_id FROM documents
                             WHERE source = '{BENCH_SOURCE}')
        ),
        rates AS (
            SELECT t.doc_id,
                   CAST(sum(CASE WHEN b.shingle IS NOT NULL
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                       / count(*) AS rate
            FROM sh t LEFT JOIN bench b ON t.shingle = b.shingle
            WHERE t.doc_id NOT IN (SELECT doc_id FROM documents
                                   WHERE source = '{BENCH_SOURCE}')
            GROUP BY t.doc_id
        ),
        scored AS (
            SELECT d.source,
                   COALESCE(r.rate, 0.0) AS rate,
                   CAST(len({_TOKENS}) AS BIGINT) AS n_tokens
            FROM documents d LEFT JOIN rates r USING (doc_id)
            WHERE d.source != '{BENCH_SOURCE}'
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN rate >= {CONTAM_MAX_RATE}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
               CAST(sum(CASE WHEN rate < {CONTAM_MAX_RATE}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN rate >= {CONTAM_MAX_RATE}
                             THEN n_tokens ELSE 0 END) AS BIGINT)
                   AS flagged_tokens,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST(sum(CASE WHEN rate >= {CONTAM_MAX_RATE}
                             THEN n_tokens ELSE 0 END) AS DOUBLE)
                   / sum(n_tokens) AS flagged_token_share
        FROM scored
        GROUP BY source
    """,
    "corpus_shards_incremental": f"""
        WITH base AS (
            SELECT CAST(COALESCE(SUM(len({_TOKENS})), 0) AS BIGINT)
                       AS base_tokens
            FROM documents WHERE doc_id % 10 != 0
        ),
        assigned AS (
            SELECT doc_id, source, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       ORDER BY pri, doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS d_cum
            FROM (SELECT doc_id, source,
                         CAST(len({_TOKENS}) AS BIGINT) AS n_tokens,
                         ((doc_id % 2147483647) * 2654435761)
                             % {BUDGET_HASH_MOD} AS pri
                  FROM documents WHERE doc_id % 10 = 0)
        )
        SELECT a.doc_id, a.source, a.n_tokens,
               CAST(a.d_cum + b.base_tokens AS BIGINT) AS cum_tokens,
               CAST((a.d_cum + b.base_tokens - a.n_tokens)
                        // {SHARD_TOKEN_TARGET} AS BIGINT) AS shard_id
        FROM assigned a, base b
    """,
})

# Round-9 additions (type-audited before landing, per the round-7 rule).
ORACLE.update({
    "source_winnow_overlap_matrix": f"""
        WITH {_WINNOW_SEL_SQL},
        fps AS (SELECT DISTINCT doc_id, fp FROM winnow_sel),
        rare AS (
            SELECT fp FROM fps GROUP BY fp
            HAVING count(*) <= {WINNOW_MAX_FP_DF}
        ),
        sfp AS (
            SELECT DISTINCT d.source, f.fp
            FROM fps f JOIN rare USING (fp)
            JOIN documents d USING (doc_id)
        ),
        sizes AS (
            SELECT source, CAST(count(*) AS BIGINT) AS fps
            FROM sfp GROUP BY source
        ),
        ovl AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(count(*) AS BIGINT) AS shared_fps
            FROM sfp a JOIN sfp b ON a.fp = b.fp AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT ga.source AS source_a, gb.source AS source_b,
               ga.fps AS fps_a, gb.fps AS fps_b,
               CAST(COALESCE(o.shared_fps, 0) AS BIGINT) AS shared_fps,
               CAST(COALESCE(o.shared_fps, 0) AS DOUBLE)
                   / (ga.fps + gb.fps - COALESCE(o.shared_fps, 0))
                   AS fp_jaccard
        FROM sizes ga JOIN sizes gb ON ga.source < gb.source
        LEFT JOIN ovl o
          ON o.source_a = ga.source AND o.source_b = gb.source
    """,
    "source_token_fertility": f"""
        WITH t AS (
            SELECT source, unnest(w) AS token
            FROM (SELECT source, {_TOKENS} AS w FROM documents)
        ),
        tn AS (SELECT source, token FROM t WHERE token != ''),
        vocab AS (
            SELECT token FROM tn GROUP BY token
            ORDER BY count(*) DESC, token LIMIT {FERTILITY_VOCAB_SIZE}
        ),
        oov AS (
            SELECT tn.source,
                   CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_oov_words
            FROM tn LEFT JOIN vocab v ON tn.token = v.token
            GROUP BY tn.source
        ),
        base AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len({_TOKENS})) AS BIGINT) AS n_words,
                   CAST(sum(len(regexp_extract_all(
                        text, '{T.BPE_TOKEN_PATTERN}'))) AS BIGINT)
                       AS n_subword_tokens
            FROM documents GROUP BY source
        )
        SELECT b.source, b.n_docs, b.n_words, b.n_subword_tokens,
               CAST(COALESCE(o.n_oov_words, 0) AS BIGINT) AS n_oov_words,
               CASE WHEN b.n_words > 0
                    THEN CAST(b.n_subword_tokens AS DOUBLE) / b.n_words
                    ELSE 0.0 END AS fertility,
               CASE WHEN b.n_words > 0
                    THEN CAST(COALESCE(o.n_oov_words, 0) AS DOUBLE)
                             / b.n_words
                    ELSE 0.0 END AS oov_rate
        FROM base b LEFT JOIN oov o USING (source)
    """,
})

# Round 11: ORACLE_R11 promoted on schedule, and the weighted top-k
# sample pulled forward from the R12 queue into the window's second
# free slot (zero-shuffle TakeOrderedAndProject — VERDICT r10 item #2).
ORACLE.update(ORACLE_R11)
ORACLE.update(ORACLE_R12)
QUERIES.update({
    "corpus_vocab_coverage": _q(vocab_coverage_curve),
    "docs_weighted_sample": _q(weighted_sample),
})

# Round-13 promotion queue. Same bigram construction as the certified
# text_top_bigrams mirror (inclusive w[i:i+1] slices over the token
# array), per-source; Simpson numerator and total are exact bigints,
# each ratio ONE IEEE division of exact integers (bigint*bigint
# product stays bigint on both engines at rehearsal scale).
ORACLE_R13 = {
    "corpus_bigram_simpson": f"""
        WITH bg AS (
            SELECT source,
                   unnest([array_to_string(w[i:i+1], ' ')
                           for i in range(1, len(w))]) AS bigram
            FROM (SELECT source, {_TOKENS} AS w FROM documents)
            WHERE len(w) >= 2
        ),
        c AS (
            SELECT source, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2
        )
        SELECT source,
               CAST(SUM(cnt) AS BIGINT) AS total_bigrams,
               CAST(COUNT(*) AS BIGINT) AS distinct_bigrams,
               CAST(SUM(cnt * cnt) AS BIGINT) AS simpson_num,
               CAST(MAX(cnt) AS BIGINT) AS top1_cnt,
               CAST(SUM(cnt * cnt) AS DOUBLE)
                   / CAST(CAST(SUM(cnt) AS BIGINT)
                          * CAST(SUM(cnt) AS BIGINT) AS DOUBLE) AS simpson,
               CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS BIGINT)
                   AS top1_share
        FROM c GROUP BY source
    """,
}

# Round 13: promoted on schedule (library + fixture tests + audited
# oracle held through rounds 12; the window slot is this round's
# registry edit, per the COVERAGE.md deferral arithmetic).
ORACLE.update(ORACLE_R13)
QUERIES.update({
    "corpus_bigram_simpson": _q(bigram_simpson),
})


def shingle_df_spectrum(
    documents: DataFrame, n: int = NOVELTY_SHINGLE_N
) -> DataFrame:
    """Shingle document-frequency spectrum: for each df value (how
    many documents contain a given word n-gram), how many distinct
    shingles have exactly that df, and what share of the shingle
    vocabulary they are. The corpus-level boilerplate diagnostic the
    span-scrub and novelty ops both presuppose: a healthy corpus has
    a long df=1 tail and a thin high-df head; a template-heavy crawl
    shows mass piling up at high df — and the spectrum is how you
    pick the df threshold above which spans count as boilerplate
    (C4-style repeated-line removal, generalized to n-grams), instead
    of guessing it.

    Scale shape: per-doc distinct shingles (`shingle_rows` + local
    dropDuplicates — corpus-token-linear, same class as
    corpus_token_df), one map-side-combined count per shingle, then a
    second count over the df column whose output is |distinct df
    values| rows (dozens) — the window computing `share` runs over
    that tiny relation only. share is one exact BIGINT/BIGINT IEEE
    division.

    Queued for round 15 (`corpus_shingle_df_spectrum`, ORACLE_R15)."""
    from pyspark.sql import Window

    from ..functions.text import shingle_rows

    sh = shingle_rows(documents, "doc_id", "text", n, distinct=True)
    dfs = sh.groupBy("shingle").agg(F.count(F.lit(1)).cast("long").alias("df"))
    spec = dfs.groupBy("df").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles")
    )
    return spec.select(
        "df",
        "n_shingles",
        (
            F.col("n_shingles").cast("double")
            / F.sum("n_shingles").over(Window.partitionBy())
        ).alias("share"),
    )


# Round-15 promotion queue. The mirror reuses the novelty oracle's
# inclusive-slice shingle construction (list_distinct per doc = the
# Spark side's per-doc dropDuplicates); df and n_shingles are exact
# bigints, share one IEEE division of exact integers.
ORACLE_R15 = {
    "corpus_shingle_df_spectrum": f"""
        WITH sh AS (
            SELECT doc_id,
                   unnest(list_distinct([array_to_string(w[i:i+2], ' ')
                                         for i in range(1, len(w) - 1)]))
                       AS shingle
            FROM (SELECT doc_id, {_TOKENS} AS w FROM documents)
            WHERE len(w) >= 3
        ),
        dfs AS (
            SELECT shingle, count(*) AS df FROM sh GROUP BY shingle
        ),
        spec AS (
            SELECT df, count(*) AS n_shingles FROM dfs GROUP BY df
        )
        SELECT CAST(df AS BIGINT) AS df,
               CAST(n_shingles AS BIGINT) AS n_shingles,
               CAST(n_shingles AS DOUBLE) / CAST(SUM(n_shingles) OVER ()
                                                 AS DOUBLE) AS share
        FROM spec
    """,
}

# Round 14: promoted ONE ROUND EARLY (VERDICT r13 #3 — drain the
# queue): library + audited oracle held since round 13, rehearsed at
# sf0.01 in rounds 13 and 14; takes its window slot this round.
ORACLE.update(ORACLE_R15)
QUERIES.update({
    "corpus_shingle_df_spectrum": _q(shingle_df_spectrum),
})


BIGRAM_LIFT_TOP_K = 5
BIGRAM_LIFT_MIN_COUNT = 2


def bigram_lift_topk(
    documents: DataFrame,
    k: int = BIGRAM_LIFT_TOP_K,
    min_count: int = BIGRAM_LIFT_MIN_COUNT,
) -> DataFrame:
    """Per-source top-k collocations by LIFT — the bigrams that appear
    far more often than their unigram frequencies predict:
    lift(a b) = P(ab) / (P(a)·P(b)) = c_ab·N_uni² / (c_a·c_b·N_bi).
    Raw bigram counts (text_top_bigrams) surface "of the"; lift
    surfaces the bound phrases — template signatures, entity names,
    injected boilerplate — which is what a corpus forensics pass
    actually wants. `min_count` floors the numerator so one-off
    pairings of two rare tokens (lift → N) don't own the board.

    Determinism: all five counts are exact bigints; the lift is ONE
    double expression over their casts with identical operand order in
    the mirror (each *, / exactly rounded → identical doubles), and
    the top-k rank breaks ties (lift, then bigram text) totally.

    Scale shape: bigram and unigram counts are map-side-combined
    scans; the two margin joins are keyed equi-joins on (source,
    token); the rank window sorts each source's QUALIFIED bigram
    relation (post min_count — collocation-grain, vocab-bounded,
    never corpus-sized). Queued for round 16
    (`corpus_bigram_lift_topk`, ORACLE_R16)."""
    from pyspark.sql import Window

    toks = documents.select(
        "source", F.explode(T.tokens("text")).alias("t")
    )
    uni = toks.groupBy("source", "t").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # N_uni = Σ per-token counts — derived from the unigram relation
    # (vocab-grain) instead of re-exploding the corpus a second time
    # (optimization r16, guide §2.3: aggregate before you shuffle; one
    # corpus token pass, not two). Identical bigints by construction.
    n_uni = uni.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_uni")
    )
    from ..functions.text import shingle_rows

    # 2-gram rows per doc keep duplicates (counts, not sets); grams are
    # built per ROW so they never span documents — carrying `source`
    # through the shingle explode (multi-id shingle_rows) replaces the
    # former corpus-sized join-back to documents for the source column
    # (optimization r16, guide §2.4)
    bi = (
        shingle_rows(
            documents.select("doc_id", "source", "text"),
            ("doc_id", "source"), "text", 2,
        )
        .groupBy("source", F.col("shingle").alias("bigram"))
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    )
    n_bi = bi.groupBy("source").agg(
        F.sum("c_ab").cast("long").alias("n_bi")
    )
    parts = bi.select(
        "source",
        "bigram",
        "c_ab",
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("ta"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("tb"),
    )
    joined = (
        parts.filter(F.col("c_ab") >= min_count)
        .join(
            uni.select(
                "source", F.col("t").alias("ta"), F.col("c").alias("c_a")
            ),
            ["source", "ta"],
        )
        .join(
            uni.select(
                "source", F.col("t").alias("tb"), F.col("c").alias("c_b")
            ),
            ["source", "tb"],
        )
        .join(n_uni, "source")
        .join(n_bi, "source")
        .select(
            "source",
            "bigram",
            "c_ab",
            "c_a",
            "c_b",
            (
                F.col("c_ab").cast("double")
                * F.col("n_uni").cast("double")
                * F.col("n_uni").cast("double")
                / (
                    F.col("c_a").cast("double")
                    * F.col("c_b").cast("double")
                    * F.col("n_bi").cast("double")
                )
            ).alias("lift"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("lift").desc(), F.col("bigram")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "source",
            F.col("rank").cast("long").alias("rank"),
            "bigram",
            "c_ab",
            "c_a",
            "c_b",
            "lift",
        )
    )


# Round-16 promotion queue. The mirror repeats the margin counts over
# the same tokenization, the same min-count floor, and the lift as the
# identical double expression (left-to-right products over exact
# bigint casts), with the same (lift DESC, bigram) total ordering.
ORACLE_R16 = {
    "corpus_bigram_lift_topk": f"""
        WITH toks AS (
            SELECT source, unnest(w) AS t
            FROM (SELECT source, {_TOKENS} AS w FROM documents)
        ),
        uni AS (
            SELECT source, t, count(*) AS c_a FROM toks GROUP BY 1, 2
        ),
        n_uni AS (
            SELECT source, count(*) AS n_uni FROM toks GROUP BY 1
        ),
        bi AS (
            SELECT source,
                   unnest([array_to_string(w[i:i+1], ' ')
                           for i in range(1, len(w))]) AS bigram
            FROM (SELECT source, {_TOKENS} AS w FROM documents)
            WHERE len(w) >= 2
        ),
        bic AS (
            SELECT source, bigram, count(*) AS c_ab
            FROM bi GROUP BY 1, 2
        ),
        n_bi AS (
            SELECT source, SUM(c_ab) AS n_bi FROM bic GROUP BY 1
        ),
        lifted AS (
            SELECT b.source, b.bigram, b.c_ab, ua.c_a, ub.c_a AS c_b,
                   CAST(b.c_ab AS DOUBLE)
                       * CAST(nu.n_uni AS DOUBLE)
                       * CAST(nu.n_uni AS DOUBLE)
                       / (CAST(ua.c_a AS DOUBLE)
                          * CAST(ub.c_a AS DOUBLE)
                          * CAST(nb.n_bi AS DOUBLE)) AS lift
            FROM bic b
            JOIN uni ua ON ua.source = b.source
                       AND ua.t = split_part(b.bigram, ' ', 1)
            JOIN uni ub ON ub.source = b.source
                       AND ub.t = split_part(b.bigram, ' ', 2)
            JOIN n_uni nu ON nu.source = b.source
            JOIN n_bi nb ON nb.source = b.source
            WHERE b.c_ab >= {BIGRAM_LIFT_MIN_COUNT}
        )
        SELECT source, CAST(rank AS BIGINT) AS rank, bigram,
               CAST(c_ab AS BIGINT) AS c_ab,
               CAST(c_a AS BIGINT) AS c_a,
               CAST(c_b AS BIGINT) AS c_b,
               lift
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY lift DESC, bigram
                   ) AS rank
            FROM lifted
        )
        WHERE rank <= {BIGRAM_LIFT_TOP_K}
    """,
}

# Round 15: promoted ONE ROUND EARLY with the analytics R16 trio
# (VERDICT r14 #2 — keep draining the queue): library + fixture tests
# + audited oracle held since round 13, parity-rehearsed at sf0.01 in
# rounds 13, 14 and 15. Takes a window slot this round (staleness at
# birth), displacing a tail filler per the re-run greedy audit.
ORACLE.update(ORACLE_R16)
QUERIES.update({
    "corpus_bigram_lift_topk": _q(bigram_lift_topk),
})


HH_CAPACITY = 1000  # heavy-hitter threshold: share > 1/HH_CAPACITY


def token_heavy_hitters(
    documents: DataFrame, capacity: int = HH_CAPACITY
) -> DataFrame:
    """EXACT heavy hitters over the token stream — every token whose
    corpus share exceeds 1/capacity, with its exact count — via the
    classic two-pass Misra-Gries scheme: pass 1 keeps a bounded
    summary of ≤`capacity` counters PER PARTITION (mapInPandas,
    Arrow-batched, decrement-by-rank trims), pass 2 recounts ONLY the
    surviving candidates exactly and applies the integer threshold
    cnt·capacity > n_tokens.

    Why not `vocabulary_topk`'s wordcount? That shuffle carries one
    partial per (partition, distinct token) — at 100 TB the long tail
    of a web-scale vocabulary (billions of shingles/typos) IS the
    shuffle. Here pass 1 emits ≤capacity rows per partition no matter
    the vocabulary, and pass 2's map-side combine only sees candidate
    tokens, so the whole query shuffles O(capacity · partitions) rows.

    Exactness: if a token's true share exceeds 1/capacity then in at
    least one partition its local share exceeds 1/capacity
    (pigeonhole over sum n_p = n), and the Misra-Gries summary of
    that partition retains it — every trim subtracts the rank-chosen
    m from ≥ capacity+1 counters that are all ≥ m, so unit-for-unit
    each decrement destroys ≥ capacity+1 units of mass and a local
    count can be undercounted by at most n_p/(capacity+1) <
    n_p/capacity. The candidate SET varies with partitioning; the
    OUTPUT never does, because the exact recount + threshold filter
    make pass 1 a pure superset generator (false candidates cost one
    broadcast-hash probe each, never a wrong row).

    Queued for round 17 (`corpus_token_heavy_hitters`, ORACLE_R17)."""
    toks = _token_rows(documents).select("token")

    def mg_candidates(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for tok, w in pdf["token"].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(w)
            if len(counters) > capacity:
                vals = sorted(counters.values())
                m = vals[len(vals) - capacity - 1]
                counters = {
                    t: c - m for t, c in counters.items() if c > m
                }
        yield pd.DataFrame(
            {"token": pd.Series(list(counters), dtype="object")}
        )

    cand = toks.mapInPandas(mg_candidates, "token string").distinct()
    counts = (
        toks.join(F.broadcast(cand), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    total = toks.agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
    return (
        # 1-row total normalizer — never a data cartesian
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(capacity) > F.col("n_tokens"))
        .select(
            "token",
            "cnt",
            "n_tokens",
            (
                F.col("cnt").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("share"),
        )
    )


# Round-17 promotion queue. The mirror is the brute-force wordcount
# with the SAME integer threshold — the hash certifies that the
# bounded-summary candidate pass is lossless (the whole claim), the
# same way the prefix-filter dedup oracle certifies ITS filter.
ORACLE_R17 = {
    "corpus_token_heavy_hitters": f"""
        WITH tok AS (
            SELECT unnest({_TOKENS}) AS token FROM documents
        ),
        t AS (SELECT token FROM tok WHERE token <> ''),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tokens FROM t),
        c AS (
            SELECT token, CAST(count(*) AS BIGINT) AS cnt
            FROM t GROUP BY 1
        )
        SELECT c.token, c.cnt, tot.n_tokens,
               CAST(c.cnt AS DOUBLE) / CAST(tot.n_tokens AS DOUBLE)
                   AS share
        FROM c CROSS JOIN tot
        WHERE c.cnt * {HH_CAPACITY} > tot.n_tokens
    """,
}


def lang_kappa(documents: DataFrame) -> DataFrame:
    """Cohen's kappa of the marker-lexicon language-ID against the
    gold `lang` column — the chance-corrected agreement score that
    `lang_confusion` leaves to the reader: raw accuracy flatters any
    classifier on a skewed language mix (predicting the majority
    language scores its prevalence), while κ = (p₀ − pₑ)/(1 − pₑ)
    discounts exactly the agreement two independent raters with these
    marginals would produce by luck. The standard audit number for
    ANY pair of labelers — model vs gold here, but the same operator
    shape scores annotator pairs or weak-supervision rules.

    Exactness: the confusion matrix and both marginals are exact
    bigints off ONE corpus exchange (the matrix is checkpointed and
    reused — languages², not corpus, rows); p₀ is one division; pₑ is
    a SORTED sequential fold over the ≤|languages| per-class products
    (row_share · col_share, each one division — kept in doubles so no
    bigint n² overflow at corpus scale), mirrored with list_reduce;
    κ is NULL when pₑ = 1 (both raters constant — chance explains
    everything, there is nothing to correct).

    Scale shape: one map-side-combined groupBy(lang, pred_lang) over
    the scan (pred_lang is a pure column expression); everything
    after runs on the tiny matrix relation.
    Queued for round 17 (`text_lang_kappa`, ORACLE_R17)."""
    # tokenize ONCE, score five lexicons over the array (optimization
    # r16 — lang_confusion's rule; the separate projection keeps the
    # multi-referenced split() out of each lexicon filter)
    cm = (
        documents.select("lang", T.tokens("text").alias("_ts"))
        .select(
            "lang", T.predict_lang("_ts", pre_split=True).alias("pred_lang")
        )
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    tot = cm.agg(
        F.sum("cnt").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("lang") == F.col("pred_lang"), F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    rowm = cm.groupBy("lang").agg(F.sum("cnt").cast("long").alias("n_row"))
    colm = cm.groupBy("pred_lang").agg(
        F.sum("cnt").cast("long").alias("n_col")
    )
    pk = (
        rowm.join(colm, rowm.lang == colm.pred_lang)
        .crossJoin(F.broadcast(tot))  # 1-row total normalizer
        .select(
            (
                (F.col("n_row").cast("double") / F.col("n_docs").cast("double"))
                * (F.col("n_col").cast("double") / F.col("n_docs").cast("double"))
            ).alias("pkk")
        )
    )
    pe = pk.agg(
        F.coalesce(
            F.aggregate(
                F.array_sort(F.collect_list("pkk")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            F.lit(0.0),
        ).alias("pe")
    )
    po = F.col("n_agree").cast("double") / F.col("n_docs").cast("double")
    # 1-row × 1-row normalizer join
    return tot.crossJoin(F.broadcast(pe)).select(
        "n_docs",
        "n_agree",
        po.alias("po"),
        "pe",
        F.when(
            F.col("pe") < 1.0, (po - F.col("pe")) / (F.lit(1.0) - F.col("pe"))
        ).alias("kappa"),
    )


# Round-17 queue, third textops-adjacent member (kappa). The mirror
# repeats the matrix/marginals in bigints, the per-class products and
# p0 with identical operand order, and the pe fold with list_reduce
# over list_sort (the NDCG rule — list_sum is not a sequential fold).
ORACLE_R17.update({
    "text_lang_kappa": f"""
        WITH pred AS (
            SELECT lang, {_pred_lang_sql()} AS pred_lang FROM documents
        ),
        cm AS (
            SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS cnt
            FROM pred GROUP BY 1, 2
        ),
        tot AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN lang = pred_lang THEN cnt
                                 ELSE 0 END) AS BIGINT) AS n_agree
            FROM cm
        ),
        rowm AS (
            SELECT lang AS k, CAST(SUM(cnt) AS BIGINT) AS n_row
            FROM cm GROUP BY 1
        ),
        colm AS (
            SELECT pred_lang AS k, CAST(SUM(cnt) AS BIGINT) AS n_col
            FROM cm GROUP BY 1
        ),
        pk AS (
            SELECT (CAST(n_row AS DOUBLE) / CAST(t.n_docs AS DOUBLE))
                   * (CAST(n_col AS DOUBLE) / CAST(t.n_docs AS DOUBLE))
                       AS pkk
            FROM rowm r JOIN colm c ON c.k = r.k CROSS JOIN tot t
        ),
        pe AS (
            SELECT COALESCE(
                       list_reduce(
                           list_prepend(CAST(0.0 AS DOUBLE),
                                        list_sort(list(pkk))),
                           (a, b) -> a + b),
                       CAST(0.0 AS DOUBLE)) AS pe
            FROM pk
        )
        SELECT t.n_docs, t.n_agree,
               CAST(t.n_agree AS DOUBLE) / CAST(t.n_docs AS DOUBLE) AS po,
               pe.pe AS pe,
               CASE WHEN pe.pe < 1.0
                    THEN (CAST(t.n_agree AS DOUBLE)
                          / CAST(t.n_docs AS DOUBLE) - pe.pe)
                         / (1.0 - pe.pe)
               END AS kappa
        FROM tot t CROSS JOIN pe
    """,
})


# Exact permutation-rank Spearman refuses corpora past this size: the
# two total-order rank windows put every row through ONE task each.
# 2M rows × ~30 B of (score, id, rank) is a comfortable single-task
# sort; past it, quality_length_spearman_banded is the scale path
# (VERDICT r13 #5 — the inter_arrival_profile guard playbook).
SPEARMAN_EXACT_MAX_ROWS = 2_000_000
SPEARMAN_BANDS = 4096


def quality_length_spearman(
    documents: DataFrame, max_rows: int = SPEARMAN_EXACT_MAX_ROWS
) -> DataFrame:
    """Spearman rank correlation between the cheap quality score and
    document length — the signal-audit every curation pipeline needs
    before it trusts a proxy: if a "quality" heuristic is mostly a
    length detector (|ρ| high), budget-capping by quality silently
    becomes length-capping and the short-doc mass is gone. Uses the
    PERMUTATION-RANK variant: ranks are row_numbers with a doc_id
    tie-break, so they're deterministic on both engines and equal to
    classic Spearman whenever the scores are tie-free; ρ =
    1 − 6·Σd²/(n(n²−1)).

    Exactness: ranks are exact integers; per-doc d² fits a long; the
    CORPUS sum runs in DECIMAL(38,0) (exact and order-free where a
    double sum would be order-dependent — Σd² ~ n³/6 overflows bigint
    past n ≈ 3·10⁶); the final ρ is a fixed-order double expression.
    Zero-token/zero-char docs are filtered on BOTH engines before
    ranking (their score is undefined, and NULL ordering differs
    across engines).

    Scale shape: one scan computing both signals, then the two global
    rank sorts exact permutation Spearman is defined by — each a
    single total-order window, i.e. ONE task holding every row, which
    is why this op is GUARDED at `max_rows` (one cheap column-pruned
    count, the _guard_all_pairs discipline): past the cap it refuses
    and names `quality_length_spearman_banded`, whose band-midrank
    estimate needs no row-grain window at all. Queued for round 17
    (`docs_quality_spearman`, ORACLE_R17)."""
    from pyspark.sql import Window

    d = documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        T.token_count("text").alias("n_tokens"),
        T.punct_count("text").alias("n_punct"),
        T.marker_hits("text", T.STOPWORDS_EN).alias("n_stop"),
    ).filter((F.col("n_tokens") > 0) & (F.col("n_chars") > 0))
    # Guard on the FILTERED relation the rank windows actually consume
    # (ADVICE r14 #2: a corpus heavy in empty docs must not be refused
    # when its rankable payload is under the cap). The projection is
    # eagerly checkpointed FIRST (ADVICE r15 #3) so the guard's pass
    # over the tokenization/punct/stopword expressions is the same
    # pass the rank windows read — previously the preflight count
    # evaluated the whole scoring scan once and the windows then
    # recomputed it, roughly doubling the scan cost. The materialized
    # relation is the NARROW 5-column numeric projection, so even a
    # refused over-cap corpus pays only a small write on top of the
    # scoring scan the filtered count itself requires; the proceed
    # path is bounded at max_rows rows by the guard.
    d = d.localCheckpoint(eager=True)
    n_in = d.count()
    if n_in > max_rows:
        raise ValueError(
            f"quality_length_spearman computes exact global ranks via "
            f"two total-order windows and is capped at {max_rows} "
            f"rankable rows (got {n_in}). Use "
            "quality_length_spearman_banded — band-midrank Spearman, "
            "no row-grain window, error bounded by the largest band's "
            "mass — or pre-sample below the cap."
        )
    d = d.select(
        "doc_id",
        "n_chars",
        (
            (F.col("n_stop").cast("double") / F.col("n_tokens"))
            - (F.col("n_punct").cast("double") / F.col("n_chars"))
        ).alias("quality_score"),
    )
    w_q = Window.orderBy("quality_score", "doc_id")
    w_l = Window.orderBy("n_chars", "doc_id")
    ranked = d.withColumn("r_q", F.row_number().over(w_q)).withColumn(
        "r_l", F.row_number().over(w_l)
    )
    diff = (F.col("r_q") - F.col("r_l")).cast("long")
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((diff * diff).cast("decimal(38,0)")).alias("d2"),
    )
    n_d = F.col("n_docs").cast("double")
    rho = F.lit(1.0) - (F.lit(6.0) * F.col("d2").cast("double")) / (
        n_d * (n_d * n_d - F.lit(1.0))
    )
    return agg.select(
        "n_docs",
        F.col("d2").cast("double").alias("sum_d2"),
        F.when(F.col("n_docs") > 1, rho).alias("rho"),
    )


def quality_length_spearman_banded(
    documents: DataFrame, bands: int = SPEARMAN_BANDS
) -> DataFrame:
    """Band-midrank Spearman — the 100 TB path the exact op's guard
    names. Each signal is quantized into ordered bands (the quality
    score is a difference of two ratios, provably in [-1, 1], so its
    bands are fixed-width; length uses log₂ bands, monotone and
    bounded at ~64·16 bands for any long), every document in a band
    gets the band's MIDRANK — before + (cnt+1)/2, a pure histogram
    quantity — and ρ is the Pearson correlation of the two midrank
    columns, one six-sum aggregate over the corpus.

    Scale shape: two map-side-combined band histograms (≤ `bands`
    rows each — the cum windows run over those tiny relations only),
    two broadcast joins to attach midranks, ONE corpus aggregate.
    No row-grain window, no total-order sort, nothing driver-side.

    Error envelope (documented claim, pinned by test against the
    exact op): band-midranking moves any document's rank by at most
    half its band's mass, so |ρ_banded − ρ_exact| ≤ 3·max_band_share
    up to the tie-midrank/permutation-rank gap; with 4096 bands on a
    spread-out score this is well under 0.05, and the report carries
    max_band_share — the max over BOTH histograms (quality bands AND
    length bands, ADVICE r14 #3) — so a pathological concentration in
    either signal (every doc the same score, or near-identical
    lengths) is VISIBLE in the output instead of silently degrading.
    Rows-only by design (libm log2 +
    order-dependent double sums); the exact op is the certified one."""
    d = documents.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        T.token_count("text").alias("n_tokens"),
        T.punct_count("text").alias("n_punct"),
        T.marker_hits("text", T.STOPWORDS_EN).alias("n_stop"),
    ).filter((F.col("n_tokens") > 0) & (F.col("n_chars") > 0))
    score = (F.col("n_stop").cast("double") / F.col("n_tokens")) - (
        F.col("n_punct").cast("double") / F.col("n_chars")
    )
    d = d.select(
        F.least(
            F.lit(bands - 1),
            F.greatest(
                F.lit(0),
                F.floor((score + F.lit(1.0)) / F.lit(2.0) * bands),
            ),
        )
        .cast("long")
        .alias("qb"),
        F.floor(F.log2(F.col("n_chars").cast("double")) * F.lit(16.0))
        .cast("long")
        .alias("lb"),
    )

    def _midranks(col: str):
        from pyspark.sql import Window

        hist = d.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        # tiny relation (≤ bands rows) — the cum window is band-grain
        cum = F.sum("cnt").over(
            Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        )
        return hist.select(
            col,
            "cnt",
            (
                F.coalesce(cum, F.lit(0)).cast("double")
                + (F.col("cnt").cast("double") + F.lit(1.0)) / F.lit(2.0)
            ).alias(f"mr_{col}"),
        )

    qm, lm = _midranks("qb"), _midranks("lb")
    joined = d.join(F.broadcast(qm.drop("cnt")), "qb").join(
        F.broadcast(lm.drop("cnt")), "lb"
    )
    agg = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("mr_qb").alias("sx"),
        F.sum("mr_lb").alias("sy"),
        F.sum(F.col("mr_qb") * F.col("mr_lb")).alias("sxy"),
        F.sum(F.col("mr_qb") * F.col("mr_qb")).alias("sxx"),
        F.sum(F.col("mr_lb") * F.col("mr_lb")).alias("syy"),
    )
    # max over BOTH band histograms (ADVICE r14 #3): a pathological
    # concentration in the LENGTH bands degrades the estimate exactly
    # like one in the quality bands, so it must be equally visible.
    def _max_share(hist, col):
        return hist.select(
            (F.max("cnt").cast("double") / F.sum("cnt").cast("double"))
            .alias(col)
        )

    max_share = (
        _max_share(qm, "qb_share")
        .crossJoin(F.broadcast(_max_share(lm, "lb_share")))
        .select(
            F.greatest("qb_share", "lb_share").alias("max_band_share")
        )
    )
    n_d = F.col("n_docs").cast("double")
    cov = n_d * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = n_d * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n_d * F.col("syy") - F.col("sy") * F.col("sy")
    return agg.crossJoin(F.broadcast(max_share)).select(
        "n_docs",
        F.when(
            (varx > 0) & (vary > 0), cov / F.sqrt(varx * vary)
        ).alias("rho_banded"),
        "max_band_share",
    )


# Round-17 queue, fourth textops member. The mirror repeats the score
# expression, both tie-broken rank windows, the HUGEINT-exact d^2 sum,
# and the fixed-order rho.
ORACLE_R17.update({
    "docs_quality_spearman": f"""
        WITH d AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len({_TOKENS}) AS n_tokens,
                   len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
                   len(list_filter({_TOKENS}, w -> w IN ({_STOP_LIST})))
                       AS n_stop
            FROM documents
        ),
        f AS (
            SELECT doc_id, n_chars,
                   (n_stop::DOUBLE / n_tokens)
                       - (n_punct::DOUBLE / n_chars) AS quality_score
            FROM d WHERE n_tokens > 0 AND n_chars > 0
        ),
        r AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY quality_score, doc_id)
                       AS r_q,
                   ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS r_l
            FROM f
        ),
        agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   SUM(CAST((r_q - r_l) * (r_q - r_l) AS HUGEINT)) AS d2
            FROM r
        )
        SELECT n_docs,
               CAST(d2 AS DOUBLE) AS sum_d2,
               CASE WHEN n_docs > 1
                    THEN 1.0 - (6.0 * CAST(d2 AS DOUBLE))
                         / (CAST(n_docs AS DOUBLE)
                            * (CAST(n_docs AS DOUBLE)
                               * CAST(n_docs AS DOUBLE) - 1.0))
               END AS rho
        FROM agg
    """,
})

# Round 16: the R17 textops trio lands at its scheduled bound (VERDICT
# r15 #2, COVERAGE round-16 checklist #2): library + fixture tests +
# audited oracles held since round 13, parity-rehearsed at sf0.01
# every round since. They take window slots this round (staleness at
# birth), displacing tail fillers per the re-run greedy audit.
ORACLE.update(ORACLE_R17)
QUERIES.update({
    "corpus_token_heavy_hitters": _q(token_heavy_hitters),
    "text_lang_kappa": _q(lang_kappa),
    "docs_quality_spearman": _q(quality_length_spearman),
})


def source_token_tvd(documents: DataFrame) -> DataFrame:
    """Per-source distribution drift as TOTAL VARIATION DISTANCE
    between the source's token distribution and the rest of the
    corpus — the log-free alternative to KL/PSI drift scores (no
    transcendental, so it hash-certifies exactly): TVD = ½ Σ_t
    |p_t − q_t| ∈ [0, 1], the largest probability gap any token-set
    event can have between the two distributions. The per-source
    score ranks which sources are stylistic outliers — the mixture
    designers' first question.

    Exactness: with c_t (source counts, Σ = n) and d_t (rest counts,
    Σ = m), TVD = Σ_t |c_t·m − d_t·n| / (2nm). The numerator is an
    exact DECIMAL(38,0) sum of integer cross-products (order-free; a
    double sum here would be run-order-dependent), and the one
    division runs in doubles with fixed operand order. Tokens the
    source never emits are folded in CLOSED FORM — Σ_{t∉s} d_t·n =
    n·(m − Σ_{t∈s} d_t) — so the engine only touches (source, token)
    pairs that EXIST; the oracle computes the naive source×vocab grid
    instead, so the parity hash certifies the complement identity.

    Scale shape: one (source, token) wordcount shuffle, one
    token-partitioned window for the global counts, a broadcast of
    the |sources|-row totals back onto the pair relation, one
    map-side-combined per-source aggregate. Nothing materializes
    source × vocabulary.
    Queued for round 18 (`source_token_tvd`, ORACLE_R18)."""
    from pyspark.sql import Window

    st = (
        documents.select("source", F.explode(T.tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    g = F.sum("c").over(Window.partitionBy("token")).cast("long")
    st = st.withColumn("g", g)
    src_tot = st.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    total = src_tot.agg(F.sum("n").cast("long").alias("n_all"))
    # 1-row corpus-total normalizer
    src_tot = src_tot.crossJoin(F.broadcast(total)).select(
        "source", "n", (F.col("n_all") - F.col("n")).cast("long").alias("m")
    )
    dec = "decimal(38,0)"
    joined = st.join(F.broadcast(src_tot), "source")
    d = F.col("g") - F.col("c")
    term = F.abs(
        F.col("c").cast(dec) * F.col("m").cast(dec)
        - d.cast(dec) * F.col("n").cast(dec)
    )
    per_src = joined.groupBy("source", "n", "m").agg(
        F.sum(term).alias("a"),
        F.sum(d.cast(dec)).alias("b"),
    )
    sd = F.col("a") + F.col("n").cast(dec) * (
        F.col("m").cast(dec) - F.col("b")
    )
    n_d = F.col("n").cast("double")
    m_d = F.col("m").cast("double")
    return per_src.select(
        "source",
        F.col("n").alias("n_tokens"),
        F.col("m").alias("n_rest_tokens"),
        F.when(
            (F.col("n") > 0) & (F.col("m") > 0),
            sd.cast("double") / (F.lit(2.0) * n_d * m_d),
        ).alias("tvd"),
    )


# Round-18 queue (second member). The mirror computes the NAIVE
# source × vocabulary grid (every token against every source, absent
# ones at c = 0) in HUGEINT — certifying the engine's closed-form
# complement fold — and the identical fixed-order final division.
ORACLE_R18 = {
    "source_token_tvd": f"""
        WITH tok AS (
            SELECT source, unnest({_TOKENS}) AS token FROM documents
        ),
        st AS (
            SELECT source, token, CAST(count(*) AS BIGINT) AS c
            FROM tok WHERE token <> '' GROUP BY 1, 2
        ),
        g AS (SELECT token, CAST(SUM(c) AS BIGINT) AS g FROM st GROUP BY 1),
        srcs AS (
            SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM st GROUP BY 1
        ),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_all FROM st),
        grid AS (
            SELECT s.source, s.n, (t.n_all - s.n) AS m, gg.token, gg.g,
                   COALESCE(stc.c, 0) AS c
            FROM srcs s
            CROSS JOIN tot t
            CROSS JOIN g gg
            LEFT JOIN st stc
              ON stc.source = s.source AND stc.token = gg.token
        ),
        agg AS (
            SELECT source, n, m,
                   SUM(ABS(CAST(c AS HUGEINT) * CAST(m AS HUGEINT)
                           - CAST(g - c AS HUGEINT) * CAST(n AS HUGEINT)))
                       AS sd
            FROM grid GROUP BY 1, 2, 3
        )
        SELECT source, n AS n_tokens, m AS n_rest_tokens,
               CASE WHEN n > 0 AND m > 0
                    THEN CAST(sd AS DOUBLE)
                         / (2.0 * CAST(n AS DOUBLE) * CAST(m AS DOUBLE))
               END AS tvd
        FROM agg
    """,
}


# ---------------------------------------------------------------------------
# Composed winnowing diagnostics — one shared fingerprint pass, four
# consumers (VERDICT r15 #4, the dedup_diagnostics_composed pattern)
# ---------------------------------------------------------------------------

def winnowing_diagnostics_composed(documents: DataFrame) -> DataFrame:
    """The DEPLOYMENT shape of the winnowing (MOSS) diagnostics:
    overlap pairs, passage-sharing clusters, delta-vs-corpus overlap,
    and the source-pair overlap matrix computed over ONE winnowing
    selection pass — the four standalone registry entries each re-pay
    the fingerprint pass in isolation (~15 s of the headline bench at
    sf0.1), exactly the shape VERDICT r14 #5 fixed for the MinHash
    family. The standalones remain (each pricing its diagnostic
    standalone by design); this entry certifies the sharing contract:
    identical rows to the four standalones, one selection pass.

    Output is the melted long form so four report grains hash-certify
    in one relation: (diagnostic, k, t, n1..n4, ratio) —
      overlap  k=doc_a     t=doc_b      n1 = n_shared
      cluster  k=doc_id                 n1 = cluster_rep
      cross    k=new_id    t=corpus_id  n1 = n_shared
      matrix   k=source_a  t=source_b   n1..n3 = fps_a, fps_b,
                                        shared_fps; ratio = fp_jaccard
    (ids melt as strings — the dictionary-key rule of the dedup
    composed entry; every count stays an exact bigint.)

    Scale shape: the selection pass (the only corpus-sized stage) is
    computed ONCE and eagerly checkpointed; the overlap pairs are
    checkpointed once and feed both the pair report and the cluster
    closure; the cross-corpus split happens AFTER selection (a doc's
    fingerprints are independent of which side it lands on — the
    certified standalone's own contract) so neither side re-selects;
    the matrix consumer reads the same checkpointed selection. Every
    relation downstream of the selection is fingerprint-/pair-/
    source-grain. The poly (char-fold) variant is used throughout —
    it is the variant all four standalone oracles certify."""
    fps = (
        winnowing_fingerprints(documents, variant="poly")
        .select("doc_id", "fp")
        .dropDuplicates(["doc_id", "fp"])
        # one selection pass, four consumers — the composed contract
        .localCheckpoint(eager=True)
    )

    nl = F.lit(None).cast("long")
    ns = F.lit(None).cast("string")
    nd = F.lit(None).cast("double")

    # Optimization r17 (guide §2.6 — overlap independent jobs, the
    # curation-pipeline pattern): downstream of the shared fps
    # checkpoint the three materializing chains are independent —
    # (a) pairs → the sequential CC closure, (b) the cross-corpus
    # overlap, (c) the source matrix. Run sequentially they sum
    # (measured warm at sf0.1: 1.2 + 1.3 + 1.2 + 1.2 s); submitted
    # from a thread pool the cross/matrix jobs back-fill the cores the
    # driver-bound CC rounds leave idle. Semantics identical: every
    # branch blocks here before the final union consumes it.
    from concurrent.futures import ThreadPoolExecutor

    spark = documents.sparkSession

    def arm_pairs_clusters():
        spark.sparkContext.setJobDescription(
            "winnowing_diagnostics_composed: pairs + cluster closure"
        )
        p = winnowing_overlap_pairs(documents, fps=fps).localCheckpoint(
            eager=True
        )
        c = winnowing_overlap_clusters(documents, pairs=p)
        return p, c

    def arm_cross():
        spark.sparkContext.setJobDescription(
            "winnowing_diagnostics_composed: cross-corpus overlap"
        )
        return winnowing_overlap_cross_corpus(
            documents.filter(F.col("doc_id") % 10 == 0),
            documents.filter(F.col("doc_id") % 10 != 0),
            new_fps=fps.filter(F.col("doc_id") % 10 == 0),
            corpus_fps=fps.filter(F.col("doc_id") % 10 != 0),
        ).localCheckpoint(eager=True)

    def arm_matrix():
        spark.sparkContext.setJobDescription(
            "winnowing_diagnostics_composed: source overlap matrix"
        )
        return source_winnow_overlap_matrix(
            documents, fps=fps
        ).localCheckpoint(eager=True)

    with ThreadPoolExecutor(max_workers=3) as pool:
        f_pc = pool.submit(arm_pairs_clusters)
        f_cross = pool.submit(arm_cross)
        f_matrix = pool.submit(arm_matrix)
        pairs, clusters_df = f_pc.result()
        cross_df = f_cross.result()
        matrix_df = f_matrix.result()
    spark.sparkContext.setJobDescription(None)

    ov = pairs.select(
        F.lit("overlap").alias("diagnostic"),
        F.col("doc_a").cast("string").alias("k"),
        F.col("doc_b").cast("string").alias("t"),
        F.col("n_shared").cast("long").alias("n1"),
        nl.alias("n2"),
        nl.alias("n3"),
        nl.alias("n4"),
        nd.alias("ratio"),
    )
    cl = clusters_df.select(
        F.lit("cluster").alias("diagnostic"),
        F.col("doc_id").cast("string").alias("k"),
        ns.alias("t"),
        F.col("cluster_rep").cast("long").alias("n1"),
        nl.alias("n2"),
        nl.alias("n3"),
        nl.alias("n4"),
        nd.alias("ratio"),
    )
    cross = cross_df.select(
        F.lit("cross").alias("diagnostic"),
        F.col("new_id").cast("string").alias("k"),
        F.col("corpus_id").cast("string").alias("t"),
        F.col("n_shared").cast("long").alias("n1"),
        nl.alias("n2"),
        nl.alias("n3"),
        nl.alias("n4"),
        nd.alias("ratio"),
    )
    mat = matrix_df.select(
        F.lit("matrix").alias("diagnostic"),
        F.col("source_a").alias("k"),
        F.col("source_b").alias("t"),
        F.col("fps_a").alias("n1"),
        F.col("fps_b").alias("n2"),
        F.col("shared_fps").alias("n3"),
        nl.alias("n4"),
        F.col("fp_jaccard").alias("ratio"),
    )
    return ov.unionByName(cl).unionByName(cross).unionByName(mat)


# Stage-mirror oracle (the dedup_diagnostics_composed pattern): each
# diagnostic's ALREADY-CERTIFIED standalone mirror is embedded as a
# derived table and melted with the identical projections. DuckDB
# recomputes the winnowing selection per arm — the oracle prices
# correctness, not sharing; the sharing claim is Spark-side (one
# checkpointed selection) and measured in SCALE.md.
ORACLE.update({
    "winnowing_diagnostics_composed": f"""
        SELECT 'overlap' AS diagnostic, CAST(doc_a AS VARCHAR) AS k,
               CAST(doc_b AS VARCHAR) AS t,
               CAST(n_shared AS BIGINT) AS n1,
               CAST(NULL AS BIGINT) AS n2, CAST(NULL AS BIGINT) AS n3,
               CAST(NULL AS BIGINT) AS n4, CAST(NULL AS DOUBLE) AS ratio
        FROM ({ORACLE["docs_winnowing_overlap"]})
        UNION ALL
        SELECT 'cluster', CAST(doc_id AS VARCHAR), NULL,
               CAST(cluster_rep AS BIGINT), NULL, NULL, NULL,
               CAST(NULL AS DOUBLE)
        FROM ({ORACLE["docs_winnowing_clusters"]})
        UNION ALL
        SELECT 'cross', CAST(new_id AS VARCHAR),
               CAST(corpus_id AS VARCHAR), CAST(n_shared AS BIGINT),
               NULL, NULL, NULL, CAST(NULL AS DOUBLE)
        FROM ({ORACLE["docs_winnowing_cross_corpus"]})
        UNION ALL
        SELECT 'matrix', source_a, source_b, CAST(fps_a AS BIGINT),
               CAST(fps_b AS BIGINT), CAST(shared_fps AS BIGINT), NULL,
               fp_jaccard
        FROM ({ORACLE["source_winnow_overlap_matrix"]})
    """,
})
QUERIES.update({
    "winnowing_diagnostics_composed": _q(winnowing_diagnostics_composed),
})
