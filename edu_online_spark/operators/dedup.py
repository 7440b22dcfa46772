"""Deduplication operators over the `documents` table (extension surface).

Five strategies, each a different point on the exactness/scale curve:

  exact        sha2(content) groupBy — one shuffle on the hash key.
  ngram        exact Jaccard over word 3-shingles, all-pairs — the
               small-data oracle/baseline (O(n²), correctness anchor).
  minhash-lsh  MinHash signatures + banded LSH — the 100 TB path:
               candidates come from an equi-join on (band, band_hash),
               never a cross join; cost ~ O(n · sig) + join on collisions.
  simhash      64-bit SimHash + pigeonhole chunk join for hamming ≤ 3.
  embedding    cosine near-dup pairs over the embeddings table.

All pair outputs are (doc_a < doc_b) with the similarity value, so the
different strategies are directly comparable (and the LSH variants are
verified against the exact ones in tests/).

CONSTRUCTION IS NOT FREE here, unlike the rest of the engine's lazy
builders: the all-pairs baselines run a count() at build time (the
fail-fast size guard — its whole point is to fire BEFORE the quadratic
join is submitted), and the LSH/SimHash builders run their signature+
banding stage eagerly (localCheckpoint — Spark has no cross-branch CSE,
so the multi-branch plans downstream would otherwise recompute it per
branch; measured 354 s → 5 s at sf0.1). Build these frames when you
intend to run them; an explain()-only inspection pays the signature
stage. The rest of the registry stays construction-lazy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing
from ..functions import text as text_fns
from ..functions.text import tokens
from ..functions.vectors import cosine_similarity
from ..sources import load_table

JACCARD_THRESHOLD = 0.5
HAMMING_MAX = 3
COSINE_THRESHOLD = 0.4

# Hard cap for the O(n²) all-pairs baselines. They exist as correctness
# anchors for the LSH paths; above this size the quadratic join is a
# cluster-killer, so the guard fails fast and points at the scale path.
ALL_PAIRS_MAX_ROWS = 50_000


def _guard_all_pairs(df: DataFrame, op: str, scale_alt: str) -> None:
    """Refuse to run an all-pairs baseline on a corpus-sized input.

    The count is one cheap column-pruned pass; the O(n²) join it blocks
    would be ~n²/2 comparisons. Callers that really want the quadratic
    form on a bigger frame must sample/filter it below the cap first.
    """
    n = df.count()
    if n > ALL_PAIRS_MAX_ROWS:
        raise ValueError(
            f"{op} is an O(n²) all-pairs baseline capped at "
            f"{ALL_PAIRS_MAX_ROWS} rows (got {n}). Use {scale_alt} — "
            "same semantics, equi-join plan — or pre-filter the input."
        )


# A forced F.broadcast() bypasses Spark's size check, so hinting a
# relation that GROWS WITH DUPLICATE MASS (cluster labels, dedup
# losers — 20-50% of a web corpus) is a driver OOM at 100 TB, not a
# hint. Probe the row count (cheap: callers pass localCheckpointed
# relations) and only hint below the cap; above it, the plain join
# lets AQE pick the strategy.
BROADCAST_DUP_MASS_MAX_ROWS = 5_000_000


def broadcast_if_bounded(
    df: DataFrame, cap: int = BROADCAST_DUP_MASS_MAX_ROWS
) -> DataFrame:
    return F.broadcast(df) if df.count() <= cap else df


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact content dedup: keep the min doc_id per identical text.

    Hashing first (sha2-256) means the shuffle key is 32 bytes instead
    of the full document — at 100 TB that's the difference between
    shuffling hashes and shuffling the corpus.
    """
    return (
        documents.select(F.sha2("text", 256).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("dup_cnt"))
        .select("doc_id", "dup_cnt")
    )


def _shingled(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sh: array<string> distinct shingles).

    Optimization r16 (guide §2.4): per-row array_distinct over the
    zero-shuffle shingle array — no explode, no groupBy/collect_set, so
    the whole relation is scan-stage work with ZERO exchanges (the old
    row form shuffled and sorted every token by doc_id, then shipped
    every distinct shingle again through the collect_set aggregation).
    The two-step tokenize-then-gram projection in
    functions.text.shingle_array keeps split() out of the lambda (one
    tokenization per row). The size>0 filter reproduces the old
    groupBy semantics exactly: docs with fewer than n tokens emit no
    row. Element ORDER inside `sh` differs from collect_set's
    (arbitrary) order; every consumer is set-level
    (array_intersect/array_union jaccard, explode, containment).
    """
    from ..functions.text import shingle_array, spread_small_scan, tokens

    # The short-doc guard filters on the TOKEN array, not on the gram
    # array: a filter on `sh` would be predicate-pushed through the
    # projection, inlining the whole gram-transform (split() inside the
    # lambda → O(tokens²) per row) into the scan condition — measured
    # 2.9 s → 13 s on dedup_minhash_lsh before this form. size(_ts) >= n
    # ⇔ size(sh) > 0, and the pushed-down predicate is one cheap split.
    step = (
        spread_small_scan(documents, "doc_id")
        .select("doc_id", tokens("text").alias("_ts"))
        .filter(F.size("_ts") >= n)
    )
    return step.select(
        "doc_id", shingle_array(F.col("_ts"), n, distinct=True).alias("sh")
    )


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 3, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Exact n-gram Jaccard ≥ threshold via the SPARSE co-occurrence
    join — no cross join, no per-pair array intersection.

    |A∩B| comes from the shingle-keyed equi self-join (only pairs
    sharing at least one shingle ever materialize — with threshold > 0
    a pair sharing nothing can't qualify anyway); |A∪B| = |A|+|B|−|A∩B|
    from broadcast per-doc sizes. Value-identical to the array form:
    integer counts divided once in double. The non-equi all-pairs
    BNLJ this replaces took 240 s at sf0.1 (5k docs); the sparse join
    is bounded by co-occurrence, not corpus².

    Still guarded: a worst-case corpus (everyone shares one template
    shingle) degrades toward quadratic pairs — minhash_lsh_pairs
    remains the unconditional scale path.
    """
    _guard_all_pairs(documents, "ngram_jaccard_pairs", "minhash_lsh_pairs")
    sh = _shingle_rows(documents, n, distinct=True)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    # sizes are doc-grain — NOT broadcast-hinted (at corpus scale a
    # doc-cardinality build side would OOM the driver; AQE broadcasts
    # it by measured size when it actually fits)
    return (
        inter.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_prefix(
    documents: DataFrame, n: int = 3, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Exact n-gram Jaccard ≥ threshold via PREFIX FILTERING — the
    candidate-bounded exact path (AllPairs/PPJoin family), same output
    as `ngram_jaccard_pairs` bit for bit.

    The sparse co-occurrence join materializes a row for EVERY shared
    shingle of every pair — Σ_shingle df², which a handful of template
    shingles ("click here to", boilerplate headers) blows up long
    before any pair qualifies. Prefix filtering joins only each doc's
    RAREST p = |T| − ⌈θ|T|⌉ + 1 shingles (global (df, shingle) order):
    if J(A,B) ≥ θ then |A∩B| ≥ ⌈θ·max(|A|,|B|)⌉, and two sets sharing
    α elements must collide within their (len − α + 1)-prefixes — so
    every qualifying pair survives (lossless; pinned by the
    bit-equality test) while high-df shingles never generate
    candidates. Measured at sf0.001: 12,025 co-occurrence pairs →
    1,139 candidates (10.6×) for the same 28 qualifying pairs.

    Exact |A∩B| is then recomputed per CANDIDATE via the
    candidate-bounded semi-join (cost |cand| × avg doc size, not
    corpus²), with the θ·max(|A|,|B|) ≤ min(|A|,|B|) length filter
    shedding size-incompatible candidates before that join. Same
    integer-count / single-double-division arithmetic as the certified
    co-occurrence form, so the certified `_JACCARD_PAIRS_SQL` oracle
    applies unchanged.

    Guarded like its sibling, and for the same measured reason:
    prefix filtering improves the CONSTANT, not the complexity class.
    On a template-heavy corpus the candidate set is still pair-shaped
    — at the 50k-doc rehearsal corpus (low-entropy synthetic text) the
    co-occurrence join is 878M rows and the prefix+length filters
    still leave 61.8M candidates (14×) for a handful of true pairs.
    Exact set-similarity self-joins degrade on low-entropy inputs no
    matter the filter; `minhash_lsh_pairs` remains the unconditional
    scale path, and this op is the strictly-better exact baseline
    below the guard (decontamination-style runs where a banding false
    negative is costlier than the verify join).
    """
    from pyspark.sql import Window

    _guard_all_pairs(
        documents, "ngram_jaccard_pairs_prefix", "minhash_lsh_pairs"
    )
    sh = _shingle_rows(documents, n, distinct=True)
    df_counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    # doc-grain window gives pos and |T| in ONE shuffle by doc_id; the
    # df join is shingle-keyed (AQE broadcasts it when it fits)
    w = Window.partitionBy("doc_id")
    ranked = (
        sh.join(df_counts, "shingle")
        .select(
            "doc_id",
            "shingle",
            F.row_number()
            .over(w.orderBy("df", "shingle"))
            .alias("pos"),
            F.count("*").over(w).alias("sz"),
        )
    )
    prefix = ranked.filter(
        F.col("pos")
        <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    ).select("doc_id", "shingle", "pos", "sz")
    a = prefix.select(
        F.col("doc_id").alias("doc_a"),
        "shingle",
        F.col("pos").alias("pos_a"),
        F.col("sz").alias("sz_a"),
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"),
        "shingle",
        F.col("pos").alias("pos_b"),
        F.col("sz").alias("sz_b"),
    )
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            # length filter: J ≥ θ ⟹ min ≥ θ·|A∪B| ≥ θ·max — prunes
            # only, never decides (verify recomputes exact jaccard)
            & (
                F.least("sz_a", "sz_b").cast("double")
                >= F.lit(threshold) * F.greatest("sz_a", "sz_b")
            )
            # positional filter (PPJoin, Xiao et al. WWW'08): for a
            # qualifying pair, its FIRST collision in the global order
            # has every common shingle at pos ≥ (pos_a, pos_b), so
            # |A∩B| ≤ 1 + min(sz−pos) on that row, while J ≥ θ forces
            # |A∩B| ≥ ⌈θ/(1+θ)·(|A|+|B|)⌉ — the first-collision row
            # always passes, so the DISTINCT pair survives (lossless);
            # junk pairs' collision rows are shed BEFORE the distinct.
            # Measured at the 50k-doc rehearsal corpus: 61.8M → 13.3M
            # candidates. The θ/(1+θ) double rounds DOWN from 1/3,
            # which can only loosen the bound — pruning stays sound.
            & (
                (
                    1
                    + F.least(
                        F.col("sz_a") - F.col("pos_a"),
                        F.col("sz_b") - F.col("pos_b"),
                    )
                ).cast("double")
                >= F.ceil(
                    F.lit(threshold / (1.0 + threshold))
                    * (F.col("sz_a") + F.col("sz_b"))
                )
            )
        )
        .select("doc_a", "doc_b", "sz_a", "sz_b")
        .dropDuplicates(["doc_a", "doc_b"])
        # The candidate set feeds THREE branches below (the pair join
        # and both sides of the id semi-join reducer); Spark has no
        # cross-branch CSE, so without materialization each branch
        # re-executes the whole df+window+prefix-join DAG (same
        # rationale, same shape as minhash_lsh_pairs' candidate
        # checkpoint). Compact pair rows — collision-bounded.
        .localCheckpoint(eager=True)
    )
    # Exact |A∩B| per candidate via the ARRAY form (optimization r17,
    # guide §2.3 — shuffle candidate-bounded doc arrays, not the whole
    # (doc, shingle) row table): the old verify joined cand back
    # against the 260k-row shingle stream TWICE plus a pair-grain
    # count aggregation (measured: ~3.1 s of the query's 3.9 s at
    # sf0.1 sat in the verify, not the window). This is
    # minhash_lsh_pairs' verification contract — re-shingle ONLY the
    # semi-join-reduced candidate docs into per-doc distinct arrays
    # (zero-shuffle, AQE broadcasts the doc-grain build side) and take
    # size(array_intersect) per pair. size(sh) equals the window's sz
    # (same distinct-gram set), so counts and the single double
    # division are bit-identical to the co-occurrence form — pinned by
    # the prefix-vs-co-occurrence equality test and the shared
    # certified oracle.
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b")))
        .distinct()
    )
    sh_arr = _shingled(documents.join(cand_ids, "doc_id", "left_semi"), n)
    return (
        cand.join(
            sh_arr.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("_sa")),
            "doc_a",
        )
        .join(
            sh_arr.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("_sb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("_sa", "_sb")).alias("n_inter"),
            "sz_a",
            "sz_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _shingle_rows(
    documents: DataFrame, n: int = 3, distinct: bool = False
) -> DataFrame:
    """(doc_id, shingle) rows — zero-shuffle array form (see
    functions.text.shingle_rows). distinct=True dedups per doc inside
    the gram array, replacing a downstream dropDuplicates exchange."""
    from ..functions.text import shingle_rows

    return shingle_rows(documents, "doc_id", "text", n, distinct=distinct)


def minhash_lsh_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = JACCARD_THRESHOLD,
    num_hashes: int = hashing.DEFAULT_NUM_HASHES,
    bands: int = hashing.DEFAULT_BANDS,
) -> DataFrame:
    """Near-dup pairs via MinHash + banded LSH, then exact verification.

    Plan: (doc, shingle) rows → 64 min-aggregates (signatures) → explode
    band hashes → self-equi-join on (band, band_hash) → distinct
    candidate pairs → exact Jaccard, computed by re-shingling ONLY the
    candidate docs (a semi-join-reduced subset, usually a few hundred
    rows, instead of the whole corpus). The only all-to-all
    communication is the band join, whose fan-out is bounded by
    collision rate — this is the operator that survives 100 TB
    (16 bands × 4 rows ⇒ P[candidate] ≈ 1-(1-j⁴)¹⁶, steep near j≈0.5).
    """
    sig = hashing.minhash_signatures_df(
        _shingle_rows(documents, n), "doc_id", F.col("shingle"), num_hashes
    )
    banded = sig.select(
        "doc_id",
        F.posexplode(hashing.band_hashes(F.col("sig"), bands, num_hashes)).alias(
            "band", "bh"
        ),
    ).persist()  # both sides of the self-join read this; without the
    # persist each side recomputes the full signature aggregation
    # (bands × 8 bytes × docs — KBs per million docs, safe to cache)
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # The candidate set feeds two downstream branches (the pair join and
    # the semi-join reducer); Spark has no cross-branch CSE, so without
    # materialization each branch re-executes the whole signature+banding
    # DAG. An EAGER localCheckpoint runs that DAG exactly once, stores
    # the (tiny, collision-bounded) candidate partitions, and truncates
    # lineage — which lets us unpersist `banded` immediately instead of
    # leaking cached blocks in long-lived sessions (bench loops, parity
    # sweeps). Checkpoint blocks are reclaimed by the ContextCleaner
    # when the plan is GC'd. (Caveat for real clusters: localCheckpoint
    # blocks die with their executor; under dynamic allocation use
    # reliable checkpointing or accept recompute.)
    cand = cand.localCheckpoint(eager=True)
    banded.unpersist()
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b")))
        .distinct()
    )
    sh = _shingled(documents.join(cand_ids, "doc_id", "left_semi"), n)
    j = hashing.jaccard(F.col("sa.sh"), F.col("sb.sh"))
    return (
        cand.join(sh.alias("sa"), cand.doc_a == F.col("sa.doc_id"))
        .join(sh.alias("sb"), cand.doc_b == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", j.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _banded_sigs(
    docs: DataFrame, n: int, num_hashes: int, bands: int
) -> DataFrame:
    """(doc_id, band, bh): the LSH banding of each doc's MinHash
    signature — the collision key both the inline cross-corpus join
    and the persisted index store."""
    sig = hashing.minhash_signatures_df(
        _shingle_rows(docs, n), "doc_id", F.col("shingle"), num_hashes
    )
    return sig.select(
        "doc_id",
        F.posexplode(hashing.band_hashes(F.col("sig"), bands, num_hashes)).alias(
            "band", "bh"
        ),
    )


def cross_corpus_band_candidates(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    n: int = 3,
    num_hashes: int = hashing.DEFAULT_NUM_HASHES,
    bands: int = hashing.DEFAULT_BANDS,
) -> DataFrame:
    """Banded MinHash CANDIDATE pairs between a new batch and a corpus
    — the collision stage of cross_corpus_minhash_pairs without the
    exact verification, for consumers that score candidates themselves
    (hybrid retrieval re-ranks the candidate union with its own exact
    cosine + Jaccard, so verifying here would do the shingle join
    twice). Returns distinct (new_id, corpus_id), eagerly materialized
    (candidate sets always feed multiple branches)."""

    return (
        _banded_sigs(new_docs, n, num_hashes, bands)
        .alias("a")
        .join(
            _banded_sigs(corpus_docs, n, num_hashes, bands).alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")),
        )
        .select(F.col("a.doc_id").alias("new_id"), F.col("b.doc_id").alias("corpus_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )


def cross_corpus_minhash_pairs(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    n: int = 3,
    threshold: float = JACCARD_THRESHOLD,
    num_hashes: int = hashing.DEFAULT_NUM_HASHES,
    bands: int = hashing.DEFAULT_BANDS,
) -> DataFrame:
    """Incremental dedup: near-dup pairs BETWEEN a new batch and an
    existing corpus — the production ingest shape. A daily 1 TB delta
    against a 100 TB corpus must not re-sign the corpus or consider
    delta-internal / corpus-internal pairs; here only the two banded
    sides join (new.band_hashes ⋈ corpus.band_hashes), so the work is
    O(delta signatures + collisions). The corpus side's signature
    relation is exactly what a production pipeline would persist once
    and reuse per delta (signatures are content-addressed: append-only
    corpus ⇒ append-only signature table).

    Same LSH parameters and exact-verification contract as
    minhash_lsh_pairs: candidates from band collisions, then exact
    Jaccard by re-shingling ONLY candidate docs from each side.
    Output: (new_id, corpus_id, jaccard ≥ threshold).
    """

    cand = cross_corpus_band_candidates(
        new_docs, corpus_docs, n, num_hashes, bands
    )
    sh_new = _shingled(
        new_docs.join(
            cand.select(F.col("new_id").alias("doc_id")).distinct(), "doc_id", "left_semi"
        ),
        n,
    )
    sh_corp = _shingled(
        corpus_docs.join(
            cand.select(F.col("corpus_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_semi",
        ),
        n,
    )
    j = hashing.jaccard(F.col("sa.sh"), F.col("sb.sh"))
    return (
        cand.join(sh_new.alias("sa"), cand.new_id == F.col("sa.doc_id"))
        .join(sh_corp.alias("sb"), cand.corpus_id == F.col("sb.doc_id"))
        .select("new_id", "corpus_id", j.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


MINHASH_INDEX_BUCKETS = 64
_MINHASH_INDEX_FORMAT_VERSION = 1


def build_minhash_index(
    corpus_docs: DataFrame,
    path: str,
    n: int = 3,
    num_hashes: int = hashing.DEFAULT_NUM_HASHES,
    bands: int = hashing.DEFAULT_BANDS,
) -> None:
    """Persist the corpus side of cross-corpus MinHash dedup — the
    build-once-probe-many artifact `cross_corpus_minhash_pairs`'s
    docstring promises a production pipeline would keep (same contract
    as the IVF index and the streaming fingerprint index). Two
    relations under `path`:

      bands/     (doc_id, band, bh) — the LSH collision keys a delta's
                 banded signatures equi-join against.
      shingles/  (doc_id, sh) PARTITIONED BY bucket = pmod(doc_id, 64)
                 — the exact-verification material. Bucket layout is
                 the point (the IVF `cid IN (...)` pattern): a probe
                 re-reads ONLY the buckets its candidate corpus ids
                 live in, so verification cost is O(candidate buckets),
                 not O(corpus re-shingle) — the inline form re-signs
                 and re-shingles 100 TB per daily delta.

    Content-addressed and append-only in production (an appended batch
    writes its own band/shingle rows; nothing is rewritten). Shingles
    write FIRST: the probe's entry relation is bands/, so a crash
    between the writes leaves no readable index rather than a
    bands-without-verification-material torso; the builder re-runs
    idempotently (mode=overwrite, deterministic content).
    """
    sh = _shingled(corpus_docs, n).withColumn(
        "bucket", F.pmod(F.col("doc_id"), F.lit(MINHASH_INDEX_BUCKETS)).cast("int")
    )
    sh.write.mode("overwrite").partitionBy("bucket").parquet(f"{path}/shingles")
    _banded_sigs(corpus_docs, n, num_hashes, bands).write.mode(
        "overwrite"
    ).parquet(f"{path}/bands")


def cross_corpus_minhash_probe(
    new_docs: DataFrame,
    index_path: str,
    n: int = 3,
    threshold: float = JACCARD_THRESHOLD,
    num_hashes: int = hashing.DEFAULT_NUM_HASHES,
    bands: int = hashing.DEFAULT_BANDS,
) -> DataFrame:
    """The probe half of build_minhash_index: near-dup pairs between a
    delta and the PERSISTED corpus index, bit-identical to
    `cross_corpus_minhash_pairs(new_docs, corpus)` run inline (same
    band keys, same stored shingle sets, same exact-Jaccard verify —
    pytest-pinned equality), without touching corpus text: only the
    delta is signed, candidates come from the delta⋈bands equi-join,
    and verification reads the ≤64-bucket subset of shingles/ holding
    candidate ids (bounded collect of bucket ids — the sinks.py
    partition-pruning idiom — then a partition-column isin filter).

    Round-10 registry candidate (`dedup_cross_corpus_probe`, same
    delta convention and the same oracle as dedup_cross_corpus);
    queued in ORACLE_R10 — the round-9 window is full and a query
    registered without a slot trips the staleness contract.
    """
    spark = new_docs.sparkSession
    idx_bands = spark.read.parquet(f"{index_path}/bands")
    cand = (
        _banded_sigs(new_docs, n, num_hashes, bands)
        .alias("a")
        .join(
            idx_bands.alias("b"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.bh") == F.col("b.bh")),
        )
        .select(
            F.col("a.doc_id").alias("new_id"), F.col("b.doc_id").alias("corpus_id")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sh_new = _shingled(
        new_docs.join(
            cand.select(F.col("new_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_semi",
        ),
        n,
    )
    buckets = [
        r["bucket"]
        for r in cand.select(
            F.pmod(F.col("corpus_id"), F.lit(MINHASH_INDEX_BUCKETS))
            .cast("int")
            .alias("bucket")
        )
        .distinct()
        .collect()  # ≤ MINHASH_INDEX_BUCKETS rows — bounded by design
    ]
    sh_corp = (
        spark.read.option("basePath", f"{index_path}/shingles")
        .parquet(f"{index_path}/shingles")
        .filter(F.col("bucket").isin(buckets))  # partition-pruned scan
        .join(
            cand.select(F.col("corpus_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_semi",
        )
        .select("doc_id", "sh")
    )
    j = hashing.jaccard(F.col("sa.sh"), F.col("sb.sh"))
    return (
        cand.join(sh_new.alias("sa"), cand.new_id == F.col("sa.doc_id"))
        .join(sh_corp.alias("sb"), cand.corpus_id == F.col("sb.doc_id"))
        .select("new_id", "corpus_id", j.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """ASYMMETRIC near-dup detection: containment(A in B) =
    |shingles(A) ∩ shingles(B)| / |shingles(A)|. Catches the case
    symmetric Jaccard structurally misses — a document that is a
    chunk/quote of a much larger one (Jaccard ≈ |A|/|B| → 0, while
    containment = 1) — which is exactly how boilerplate wrappers and
    excerpt spam duplicate training data.

    Same sparse co-occurrence plan as ngram_jaccard_pairs (shingle-keyed
    equi self-join, broadcastable per-doc sizes, division-free compare
    avoided here because the ratio IS the output) — only pairs sharing
    ≥1 shingle materialize. Emits both directions (containment is not
    symmetric). Guarded like every all-pairs baseline; the LSH path
    remains the unconditional scale form for candidate generation.
    """
    _guard_all_pairs(documents, "containment_pairs", "minhash_lsh_pairs")
    sh = _shingle_rows(documents, n, distinct=True)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sz_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    return (
        inter.join(sz_a, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            (F.col("n_inter").cast("double") / F.col("sz_a")).alias(
                "containment"
            ),
        )
        .filter(F.col("containment") >= threshold)
    )


def text_knn_minhash(documents: DataFrame, k: int = 3) -> DataFrame:
    """Text k-NN: each document's k most-similar neighbors by exact
    word-shingle Jaccard, restricted to MinHash-LSH candidates — the
    text-side analog of the embedding ANN path (similarity.py), for
    retrieval/aug pipelines that work on raw text.

    Reuses the dedup candidate generator with NO similarity floor
    (threshold 0: every banded collision is scored), mirrors the
    half-pairs so both endpoints get neighbors, then a per-doc window
    top-k with a deterministic (jaccard desc, neighbor asc) tie-break.
    Approximate by construction — a neighbor with no band collision is
    invisible — so the query is rows-only; recall against exact
    Jaccard is pinned by pytest on planted fixtures.
    """
    from pyspark.sql import Window

    pairs = minhash_lsh_pairs(documents, threshold=0.0)
    mirrored = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"),
            F.col("doc_a").alias("doc_b"),
            "jaccard",
        )
    )
    w = Window.partitionBy("doc_a").orderBy(
        F.desc("jaccard"), F.asc("doc_b")
    )
    return (
        mirrored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("doc_a").alias("doc_id"),
            F.col("doc_b").alias("neighbor_id"),
            "jaccard",
            "rank",
        )
    )


def simhash_pairs(documents: DataFrame, max_hamming: int = HAMMING_MAX) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance ≤ max_hamming.

    Pigeonhole blocking: split the 64-bit fingerprint into
    max_hamming+1 chunks — any pair within the distance budget agrees
    on ≥1 whole chunk, so candidates come from an equi-join on
    (chunk_idx, chunk_value). Same no-cross-join property as LSH.
    """
    chunks = max_hamming + 1
    bits = 64 // chunks
    from ..functions.text import spread_small_scan

    # spread (optimization r16, guide §2): the 64-vote signature
    # aggregation's explode+hash runs in the scan stage; a sub-split
    # local input would run it on one core. No-op at scale.
    sig = hashing.simhash_df(
        spread_small_scan(documents, "doc_id").select(
            "doc_id", tokens("text").alias("tk")
        ),
        "doc_id",
        F.col("tk"),
    )
    chunked = sig.select(
        "doc_id",
        "sim",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sim"), i * bits).bitwiseAND(
                        F.lit((1 << bits) - 1).cast("long")
                    )
                    for i in range(chunks)
                ]
            )
        ).alias("chunk", "cv"),
    # both sides of the self-join read this; materialize the (tiny:
    # chunks rows × 24 bytes per doc) relation once instead of running
    # the 64-vote signature aggregation twice (same rationale and
    # mechanism as minhash_lsh_pairs' banded relation)
    ).localCheckpoint(eager=True)
    return (
        chunked.alias("a")
        .join(
            chunked.alias("b"),
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hashing.hamming64(F.col("a.sim"), F.col("b.sim")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def near_dup_clusters(pairs: DataFrame) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster_rep).

    The curation deliverable: every doc in a duplicate cluster mapped to
    the cluster's minimum doc_id (the canonical survivor).

    Optimization r17 (guide §2 — shrink the data an iterative algorithm
    carries): min-label STAR CONTRACTION instead of fixpoint label
    propagation over the original graph. Each round, over the CURRENT
    contracted graph g (symmetric edge set, so one groupBy covers the
    whole neighborhood):

        l1(u)  = min(u, min over neighbors)     — one aggregation
        l2(u)  = l1(l1(u))                      — one pointer-jump join
        g      ← edges rewritten to (l2(src), l2(dst)),
                 self-loops dropped, deduped    — CONTRACTION

    Contraction is what the r16 propagation loop was missing: labels
    there moved one edge-hop per round (a second pointer jump per round
    was measured useless — the loop was graph-distance-bound), so the
    long passage-sharing chains of the winnowing pair graph took 7
    rounds. Rewriting the edges onto labels merges every local-min star
    into one super-vertex, so both the edge count AND the effective
    diameter shrink geometrically — measured on that same graph: 7
    rounds → 3, and the round-2/3 graphs are a fraction of the
    original edge set (8.4k-pair graph at sf0.1: 12.4k → 1.7k → 0
    directed contracted edges).

    Soundness: super-vertex ids are original doc_ids; l1(u) is a member
    of u's component with l1(u) ≤ u, hence so is l2(u) (labels only
    decrease — least over mins), and edges between distinct labels
    preserve component connectivity in the contracted graph. The
    component's global minimum m always labels itself (every contracted
    neighbor id of m is a component member > m), so m survives every
    round; the loop ends when no edges remain, i.e. every component has
    contracted to exactly one surviving super-vertex — which is
    therefore m. Each doc's final cluster_rep is the composition of its
    per-round labels: mapping rows left-join each (checkpointed, tiny,
    shrinking) round label table and coalesce — finished components
    pass through untouched. Equivalence to per-component minimum is
    pinned by tests/test_dedup.py::test_near_dup_clusters_matches_union_find
    (randomized graphs vs a union-find reference) and every cluster
    oracle (parity run).

    Each round's label table and contracted edge set are eagerly
    local-checkpointed: the labels are consumed three times (two edge
    rewrites + the mapping composition) and Spark has no cross-branch
    CSE; the edge checkpoint truncates the otherwise exponentially-
    growing lineage, and its count (convergence test) reads the
    just-stored blocks, not the plan. The loop runs UNTIL convergence
    (no edges), with a generous safety cap that raises rather than
    silently returning an unconverged closure.
    """
    max_rounds = 64  # log-diameter cap; far beyond any real corpus
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b"), F.col("doc_a")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # mapping doc_id → current super-vertex, composed LAZILY from the
    # per-round checkpointed label tables (a ≤max_rounds-deep chain of
    # left joins over shrinking relations) — no per-round mapping job.
    mapping = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_rep", F.col("doc_id"))
    )
    g = edges
    for _ in range(max_rounds):
        nbr_min = g.groupBy("src").agg(F.min("dst").alias("_m"))
        l1 = nbr_min.select(
            F.col("src").alias("_u"),
            F.least(F.col("src"), F.col("_m")).alias("_l1"),
        )
        # pointer jump: l2(u) = l1(l1(u)). l1 covers every active
        # vertex and every l1 value IS an active vertex (self or a
        # neighbor of the symmetric edge set), so the join always hits.
        jump = l1.select(F.col("_u").alias("_ju"), F.col("_l1").alias("_jl"))
        lbl = (
            l1.join(jump, l1["_l1"] == jump["_ju"])
            .select(F.col("_u"), F.col("_jl").alias("_lbl"))
            .localCheckpoint(eager=True)
        )
        g = (
            g.join(
                lbl.select(F.col("_u").alias("src"), F.col("_lbl").alias("_ls")),
                "src",
            )
            .join(
                lbl.select(F.col("_u").alias("dst"), F.col("_lbl").alias("_ld")),
                "dst",
            )
            .select(F.col("_ls").alias("src"), F.col("_ld").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        mapping = mapping.join(
            lbl.select(F.col("_u").alias("cluster_rep"), F.col("_lbl")),
            "cluster_rep",
            "left",
        ).select(
            "doc_id", F.coalesce("_lbl", "cluster_rep").alias("cluster_rep")
        )
        if g.count() == 0:
            # materialize once — consumers (lang_purity, savings,
            # curation, ...) branch over the result; matches the r16
            # form, whose return was a select of a checkpointed round.
            return mapping.localCheckpoint(eager=True)
    raise RuntimeError(
        f"near_dup_clusters did not converge in {max_rounds} rounds — "
        "component diameter exceeds the cap; raise max_rounds"
    )


def minhash_near_dup_clusters(
    documents: DataFrame, threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """End-to-end: MinHash-LSH pairs → connected components."""
    return near_dup_clusters(minhash_lsh_pairs(documents, threshold=threshold))


def neardup_curated(documents: DataFrame, threshold: float = JACCARD_THRESHOLD) -> DataFrame:
    """The curation deliverable composed end-to-end: the corpus with
    near-duplicate clusters collapsed to their canonical survivor
    (minimum doc_id), singletons untouched.

    LSH pairs → connected components → anti-join the non-survivors
    out. The anti-join probe side is only the duplicate cluster
    members (tiny), so the corpus pass is one scan + one broadcast
    anti join."""
    clusters = near_dup_clusters(minhash_lsh_pairs(documents, threshold=threshold))
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_rep")).select("doc_id")
    return documents.join(losers, "doc_id", "left_anti").select(
        "doc_id", "source", "lang"
    )


def embedding_neardup_pairs(
    embeddings: DataFrame, threshold: float = COSINE_THRESHOLD
) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ threshold (all-pairs form).

    The all-pairs join is the correctness anchor; the scale path for
    the same predicate is similarity.ann_lsh's hyperplane buckets.
    Guarded: raises above ALL_PAIRS_MAX_ROWS.
    """
    _guard_all_pairs(embeddings, "embedding_neardup_pairs", "similarity.ann_lsh")
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def cos_seq(a: pd.Series, b: pd.Series) -> pd.Series:
        """Vectorized batches, SEQUENTIAL-ORDER arithmetic: cumsum is a
        strict left-to-right prefix sum, so dot and norm reproduce the
        F.aggregate fold (and the DuckDB list_sum oracle) bit-for-bit —
        np.sum's pairwise summation would drift in the low bits and
        break the hash match. ~20× faster than the interpreted
        per-pair HOF fold this replaces (60 s → s at sf0.1)."""
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        dots = np.cumsum(ma * mb, axis=1)[:, -1]
        na = np.sqrt(np.cumsum(ma * ma, axis=1)[:, -1])
        nb = np.sqrt(np.cumsum(mb * mb, axis=1)[:, -1])
        return pd.Series(dots / (na * nb))

    e = embeddings.select("vec_id", "embedding")
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos_seq(F.col("a.embedding"), F.col("b.embedding")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup_keep(
    embeddings: DataFrame, threshold: float = COSINE_THRESHOLD
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): collapse clusters of semantically
    near-identical items (embedding cosine ≥ threshold) into one
    canonical survivor — the curation step that removes paraphrase-level
    redundancy exact and MinHash dedup can't see.

    Composition of two already-certified pieces: cosine near-dup pairs →
    connected components → keep the minimum vec_id per cluster. Every
    vector gets a verdict row (singletons are their own cluster rep,
    kept=true), so the output is a total keep/drop decision, not just
    the duplicate pairs. The pair stage here is the guarded all-pairs
    correctness anchor; at corpus scale feed similarity.ann_lsh bucket
    candidates into the same clustering — the components/keep logic is
    candidate-source-agnostic.
    """
    pairs = embedding_neardup_pairs(embeddings, threshold).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    clusters = near_dup_clusters(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_rep"
    )
    return (
        embeddings.select("vec_id")
        .join(clusters, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster_rep", "vec_id").alias("cluster_rep"),
            (F.coalesce("cluster_rep", "vec_id") == F.col("vec_id")).alias("kept"),
        )
    )


NEG_SAMPLE_K = 5
SPLIT_VAL_PCT = 10
SPLIT_TEST_PCT = 10


def leakage_safe_split(
    documents: DataFrame,
    val_pct: int = SPLIT_VAL_PCT,
    test_pct: int = SPLIT_TEST_PCT,
) -> DataFrame:
    """Near-dup-aware train/val/test assignment: every member of a
    near-duplicate cluster hashes on its cluster REPRESENTATIVE, so
    two near-identical documents can never straddle train and eval —
    the split-leakage failure mode a plain per-doc hash
    (textops.train_val_test_split) cannot prevent (a near-copy of a
    training doc in the test set silently inflates eval).

    Singletons hash on their own id, so for them the assignment is
    bit-identical to the plain split — adopting the safe split moves
    ONLY documents living in duplicate clusters. The cluster relation
    is the certified LSH→connected-components output (duplicate docs
    only); it broadcasts into the left join only while it is actually
    small — duplicate mass is 20-50% of a web corpus, so the hint is
    size-probed (broadcast_if_bounded), not forced.
    Output: (doc_id, split_key, split) — per-document, hash-exact.
    """
    from ..functions.core import hash_bucket

    clusters = near_dup_clusters(minhash_lsh_pairs(documents))
    with_rep = documents.select("doc_id").join(
        broadcast_if_bounded(clusters), "doc_id", "left"
    )
    key = F.coalesce(F.col("cluster_rep"), F.col("doc_id"))
    b = hash_bucket(key, 100)
    split = (
        F.when(b < test_pct, F.lit("test"))
        .when(b < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return with_rep.select(
        "doc_id", key.alias("split_key"), split.alias("split")
    )


def split_leakage_compare(
    documents: DataFrame,
    val_pct: int = SPLIT_VAL_PCT,
    test_pct: int = SPLIT_TEST_PCT,
) -> DataFrame:
    """The audit that justifies leakage_safe_split: for BOTH split
    methods — 'plain' (per-doc hash, textops.train_val_test_split's
    rule) and 'leakage_safe' (cluster-rep hash) — count the near-dup
    pairs that straddle two different splits. The safe method's count
    is ZERO BY CONSTRUCTION (same key ⇒ same split), and this query
    certifies that guarantee as data rather than as a docstring claim,
    next to the plain method's measured leak count.

    Cross-split pairs per cluster are counted with the identity
    C(n,2) − Σ_split C(k,2) — all-integer, no pair enumeration, so the
    heavy side is one aggregate over (cluster, split) counts. The
    cluster relation is the certified LSH→connected-components output
    (tiny: duplicate docs only, broadcast).
    """
    from ..functions.core import hash_bucket

    # probe the dup-mass-sized relation ONCE for both method joins
    clusters = broadcast_if_bounded(
        near_dup_clusters(minhash_lsh_pairs(documents)).select(
            "doc_id", "cluster_rep"
        )
    )

    def split_of(key):
        b = hash_bucket(key, 100)
        return (
            F.when(b < test_pct, F.lit("test"))
            .when(b < test_pct + val_pct, F.lit("val"))
            .otherwise(F.lit("train"))
        )

    out = []
    for method, key in [
        ("plain", F.col("doc_id")),
        ("leakage_safe", F.coalesce(F.col("cluster_rep"), F.col("doc_id"))),
    ]:
        labeled = documents.select("doc_id").join(
            clusters, "doc_id", "left"
        ).select(
            "doc_id", "cluster_rep", split_of(key).alias("split")
        )
        per_cluster_split = (
            labeled.filter(F.col("cluster_rep").isNotNull())
            .groupBy("cluster_rep", "split")
            .agg(F.count("*").alias("k"))
        )
        per_cluster = per_cluster_split.groupBy("cluster_rep").agg(
            F.sum("k").alias("n"),
            F.sum(
                ((F.col("k") * (F.col("k") - 1)) / 2).cast("long")
            ).alias("same_pairs"),
        )
        leak = per_cluster.agg(
            F.coalesce(
                F.sum(
                    (F.col("n") * (F.col("n") - 1) / 2).cast("long")
                    - F.col("same_pairs")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_cross_split_pairs"),
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias(
                "n_clustered_docs"
            ),
        )
        counts = labeled.groupBy().pivot(
            "split", ["train", "val", "test"]
        ).count()
        row = leak.crossJoin(counts).select(
            F.lit(method).alias("method"),
            "n_cross_split_pairs",
            "n_clustered_docs",
            F.coalesce(F.col("train"), F.lit(0)).alias("n_train"),
            F.coalesce(F.col("val"), F.lit(0)).alias("n_val"),
            F.coalesce(F.col("test"), F.lit(0)).alias("n_test"),
        )
        out.append(row)
    return out[0].unionByName(out[1])


def memorization_risk(
    documents: DataFrame,
    span: int = 15,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document memorization-risk score: the fraction of a
    document's `span`-token windows that occur verbatim in ≥ min_docs
    documents (the repeated_spans signal, folded back to the doc
    grain). A doc that is 80% corpus-repeated boilerplate is a
    memorization hazard even if document-level near-dup dedup kept it —
    this is the per-doc triage column a curation pipeline sorts by
    before substring_dedup's surgical masking.

    One span explode, eagerly checkpointed because BOTH branches (the
    per-doc denominator and the repeated-span join) consume it and
    Catalyst would otherwise re-explode the corpus twice (P7 pattern).
    Span-text groupBy + two doc-grain aggregates — all linear in corpus
    tokens; the risk division is a single double op (exact
    cross-engine).
    """
    sp = _span_rows(documents, span).localCheckpoint(eager=True)
    rep = (
        sp.groupBy("span")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("span")
    )
    per_doc = sp.groupBy("doc_id").agg(F.count("*").alias("n_spans"))
    rep_occ = (
        sp.join(rep, "span")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_repeated_spans"))
    )
    return (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .join(rep_occ, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_repeated_spans", F.lit(0)).alias(
                "n_repeated_spans"
            ),
            F.when(
                F.coalesce("n_spans", F.lit(0)) > 0,
                F.coalesce("n_repeated_spans", F.lit(0)).cast("double")
                / F.col("n_spans"),
            )
            .otherwise(F.lit(0.0))
            .alias("memorization_risk"),
        )
    )


SUBSTR_SPAN_TOKENS = 15  # repeated-span window (Lee et al. 2021 use 50
# BPE tokens at web scale; 15 words fits this corpus' 10-100-word docs)
SUBSTR_MIN_DOCS = 2


def _span_rows(documents: DataFrame, span: int) -> DataFrame:
    """(doc_id, start [1-based], span): every contiguous `span`-token
    window of every document — posexplode + lead() like shingle_rows,
    but keeping the start position (masking needs it). Codegen
    expressions only; one shuffle on doc_id; output rows = corpus
    token count (linear)."""
    from pyspark.sql import Window

    tok = documents.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "t")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = [F.col("t")] + [F.lead("t", i).over(w) for i in range(1, span)]
    return (
        tok.select(
            "doc_id",
            (F.col("pos") + 1).alias("start"),
            F.concat_ws(" ", *grams).alias("span"),
            grams[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .drop("_last")
    )


def repeated_spans(
    documents: DataFrame,
    span: int = SUBSTR_SPAN_TOKENS,
    min_docs: int = SUBSTR_MIN_DOCS,
) -> DataFrame:
    """Cross-document repeated token spans — the exact-substring-dedup
    signal (Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better"): a `span`-token window appearing verbatim
    in ≥ min_docs documents is memorization fuel (licenses, templates,
    syndicated passages) that near-dup DOCUMENT dedup structurally
    misses when the rest of the documents differ.

    One span explode (linear in corpus tokens) → one groupBy on the
    span text. At 100 TB the group key becomes xxhash64(span) — 8-byte
    keys instead of 15-word strings, with a documented 2^-64-per-pair
    collision risk; the text key here is what lets DuckDB reproduce
    the result verbatim. Output: (span, n_docs, n_occurrences).
    """
    return (
        _span_rows(documents, span)
        .groupBy("span")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def substring_dedup(
    documents: DataFrame,
    span: int = SUBSTR_SPAN_TOKENS,
    min_docs: int = SUBSTR_MIN_DOCS,
) -> DataFrame:
    """Exact substring deduplication: REMOVE every token that sits
    inside any cross-document repeated span, keeping the rest of the
    document — the masking form of repeated_spans (document-level
    near-dup dedup keeps one copy of a duplicated passage per cluster;
    this removes every copy of a passage duplicated across otherwise
    distinct documents).

    Pipeline (all linear, three shuffles): span explode → repeated-span
    set (span-keyed count) → flag each occurrence's [start, start+span)
    interval → explode intervals to covered positions (span× constant
    blowup, then distinct) → anti-join the token rows → reassemble the
    surviving tokens in position order. Reassembly is a deterministic
    sort_array over (pos, token) structs, so the output string is
    bit-identical on any engine/partitioning — the DuckDB oracle
    rebuilds it with string_agg(... ORDER BY pos).

    Output: (doc_id, n_tokens, n_removed, text_deduped); a fully-
    covered document survives as an empty string (curation drops it
    downstream), never a missing row.
    """
    sp = _span_rows(documents, span).localCheckpoint(eager=True)
    rep = (
        sp.groupBy("span")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("span")
    )
    return _mask_spans(documents, sp.join(rep, "span"), span)


def _mask_spans(
    documents: DataFrame, flagged: DataFrame, span: int
) -> DataFrame:
    """Shared masking tail: explode each flagged occurrence's interval
    to covered positions (span× constant blowup, then distinct),
    anti-join the token rows, reassemble survivors in position order
    (deterministic sort over (pos, token) structs — bit-identical on
    any engine/partitioning). flagged carries (doc_id, start)."""
    covered = (
        flagged.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.lit(span - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    toks = documents.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos0", "t")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "t")
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "t"))),
                lambda x: x["t"],
            ),
            " ",
        ).alias("text_deduped"),
        F.count("*").alias("n_kept"),
    )
    sizes = documents.select(
        "doc_id", F.size(tokens("text")).alias("n_tokens")
    )
    return sizes.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
        .cast("int")
        .alias("n_removed"),
        F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
    )


def cross_corpus_substring_dedup(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    span: int = SUBSTR_SPAN_TOKENS,
) -> DataFrame:
    """Incremental exact substring dedup — the production ingest shape:
    mask every token of a NEW batch that sits inside a span already
    present in the standing corpus. A daily delta against a 100 TB
    corpus must not re-explode the corpus (its span relation is
    content-addressed and persisted once, appended as the corpus
    grows — same contract as cross_corpus_minhash_pairs' signature
    table) and must not consider delta-internal repeats (those are
    substring_dedup's job on the batch itself, or next run's when the
    batch joins the corpus).

    Only the two span relations equi-join on the span text; work is
    O(delta spans + matches). Output matches substring_dedup's schema
    over the new batch: (doc_id, n_tokens, n_removed, text_deduped).
    """
    new_sp = _span_rows(new_docs, span)
    corpus_spans = _span_rows(corpus_docs, span).select("span").distinct()
    return _mask_spans(new_docs, new_sp.join(corpus_spans, "span"), span)


NEG_QUERY_MOD = 50  # every 50th doc is a training query (bounded batch)
NEG_HASH_MOD = 1_000_003
# Residue-class candidate sizing: the corpus is hash-partitioned into
# M = max(1, n // (NEG_CAND_FACTOR·k)) classes, each query draws
# candidates only from its own class, so the expected candidate pool is
# ~NEG_CAND_FACTOR·k per query REGARDLESS of corpus size — the linear
# replacement for the round-5 q×corpus crossJoin (O(n²/50) at scale).
# 8× overshoot makes running short after near-dup/self exclusion a
# (Poisson tail) non-event; tiny corpora degrade to M=1 = full scan.
NEG_CAND_FACTOR = 8


def retrieval_negative_samples(
    documents: DataFrame, k: int = NEG_SAMPLE_K
) -> DataFrame:
    """Deterministic hard-negative mining for retrieval training: for
    each training query (a bounded batch — every NEG_QUERY_MODth doc
    stands in), k corpus documents that are NOT near-duplicates of it,
    chosen by hash order. No rand(): the same (query, epoch-free)
    negatives on every run, engine, and partitioning — resampling
    noise between replays would silently change the training set.

    Near-dups of the query are excluded by EXACT shingle Jaccard (an
    actual positive sampled as a negative is the classic
    retrieval-training bug), the query itself likewise. LSH banding
    would NOT do here: its false-negative rate (~(1-j⁴)¹⁶ ≈ 35% at
    j=0.5) means a genuine near-duplicate could slip through as a hard
    negative — precisely the bug this exclusion exists to prevent.
    Exactness is affordable because it runs over CANDIDATE PAIRS ONLY
    (round 8 — SCALE.md §4-r7b showed 6.1× wall at 10×): the exclusion
    is consumed solely by the anti-join against the residue-class
    candidates, so Jaccard is computed for those ~queries ×
    NEG_CAND_FACTOR·k pairs — explode each candidate pair with its
    query's shingles, equi-join on (negative_id, shingle), count.
    O(candidates × shingles/doc), corpus-linear. The previous
    all-co-occurring-pairs join (qsh ⋈ csh on shingle) was quadratic
    through its posting lists — the query batch AND the posting lists
    both grow with the corpus (35M intermediate pairs at sf1 vs 4M
    rows on this path) — and computed Jaccard for pairs the anti-join
    could never see.

    Candidate generation is a hash-residue-class equi-join, NOT a
    crossJoin: the corpus is deterministically partitioned into
    M = max(1, n // (NEG_CAND_FACTOR·k)) residue classes by the same
    multiplicative hash used everywhere (functions.core.hash_bucket),
    and each query joins only its own class — expected candidates per
    query stay ~NEG_CAND_FACTOR·k as the corpus grows, so total
    candidate rows are O(queries·k), linear, where the previous
    q×corpus crossJoin was O(n²/NEG_QUERY_MOD). M derives from a 1-row
    count aggregate broadcast-crossed in (no driver action, no rand());
    selection within the class is top-k over the pair-mix hash as
    before. (At 100 TB ids need the pre-reduced 128-bit-safe key mix
    of hash_bucket; the direct mix here is safe for the testdata id
    ranges.)
    """
    from pyspark.sql import Window

    from ..functions.core import hash_bucket

    n_classes = documents.agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.floor(F.count("*") / F.lit(NEG_CAND_FACTOR * k)),
        ).alias("m")
    )

    def residue(col):  # hash_bucket with a column-valued modulus
        return F.pmod(
            F.pmod(F.col(col), F.lit(2147483647)) * F.lit(2654435761),
            F.col("m"),
        )

    q = (
        documents.filter(F.col("doc_id") % NEG_QUERY_MOD == 0)
        .select(F.col("doc_id").alias("query_id"))
        .crossJoin(F.broadcast(n_classes))
        .select("query_id", residue("query_id").alias("g"))
    )
    c = (
        documents.select(F.col("doc_id").alias("negative_id"))
        .crossJoin(F.broadcast(n_classes))
        .select("negative_id", residue("negative_id").alias("g"))
    )
    # candidate pairs feed the exclusion check AND the final ranking —
    # materialize once (narrow id pairs, O(queries·k) rows)
    cand = (
        q.join(c, "g")
        .filter(F.col("query_id") != F.col("negative_id"))
        .select("query_id", "negative_id")
        .localCheckpoint(eager=True)
    )
    sh = _shingle_rows(documents, distinct=True)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    qsh = sh.filter(F.col("doc_id") % NEG_QUERY_MOD == 0).select(
        F.col("doc_id").alias("query_id"), "shingle"
    )
    csh = sh.select(F.col("doc_id").alias("negative_id"), "shingle")
    inter = (
        cand.join(qsh, "query_id")  # candidate pair × query shingles
        .join(csh, ["negative_id", "shingle"])
        .groupBy("query_id", "negative_id")
        .agg(F.count("*").alias("n_inter"))
    )
    near = (
        inter.join(
            sizes.select(F.col("doc_id").alias("query_id"), F.col("sz").alias("sz_q")),
            "query_id",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("negative_id"), F.col("sz").alias("sz_c")
            ),
            "negative_id",
        )
        .filter(
            F.col("n_inter").cast("double")
            / (F.col("sz_q") + F.col("sz_c") - F.col("n_inter"))
            >= JACCARD_THRESHOLD
        )
        .select("query_id", "negative_id")
    )
    ranked = (
        cand.join(near, ["query_id", "negative_id"], "left_anti")
        .withColumn(
            "h",
            hash_bucket(
                F.col("query_id") * F.lit(1_000_003) + F.col("negative_id"),
                NEG_HASH_MOD,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy("h", "negative_id")
    return (
        ranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "negative_id", "rank")
    )


def source_dup_matrix(documents: DataFrame) -> DataFrame:
    """Cross-source exact-duplicate matrix: for every source pair
    (a < b), how many distinct texts appear in BOTH, how many
    cross-source duplicate doc pairs that implies, and the Jaccard of
    the two sources' distinct-text sets. The crawl-triage report a
    100 TB ingest runs before dedup: a source pair with high text
    overlap means one crawler is re-fetching another's corpus, and
    the cheaper fix is upstream (drop the source) rather than
    downstream (pay the dedup).

    Plan shape: per-(hash, source) counts first (the only pass over
    the corpus — texts shrink to 32-byte sha2 keys before any
    shuffle), then a hash-keyed self-join whose per-key fan-out is
    bounded by the SOURCE count (≤ S rows per hash per side, S
    constant), then an S×S-grid left join so zero-overlap pairs are
    preserved (absence of duplication is the report's good news — it
    must appear as a 0, not a missing row). `sizes` is S rows —
    broadcast both times.

    Registered as `source_dup_matrix` (round 9), hash-checked against
    the DuckDB mirror in ORACLE.
    """
    per = (
        documents.select(F.sha2("text", 256).alias("h"), "source")
        .groupBy("h", "source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sizes = per.groupBy("source").agg(
        F.sum("n").cast("long").alias("docs"),
        F.count(F.lit(1)).cast("long").alias("texts"),
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
            F.col("ga.docs").alias("docs_a"),
            F.col("gb.docs").alias("docs_b"),
            F.col("ga.texts").alias("texts_a"),
            F.col("gb.texts").alias("texts_b"),
        )
    )
    overlaps = (
        per.alias("a")
        .join(per.alias("b"), "h")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared_texts"),
            F.sum(F.col("a.n") * F.col("b.n")).cast("long").alias("dup_pairs"),
        )
    )
    return (
        grid.join(overlaps, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "docs_a",
            "docs_b",
            F.coalesce("shared_texts", F.lit(0)).cast("long").alias(
                "shared_texts"
            ),
            F.coalesce("dup_pairs", F.lit(0)).cast("long").alias("dup_pairs"),
            (
                F.coalesce("shared_texts", F.lit(0)).cast("double")
                / (
                    F.col("texts_a")
                    + F.col("texts_b")
                    - F.coalesce("shared_texts", F.lit(0))
                )
            ).alias("text_jaccard"),
        )
    )


def dup_inflation(documents: DataFrame) -> DataFrame:
    """Per-source token inflation from exact duplicates: how much of a
    source's token mass is repeated text. For each source — docs,
    distinct texts, total tokens, tokens counting each distinct text
    once, the duplicate doc/token excess, and the inflation factor
    (total/unique). The budget-planning twin of source_dup_matrix:
    the matrix says WHO shares text ACROSS sources; this says how much
    each source's own mass shrinks under exact dedup — the first
    number a mixture plan needs, since duplicated tokens concentrate
    training probability without adding information.

    Plan shape: texts shrink to 32-byte sha2 keys + an integer token
    count before the only corpus-sized exchange (the source_dup_matrix
    discipline); the per-(source, hash) relation aggregates straight
    down to S rows. All counts are integers; the single double is an
    exact bigint/bigint division any engine evaluates identically."""
    per = (
        documents.select(
            "source",
            F.sha2("text", 256).alias("h"),
            text_fns.token_count("text").alias("nt"),
        )
        .groupBy("source", "h")
        .agg(F.count(F.lit(1)).alias("n"), F.max("nt").alias("nt"))
    )
    return (
        per.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("docs"),
            F.count(F.lit(1)).cast("long").alias("texts"),
            F.sum(F.col("n") * F.col("nt")).cast("long").alias("tokens_total"),
            F.sum("nt").cast("long").alias("tokens_unique"),
        )
        .select(
            "source",
            "docs",
            "texts",
            (F.col("docs") - F.col("texts")).alias("dup_docs"),
            "tokens_total",
            "tokens_unique",
            (F.col("tokens_total") - F.col("tokens_unique")).alias(
                "dup_tokens"
            ),
            (
                F.col("tokens_total").cast("double") / F.col("tokens_unique")
            ).alias("inflation"),
        )
    )


YIELD_THRESHOLDS = (0.5, 0.6, 0.7, 0.8, 0.9)


def threshold_yield_curve(
    documents: DataFrame,
    thresholds: tuple[float, ...] = YIELD_THRESHOLDS,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Dedup tuning report: near-duplicate yield at EVERY candidate
    threshold from one corpus pass — for each threshold, how many
    pairs survive and how many documents are touched. The question a
    pipeline owner actually asks ("what does moving the knob from 0.8
    to 0.7 cost me?") answered without re-running dedup per setting.

    Plan shape: LSH pairs are generated ONCE at the loosest threshold
    (the certified minhash path — every tighter threshold's pair set
    is a subset by definition, so one pass covers the whole curve),
    then the pairs relation (output-sized, far smaller than the
    corpus) is joined against the broadcast threshold dim twice: once
    for pair counts, once for per-doc max-jaccard counts. The
    theta-join (jaccard >= threshold) is a BroadcastNestedLoop over a
    |thresholds|-row build side — the 1-row/S-row normalizer idiom,
    bounded by construction. Zero-yield thresholds are preserved via
    the left join (a clean corpus must report 0s, not vanish).

    Queued for round 11 (`dedup_threshold_yield_curve`, ORACLE_R11) —
    the round-10 window is full and a query registered without a slot
    trips the staleness contract at birth.
    """
    spark = documents.sparkSession
    th = spark.createDataFrame(
        [(float(t),) for t in sorted(thresholds)], "threshold double"
    )
    if pairs is None:
        # pass a precomputed (doc_a, doc_b, jaccard) relation (>= the
        # loosest threshold) to share one LSH pass across diagnostics.
        # ADVICE r15 #2: only the internally-generated pass is
        # checkpointed here — a caller-provided relation is already
        # materialized by the sharing caller (the composed diagnostics
        # eagerly checkpoint it), and re-checkpointing it doubled the
        # materialization of the largest shared relation per run.
        pairs = minhash_lsh_pairs(
            documents, threshold=min(thresholds)
        ).localCheckpoint(eager=True)  # counts + per-doc max share it
    pair_counts = (
        pairs.join(F.broadcast(th), F.col("jaccard") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    doc_max = (
        pairs.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id"), "jaccard"
        )
        .groupBy("doc_id")
        .agg(F.max("jaccard").alias("mj"))
    )
    doc_counts = (
        doc_max.join(F.broadcast(th), F.col("mj") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    return (
        th.join(pair_counts, "threshold", "left")
        .join(doc_counts, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
        )
    )


def cluster_size_profile(
    documents: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    pairs: DataFrame | None = None,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate cluster size histogram — the corpus-health
    summary on top of the cluster closure: for each cluster size, how
    many clusters, how many docs they hold, and how many of those are
    redundant (size - 1 per cluster, the docs exact survivorship
    would drop). The singleton row (size 1: docs in no near-dup pair)
    is computed from the corpus total so the histogram partitions the
    whole corpus — a dedup run's expected yield is readable straight
    off the n_dup_docs column.

    Plan shape: everything downstream of the (already certified)
    LSH-pairs → connected-components closure is two tiny aggregates of
    the cluster relation; the corpus total and the clustered total are
    single-row aggregates combined via the broadcast 1-row normalizer
    idiom — no second corpus pass beyond the doc_id projection."""
    if clusters is None:
        if pairs is None:
            # pass a precomputed pairs (or clusters) relation to share
            # one LSH pass across diagnostics (curation_demo and
            # dedup_diagnostics_composed do)
            pairs = minhash_lsh_pairs(documents, threshold=threshold)
        clusters = near_dup_clusters(pairs)
    per = clusters.groupBy("cluster_rep").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    hist = per.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )
    clustered = per.agg(
        F.coalesce(F.sum("cluster_size"), F.lit(0)).alias("n_clustered")
    )
    singletons = (
        documents.agg(F.count(F.lit(1)).alias("n_total"))
        .crossJoin(F.broadcast(clustered))  # 1 row × 1 row
        .select(
            F.lit(1).cast("long").alias("cluster_size"),
            (F.col("n_total") - F.col("n_clustered"))
            .cast("long")
            .alias("n_clusters"),
        )
    )
    return (
        hist.select(F.col("cluster_size").cast("long"), "n_clusters")
        .unionByName(singletons)
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters")).alias(
                "n_dup_docs"
            ),
        )
    )


def savings_by_source(
    documents: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    pairs: DataFrame | None = None,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Per-source dedup survivorship report — what exact survivorship
    (keep each near-dup cluster's canonical min-doc_id member) would
    delete, in docs and characters, attributed to the source that
    contributed the redundant copy. The cluster-size histogram says
    how much redundancy exists; this says WHERE it comes from and what
    storage/compute it costs — the number a pipeline owner reads
    before deciding which feed to throttle.

    Plan shape: downstream of the certified LSH-pairs → connected-
    components closure, the losers (cluster members that are not their
    cluster_rep) are a tiny relation; one left-semi join marks them on
    the corpus scan and two map-side-combined per-source aggregates
    (all docs / losers only) meet in a |sources|-row left join. Accepts
    precomputed `pairs` or `clusters` so composed diagnostics share
    one LSH pass (BASELINE.md round-11 quantifies the saving).

    Queued for round 13 (`dedup_savings_by_source`, ORACLE_R13)."""
    if clusters is None:
        if pairs is None:
            pairs = minhash_lsh_pairs(documents, threshold=threshold)
        clusters = near_dup_clusters(pairs)
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_rep")).select(
        "doc_id"
    )
    loser_stats = (
        documents.join(losers, "doc_id", "left_semi")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_redundant"),
            F.sum("n_chars").cast("long").alias("chars_removed"),
        )
    )
    base = documents.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_total"),
    )
    return base.join(loser_stats, "source", "left").select(
        "source",
        "n_docs",
        "chars_total",
        F.coalesce("n_redundant", F.lit(0)).cast("long").alias("n_redundant"),
        F.coalesce("chars_removed", F.lit(0)).cast("long").alias("chars_removed"),
        (
            F.coalesce("chars_removed", F.lit(0)).cast("double")
            / F.col("chars_total")
        ).alias("savings_ratio"),
    )


def cluster_lang_purity(
    documents: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    pairs: DataFrame | None = None,
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Language composition of each near-dup cluster — the
    cross-lingual contamination probe: a cluster whose members span
    languages is a translation pair, a mojibake re-encode, or a
    lang-ID error, and every one of those needs different handling
    than a same-language repost (dedup policy usually keeps ONE
    member per language family, not one per cluster). Per cluster:
    size, distinct languages, the majority language and its share —
    ratio rational-exact (bigint/bigint), majority tie-broken
    (count desc, lang asc) so the row is deterministic.

    Plan shape: downstream of the certified closure the cluster
    relation is tiny (collision-bounded); one join tags members with
    lang, two small aggregates and a row_number window over
    cluster-grain rows finish it. Accepts precomputed pairs/clusters
    like the other composed diagnostics.

    Queued for round 14 (`dedup_cluster_lang_purity`, ORACLE_R14)."""
    from pyspark.sql import Window

    if clusters is None:
        if pairs is None:
            pairs = minhash_lsh_pairs(documents, threshold=threshold)
        clusters = near_dup_clusters(pairs)
    tagged = clusters.join(documents.select("doc_id", "lang"), "doc_id")
    per_lang = tagged.groupBy("cluster_rep", "lang").agg(
        F.count(F.lit(1)).alias("lang_cnt")
    )
    w = Window.partitionBy("cluster_rep").orderBy(
        F.desc("lang_cnt"), F.asc("lang")
    )
    top = (
        per_lang.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_rep",
            F.col("lang").alias("top_lang"),
            F.col("lang_cnt").cast("long").alias("top_lang_cnt"),
        )
    )
    sizes = per_lang.groupBy("cluster_rep").agg(
        F.sum("lang_cnt").cast("long").alias("cluster_size"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
    )
    return sizes.join(top, "cluster_rep").select(
        "cluster_rep",
        "cluster_size",
        "n_langs",
        "top_lang",
        "top_lang_cnt",
        (F.col("top_lang_cnt").cast("double") / F.col("cluster_size")).alias(
            "top_lang_share"
        ),
        (F.col("n_langs") > 1).alias("cross_lang"),
    )


# ---------------------------------------------------------------------------
# Oracle-checked query registry
# ---------------------------------------------------------------------------

def _q(fn, table):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(load_table(spark, sf_dir, table))

    return runner


def _q_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry split: every 10th doc is the 'new batch', the rest are
    the standing corpus (deterministic, oracle-mirrorable)."""
    docs = load_table(spark, sf_dir, "documents")
    return cross_corpus_minhash_pairs(
        docs.filter(F.col("doc_id") % 10 == 0),
        docs.filter(F.col("doc_id") % 10 != 0),
    )


def _q_cross_corpus_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same deterministic new/corpus split as _q_cross_corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return cross_corpus_substring_dedup(
        docs.filter(F.col("doc_id") % 10 == 0),
        docs.filter(F.col("doc_id") % 10 != 0),
    )


def _minhash_index(spark: SparkSession, sf_dir: str) -> str:
    """Build-or-reuse the persisted corpus signature index for the
    registry's deterministic corpus split (doc_id % 10 != 0) — the
    similarity._ivf_index caching pattern: content-keyed /tmp path,
    staged build, rename-committed so concurrent builders can race
    safely and a re-run is free."""
    import hashlib
    import os
    import shutil

    # The key covers every parameter the index content depends on
    # (ADVICE r9: n/num_hashes/bands were once covered only by the
    # format version, so retuning DEFAULT_NUM_HASHES without a version
    # bump silently served a stale index to the oracle-parity path).
    key = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}|b{MINHASH_INDEX_BUCKETS}"
        f"|n3|h{hashing.DEFAULT_NUM_HASHES}|bd{hashing.DEFAULT_BANDS}"
        f"|v{_MINHASH_INDEX_FORMAT_VERSION}".encode()
    ).hexdigest()[:12]
    path = f"/tmp/edu_online_spark_minhash_index/{key}"
    if not os.path.exists(path):
        staging = f"{path}.__staging__.{os.getpid()}"
        build_minhash_index(
            load_table(spark, sf_dir, "documents").filter(
                F.col("doc_id") % 10 != 0
            ),
            staging,
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            os.rename(staging, path)
        except OSError:  # concurrent writer won the rename race
            shutil.rmtree(staging, ignore_errors=True)
    return path


def _q_cross_corpus_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver runner for the round-10 candidate: the persisted-index
    probe over the standard delta split. Output contract: identical
    rows to dedup_cross_corpus (same oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    return cross_corpus_minhash_probe(
        docs.filter(F.col("doc_id") % 10 == 0), _minhash_index(spark, sf_dir)
    )


QUERIES = {
    "dedup_exact": _q(exact_dedup, "documents"),
    "dedup_ngram_jaccard": _q(ngram_jaccard_pairs, "documents"),
    "dedup_minhash_lsh": _q(minhash_lsh_pairs, "documents"),
    "dedup_simhash": _q(simhash_pairs, "documents"),  # rows-only (hash-defined)
    "dedup_embedding_cosine": _q(embedding_neardup_pairs, "embeddings"),
    "dedup_near_dup_clusters": _q(minhash_near_dup_clusters, "documents"),
    "dedup_neardup_curated": _q(neardup_curated, "documents"),
    "dedup_containment": _q(containment_pairs, "documents"),
    # rows-only: neighbor set depends on LSH band collisions
    "text_knn_minhash": _q(text_knn_minhash, "documents"),
    "dedup_cross_corpus": _q_cross_corpus,
    "dedup_semantic_keep": _q(semantic_dedup_keep, "embeddings"),
    "retrieval_negative_samples": _q(retrieval_negative_samples, "documents"),
    "corpus_repeated_spans": _q(repeated_spans, "documents"),
    "docs_substring_dedup": _q(substring_dedup, "documents"),
    "dedup_substring_cross_corpus": _q_cross_corpus_substring,
    "docs_leakage_safe_split": _q(leakage_safe_split, "documents"),
    "docs_memorization_risk": _q(memorization_risk, "documents"),
    "split_leakage_compare": _q(split_leakage_compare, "documents"),
    # round 9: queued library op promoted to a certified slot
    "source_dup_matrix": _q(source_dup_matrix, "documents"),
    # round 10: the persisted-index probe, queued + type-audited in
    # round 9 (ORACLE_R10); bit-equal to dedup_cross_corpus by contract
    "dedup_cross_corpus_probe": _q_cross_corpus_probe,
    # round 10: duplication diagnostics on top of the certified cores
    "docs_dup_inflation": _q(dup_inflation, "documents"),
    "dedup_cluster_size_profile": _q(cluster_size_profile, "documents"),
    # round 11: ORACLE_R11 promotion (queued + type-audited in round 10)
    "dedup_threshold_yield_curve": _q(threshold_yield_curve, "documents"),
    # round 12: ORACLE_R12 promotion (queued + type-audited in round 10;
    # riders carried from VERDICT r10: _guard_all_pairs stays, bench at
    # sf0.1 only, candidate-quadratic note copied next to its BASELINE
    # entry)
    "dedup_ngram_jaccard_prefix": _q(ngram_jaccard_pairs_prefix, "documents"),
}

# Exact Jaccard in DuckDB: build distinct 3-shingle lists with a list
# comprehension over the token array, then set arithmetic per pair.
_SHINGLES_CTE = """
    sh AS (
        SELECT doc_id,
               list_distinct([array_to_string(w[i:i+2], ' ')
                              for i in range(1, len(w) - 1)]) AS sh
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w
              FROM documents)
        WHERE len(w) >= 3
    )
"""

_JACCARD_PAIRS_SQL = f"""
    WITH {_SHINGLES_CTE}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           len(list_intersect(a.sh, b.sh))::DOUBLE
               / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
              / len(list_distinct(list_concat(a.sh, b.sh))) >= {JACCARD_THRESHOLD}
"""

ORACLE = {
    "dedup_exact": """
        SELECT min(doc_id) AS doc_id, count(*) AS dup_cnt
        FROM documents GROUP BY text
    """,
    # zipped parallel unnests give (span, start) pairs; span windows
    # mirror Spark's lead()-built concat exactly
    "corpus_repeated_spans": f"""
        WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w
                   FROM documents),
        spans AS (
            SELECT doc_id,
                   unnest([array_to_string(w[i:i+{SUBSTR_SPAN_TOKENS - 1}], ' ')
                           for i in range(1, len(w) - {SUBSTR_SPAN_TOKENS - 2})])
                       AS span
            FROM t WHERE len(w) >= {SUBSTR_SPAN_TOKENS}
        )
        SELECT span,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               count(*) AS n_occurrences
        FROM spans GROUP BY span
        HAVING count(DISTINCT doc_id) >= {SUBSTR_MIN_DOCS}
    """,
    # cluster reps from the exact-Jaccard recursive closure (the
    # dedup_neardup_curated mirror); hash_bucket's documented SQL form
    "docs_leakage_safe_split": f"""
        WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
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
        keyed AS (
            SELECT d.doc_id,
                   COALESCE(l.cluster_rep, d.doc_id) AS split_key
            FROM documents d LEFT JOIN labels l USING (doc_id)
        )
        SELECT doc_id, split_key,
               CASE WHEN ((split_key % 2147483647) * 2654435761) % 100
                         < {SPLIT_TEST_PCT} THEN 'test'
                    WHEN ((split_key % 2147483647) * 2654435761) % 100
                         < {SPLIT_TEST_PCT + SPLIT_VAL_PCT} THEN 'val'
                    ELSE 'train' END AS split
        FROM keyed
    """,
    # incremental form: mask new-batch (doc_id % 10 == 0) tokens inside
    # any span the standing corpus already contains
    "dedup_substring_cross_corpus": f"""
        WITH nd AS (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w
                    FROM documents WHERE doc_id % 10 = 0),
        cd AS (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w
               FROM documents WHERE doc_id % 10 != 0),
        toks AS (
            SELECT doc_id, unnest(w) AS t,
                   CAST(generate_subscripts(w, 1) AS BIGINT) AS pos
            FROM nd
        ),
        new_spans AS (
            SELECT doc_id,
                   unnest([array_to_string(w[i:i+{SUBSTR_SPAN_TOKENS - 1}], ' ')
                           for i in range(1, len(w) - {SUBSTR_SPAN_TOKENS - 2})])
                       AS span,
                   unnest(range(1, len(w) - {SUBSTR_SPAN_TOKENS - 2}))
                       AS start
            FROM nd WHERE len(w) >= {SUBSTR_SPAN_TOKENS}
        ),
        corpus_spans AS (
            SELECT DISTINCT
                   unnest([array_to_string(w[i:i+{SUBSTR_SPAN_TOKENS - 1}], ' ')
                           for i in range(1, len(w) - {SUBSTR_SPAN_TOKENS - 2})])
                       AS span
            FROM cd WHERE len(w) >= {SUBSTR_SPAN_TOKENS}
        ),
        covered AS (
            SELECT DISTINCT s.doc_id,
                   unnest(range(s.start, s.start + {SUBSTR_SPAN_TOKENS}))
                       AS pos
            FROM new_spans s JOIN corpus_spans USING (span)
        ),
        kept AS (
            SELECT doc_id, pos, t FROM toks
            ANTI JOIN covered USING (doc_id, pos)
        ),
        rebuilt AS (
            SELECT doc_id, string_agg(t, ' ' ORDER BY pos) AS text_deduped,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        )
        SELECT nd.doc_id,
               CAST(len(w) AS INTEGER) AS n_tokens,
               CAST(len(w) - COALESCE(r.n_kept, 0) AS INTEGER) AS n_removed,
               COALESCE(r.text_deduped, '') AS text_deduped
        FROM nd LEFT JOIN rebuilt r USING (doc_id)
    """,
    "docs_substring_dedup": f"""
        WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w
                   FROM documents),
        toks AS (
            SELECT doc_id, unnest(w) AS t,
                   CAST(generate_subscripts(w, 1) AS BIGINT) AS pos
            FROM t
        ),
        spans AS (
            SELECT doc_id,
                   unnest([array_to_string(w[i:i+{SUBSTR_SPAN_TOKENS - 1}], ' ')
                           for i in range(1, len(w) - {SUBSTR_SPAN_TOKENS - 2})])
                       AS span,
                   unnest(range(1, len(w) - {SUBSTR_SPAN_TOKENS - 2}))
                       AS start
            FROM t WHERE len(w) >= {SUBSTR_SPAN_TOKENS}
        ),
        rep AS (
            SELECT span FROM spans GROUP BY span
            HAVING count(DISTINCT doc_id) >= {SUBSTR_MIN_DOCS}
        ),
        covered AS (
            SELECT DISTINCT s.doc_id,
                   unnest(range(s.start, s.start + {SUBSTR_SPAN_TOKENS}))
                       AS pos
            FROM spans s JOIN rep USING (span)
        ),
        kept AS (
            SELECT doc_id, pos, t FROM toks
            ANTI JOIN covered USING (doc_id, pos)
        ),
        rebuilt AS (
            SELECT doc_id, string_agg(t, ' ' ORDER BY pos) AS text_deduped,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(len(w) AS INTEGER) AS n_tokens,
               CAST(len(w) - COALESCE(r.n_kept, 0) AS INTEGER) AS n_removed,
               COALESCE(r.text_deduped, '') AS text_deduped
        FROM t LEFT JOIN rebuilt r USING (doc_id)
    """,
    "dedup_ngram_jaccard": _JACCARD_PAIRS_SQL,
    # cross-side exact Jaccard (new = doc_id % 10 == 0 vs the rest);
    # LSH+verify output must equal it, same contract as dedup_minhash_lsh
    "dedup_cross_corpus": f"""
        WITH {_SHINGLES_CTE}
        SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
               len(list_intersect(a.sh, b.sh))::DOUBLE
                   / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                  / len(list_distinct(list_concat(a.sh, b.sh))) >= {JACCARD_THRESHOLD}
    """,
    "dedup_containment": f"""
        WITH {_SHINGLES_CTE}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh)
                   AS containment
        FROM sh a JOIN sh b ON a.doc_id != b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh) >= 0.8
    """,
    # connected components as a recursive transitive closure over the
    # exact near-dup pairs (LSH+verify output ≡ exact pairs here), then
    # min reachable id per node — tiny clusters keep the closure small
    "dedup_near_dup_clusters": f"""
        WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach(src, dst) AS (
            SELECT src, src FROM edges
            UNION SELECT src, dst FROM edges
            UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        )
        SELECT src AS doc_id, min(dst) AS cluster_rep
        FROM reach GROUP BY src
    """,
    # LSH recall at j≈0.99 (the planted near-dups) is ~1.0, and exact
    # verification removes false positives, so the LSH output equals the
    # exact all-pairs result on this corpus (tests/ verify recall).
    "dedup_minhash_lsh": _JACCARD_PAIRS_SQL,
    # corpus minus non-survivor cluster members (survivor = min doc_id
    # reachable in the closure)
    "dedup_neardup_curated": f"""
        WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
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
        )
        SELECT doc_id, source, lang FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM labels
                             WHERE doc_id <> cluster_rep)
    """,
    "dedup_embedding_cosine": f"""
        WITH e AS (SELECT vec_id, embedding FROM embeddings)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                         for i in range(1, len(a.embedding) + 1)])
               / (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
                                 for i in range(1, len(a.embedding) + 1)]))
                  * sqrt(list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                                   for i in range(1, len(b.embedding) + 1)]))) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                        for i in range(1, len(a.embedding) + 1)])
              / (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
                                for i in range(1, len(a.embedding) + 1)]))
                 * sqrt(list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                                  for i in range(1, len(b.embedding) + 1)]))) >= {COSINE_THRESHOLD}
    """,
    # SemDeDup keep/drop verdicts: recursive closure over the cosine
    # pairs (same bit-exact list_sum arithmetic as dedup_embedding_cosine,
    # so both engines agree on pair membership at the threshold), min
    # reachable id per node, then a left join back so singletons carry
    # their own id with kept=true.
    "dedup_semantic_keep": f"""
        WITH RECURSIVE pairs AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_sum([a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                            for i in range(1, len(a.embedding) + 1)])
                  / (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
                                    for i in range(1, len(a.embedding) + 1)]))
                     * sqrt(list_sum([b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE
                                      for i in range(1, len(b.embedding) + 1)])))
                  >= {COSINE_THRESHOLD}
        ),
        edges AS (
            SELECT vec_a AS src, vec_b AS dst FROM pairs
            UNION SELECT vec_b, vec_a FROM pairs
        ),
        reach(src, dst) AS (
            SELECT src, src FROM edges
            UNION SELECT src, dst FROM edges
            UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        ),
        labels AS (
            SELECT src AS vec_id, min(dst) AS cluster_rep
            FROM reach GROUP BY src
        )
        SELECT emb.vec_id,
               coalesce(l.cluster_rep, emb.vec_id) AS cluster_rep,
               coalesce(l.cluster_rep, emb.vec_id) = emb.vec_id AS kept
        FROM embeddings emb LEFT JOIN labels l ON emb.vec_id = l.vec_id
    """,
    # Same span windows as corpus_repeated_spans, folded to doc grain:
    # BIGINT occurrence counts, one double division for the risk.
    "docs_memorization_risk": f"""
        WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS w
                   FROM documents),
        spans AS (
            SELECT doc_id,
                   unnest([array_to_string(w[i:i+{SUBSTR_SPAN_TOKENS - 1}], ' ')
                           for i in range(1, len(w) - {SUBSTR_SPAN_TOKENS - 2})])
                       AS span
            FROM t WHERE len(w) >= {SUBSTR_SPAN_TOKENS}
        ),
        rep AS (
            SELECT span FROM spans GROUP BY span
            HAVING count(DISTINCT doc_id) >= {SUBSTR_MIN_DOCS}
        ),
        per_doc AS (
            SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id
        ),
        rep_occ AS (
            SELECT s.doc_id, count(*) AS n_rep
            FROM spans s JOIN rep USING (span) GROUP BY s.doc_id
        )
        SELECT d.doc_id,
               COALESCE(p.n_spans, 0) AS n_spans,
               COALESCE(r.n_rep, 0) AS n_repeated_spans,
               CASE WHEN COALESCE(p.n_spans, 0) > 0
                    THEN COALESCE(r.n_rep, 0)::DOUBLE / p.n_spans
                    ELSE 0.0 END AS memorization_risk
        FROM documents d
        LEFT JOIN per_doc p USING (doc_id)
        LEFT JOIN rep_occ r USING (doc_id)
    """,
    # Same exact-Jaccard closure as docs_leakage_safe_split (quadratic
    # baseline — sf0.01 policy), same hash split rules, same
    # C(n,2) − Σ C(k,2) all-integer cross-pair identity.
    "split_leakage_compare": f"""
        WITH RECURSIVE pairs AS ({{_JPS}}),
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
        labeled AS (
            SELECT m.method, d.doc_id, l.cluster_rep,
                   CASE WHEN ((CASE WHEN m.method = 'plain' THEN d.doc_id
                               ELSE COALESCE(l.cluster_rep, d.doc_id) END
                               % 2147483647) * 2654435761) % 100
                             < {SPLIT_TEST_PCT} THEN 'test'
                        WHEN ((CASE WHEN m.method = 'plain' THEN d.doc_id
                               ELSE COALESCE(l.cluster_rep, d.doc_id) END
                               % 2147483647) * 2654435761) % 100
                             < {SPLIT_TEST_PCT + SPLIT_VAL_PCT} THEN 'val'
                        ELSE 'train' END AS split
            FROM documents d
            LEFT JOIN labels l USING (doc_id)
            CROSS JOIN (SELECT unnest(['plain', 'leakage_safe']) AS method) m
        ),
        pc AS (
            SELECT method, cluster_rep, split, count(*) AS k
            FROM labeled WHERE cluster_rep IS NOT NULL
            GROUP BY 1, 2, 3
        ),
        per_cluster AS (
            SELECT method, cluster_rep, SUM(k) AS n,
                   SUM((k * (k - 1)) // 2) AS same_pairs
            FROM pc GROUP BY 1, 2
        ),
        leak AS (
            SELECT method,
                   CAST(COALESCE(SUM((n * (n - 1)) // 2 - same_pairs), 0)
                        AS BIGINT) AS n_cross_split_pairs,
                   CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_clustered_docs
            FROM per_cluster GROUP BY method
        ),
        totals AS (
            SELECT method,
                   count(*) FILTER (WHERE split = 'train') AS n_train,
                   count(*) FILTER (WHERE split = 'val') AS n_val,
                   count(*) FILTER (WHERE split = 'test') AS n_test
            FROM labeled GROUP BY method
        )
        SELECT t.method,
               CAST(COALESCE(l.n_cross_split_pairs, 0) AS BIGINT)
                   AS n_cross_split_pairs,
               CAST(COALESCE(l.n_clustered_docs, 0) AS BIGINT)
                   AS n_clustered_docs,
               t.n_train, t.n_val, t.n_test
        FROM totals t LEFT JOIN leak l USING (method)
    """.replace("{_JPS}", _JACCARD_PAIRS_SQL),
    # Same hash order (hash_bucket's documented SQL mirror over the
    # query·1000003+candidate key mix), same exact-Jaccard near-set
    # exclusion the LSH output is certified against, same residue-class
    # candidate partition (M from the corpus count, identical hash).
    "retrieval_negative_samples": f"""
        WITH {_SHINGLES_CTE},
        near AS (
            SELECT a.doc_id AS query_id, b.doc_id AS negative_id
            FROM sh a JOIN sh b ON a.doc_id != b.doc_id
            WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                      / len(list_distinct(list_concat(a.sh, b.sh)))
                  >= {JACCARD_THRESHOLD}
        ),
        m AS (
            SELECT GREATEST(1, CAST(floor(count(*)
                       / {NEG_CAND_FACTOR * NEG_SAMPLE_K}) AS BIGINT)) AS m
            FROM documents
        ),
        cand AS (
            SELECT q.doc_id AS query_id, c.doc_id AS negative_id,
                   (((q.doc_id * 1000003 + c.doc_id) % 2147483647)
                       * 2654435761) % {NEG_HASH_MOD} AS h
            FROM documents q
            JOIN m ON true
            JOIN documents c ON q.doc_id % {NEG_QUERY_MOD} = 0
                            AND q.doc_id != c.doc_id
                            AND ((q.doc_id % 2147483647) * 2654435761) % m.m
                              = ((c.doc_id % 2147483647) * 2654435761) % m.m
            WHERE NOT EXISTS (SELECT 1 FROM near n
                              WHERE n.query_id = q.doc_id
                                AND n.negative_id = c.doc_id)
        )
        SELECT query_id, negative_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY h, negative_id) AS INTEGER) AS rank
        FROM cand
        QUALIFY rank <= {NEG_SAMPLE_K}
    """,
}

# Promoted round 10 (queued + type-audited in round 9 per the
# established pattern: library op + tests + ready oracle one round,
# window slot the next). The probe's contract is bit-equality with the
# inline cross-corpus pairs, so its oracle IS the dedup_cross_corpus
# oracle. Kept as a named dict so the round-9 promotion tests keep
# reading it; merged into ORACLE below.
ORACLE_R10 = {
    "dedup_cross_corpus_probe": f"""
        WITH {_SHINGLES_CTE}
        SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
               len(list_intersect(a.sh, b.sh))::DOUBLE
                   / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                  / len(list_distinct(list_concat(a.sh, b.sh)))
                      >= {JACCARD_THRESHOLD}
    """,
}
ORACLE.update(ORACLE_R10)

# Round-11 promotion queue (library op + tests + ready oracle now,
# window slot next round — the round-10 window is full). Same pair
# arithmetic the LSH output is certified against; the threshold dim is
# constructed from identical double literals on both sides.
ORACLE_R11 = {
    "dedup_threshold_yield_curve": f"""
        WITH pairs AS ({_JACCARD_PAIRS_SQL}),
        th AS (
            -- DOUBLE[] cast: a bare decimal list binds the column as
            -- DECIMAL(2,1), which the driver's typed-row hash would
            -- see as a different type than Spark's double literals
            SELECT unnest(CAST([0.5, 0.6, 0.7, 0.8, 0.9] AS DOUBLE[]))
                AS threshold
        ),
        pc AS (
            SELECT t.threshold, count(*) AS n_pairs
            FROM th t JOIN pairs p ON p.jaccard >= t.threshold
            GROUP BY 1
        ),
        dm AS (
            SELECT doc_id, max(jaccard) AS mj
            FROM (SELECT doc_a AS doc_id, jaccard FROM pairs
                  UNION ALL SELECT doc_b, jaccard FROM pairs)
            GROUP BY 1
        ),
        dc AS (
            SELECT t.threshold, count(*) AS n_docs
            FROM th t JOIN dm ON dm.mj >= t.threshold
            GROUP BY 1
        )
        SELECT t.threshold,
               CAST(COALESCE(pc.n_pairs, 0) AS BIGINT) AS n_pairs,
               CAST(COALESCE(dc.n_docs, 0) AS BIGINT) AS n_docs
        FROM th t
        LEFT JOIN pc ON pc.threshold = t.threshold
        LEFT JOIN dc ON dc.threshold = t.threshold
    """,
}
# Round 11: promoted on schedule (the op held a library+tests slot
# through round 10; the window slot is this round's registry edit).
ORACLE.update(ORACLE_R11)

# Round-12 promotion queue. The prefix-filtered exact path returns the
# SAME relation as dedup_ngram_jaccard (bit-equality pinned in tests),
# so it certifies against the same brute-force mirror — the oracle
# deliberately knows nothing about prefixes: losslessness is exactly
# the claim under test.
ORACLE_R12 = {
    "dedup_ngram_jaccard_prefix": _JACCARD_PAIRS_SQL,
}
# Round 12: promoted on schedule (library + bit-equality tests held
# through rounds 10-11; the window slot is this round's registry edit).
ORACLE.update(ORACLE_R12)

# Round-10 additions. dup_inflation is pure integer arithmetic over
# sha2 groups (the one double is an exact bigint/bigint division);
# the cluster profile reuses the recursive-CC mirror the closure
# queries are certified against, with the singleton row folded in so
# the histogram partitions the corpus.
ORACLE.update({
    "docs_dup_inflation": """
        WITH per AS (
            SELECT source, text,
                   len(regexp_split_to_array(trim(text), ' +')) AS nt,
                   count(*) AS n
            FROM documents GROUP BY 1, 2, 3
        )
        SELECT source,
               CAST(SUM(n) AS BIGINT) AS docs,
               CAST(COUNT(*) AS BIGINT) AS texts,
               CAST(SUM(n) - COUNT(*) AS BIGINT) AS dup_docs,
               CAST(SUM(n * nt) AS BIGINT) AS tokens_total,
               CAST(SUM(nt) AS BIGINT) AS tokens_unique,
               CAST(SUM(n * nt) - SUM(nt) AS BIGINT) AS dup_tokens,
               CAST(SUM(n * nt) AS DOUBLE) / SUM(nt) AS inflation
        FROM per GROUP BY source
    """,
    "dedup_cluster_size_profile": f"""
        WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
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
        per AS (
            SELECT cluster_rep, count(*) AS cluster_size
            FROM labels GROUP BY 1
        ),
        hist AS (
            SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
                   CAST(count(*) AS BIGINT) AS n_clusters
            FROM per GROUP BY 1
            UNION ALL
            SELECT 1,
                   (SELECT count(*) FROM documents)
                   - COALESCE((SELECT SUM(cluster_size) FROM per), 0)
        )
        SELECT cluster_size, n_clusters,
               CAST(cluster_size * n_clusters AS BIGINT) AS n_docs,
               CAST((cluster_size - 1) * n_clusters AS BIGINT) AS n_dup_docs
        FROM hist
    """,
})

# Round-9 promotion (queued + type-audited in round 8 per the round-7
# rule — every oracle passes tools/oracle_type_audit.py before landing).
ORACLE.update({
    "source_dup_matrix": """
        WITH per AS (
            SELECT text, source, count(*) AS n
            FROM documents GROUP BY text, source
        ),
        sizes AS (
            SELECT source, CAST(sum(n) AS BIGINT) AS docs,
                   CAST(count(*) AS BIGINT) AS texts
            FROM per GROUP BY source
        ),
        ovl AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(count(*) AS BIGINT) AS shared_texts,
                   CAST(sum(a.n * b.n) AS BIGINT) AS dup_pairs
            FROM per a JOIN per b
              ON a.text = b.text AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT ga.source AS source_a, gb.source AS source_b,
               ga.docs AS docs_a, gb.docs AS docs_b,
               CAST(COALESCE(o.shared_texts, 0) AS BIGINT) AS shared_texts,
               CAST(COALESCE(o.dup_pairs, 0) AS BIGINT) AS dup_pairs,
               CAST(COALESCE(o.shared_texts, 0) AS DOUBLE)
                   / (ga.texts + gb.texts - COALESCE(o.shared_texts, 0))
                   AS text_jaccard
        FROM sizes ga
        JOIN sizes gb ON ga.source < gb.source
        LEFT JOIN ovl o
          ON o.source_a = ga.source AND o.source_b = gb.source
    """,
})

# Round-13 promotion queue. The mirror reuses the recursive-CC labels
# the closure queries are certified against; losers (member != rep)
# feed per-source aggregates that meet in a |sources|-row left join,
# with COALESCE so clean sources report explicit zeros.
ORACLE_R13 = {
    "dedup_savings_by_source": f"""
        WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
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
        losers AS (SELECT doc_id FROM labels WHERE doc_id != cluster_rep),
        ls AS (
            SELECT source, count(*) AS n_redundant,
                   SUM(n_chars) AS chars_removed
            FROM documents
            WHERE doc_id IN (SELECT doc_id FROM losers)
            GROUP BY source
        ),
        base AS (
            SELECT source, count(*) AS n_docs, SUM(n_chars) AS chars_total
            FROM documents GROUP BY source
        )
        SELECT b.source,
               CAST(b.n_docs AS BIGINT) AS n_docs,
               CAST(b.chars_total AS BIGINT) AS chars_total,
               CAST(COALESCE(ls.n_redundant, 0) AS BIGINT) AS n_redundant,
               CAST(COALESCE(ls.chars_removed, 0) AS BIGINT) AS chars_removed,
               CAST(COALESCE(ls.chars_removed, 0) AS DOUBLE) / b.chars_total
                   AS savings_ratio
        FROM base b LEFT JOIN ls USING (source)
    """,
}
# Round 13: promoted on schedule (library + composed-diagnostics tests
# held through rounds 11-12; the window slot is this round's registry
# edit, per the COVERAGE.md deferral arithmetic).
ORACLE.update(ORACLE_R13)
QUERIES.update({
    "dedup_savings_by_source": _q(savings_by_source, "documents"),
})

# Round-14 promotion queue. Recursive-CC labels again; the majority
# language repeats the (count desc, lang asc) tie-break via the same
# ROW_NUMBER idiom, and the share is one exact bigint division.
ORACLE_R14 = {
    "dedup_cluster_lang_purity": f"""
        WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
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
        per_lang AS (
            SELECT l.cluster_rep, d.lang, count(*) AS lang_cnt
            FROM labels l JOIN documents d USING (doc_id)
            GROUP BY 1, 2
        ),
        top AS (
            SELECT cluster_rep, lang AS top_lang, lang_cnt AS top_lang_cnt,
                   ROW_NUMBER() OVER (
                       PARTITION BY cluster_rep
                       ORDER BY lang_cnt DESC, lang ASC
                   ) AS rn
            FROM per_lang
        ),
        sizes AS (
            SELECT cluster_rep,
                   SUM(lang_cnt) AS cluster_size,
                   COUNT(*) AS n_langs
            FROM per_lang GROUP BY 1
        )
        SELECT s.cluster_rep,
               CAST(s.cluster_size AS BIGINT) AS cluster_size,
               CAST(s.n_langs AS BIGINT) AS n_langs,
               t.top_lang,
               CAST(t.top_lang_cnt AS BIGINT) AS top_lang_cnt,
               CAST(t.top_lang_cnt AS DOUBLE) / s.cluster_size
                   AS top_lang_share,
               s.n_langs > 1 AS cross_lang
        FROM sizes s JOIN top t
          ON s.cluster_rep = t.cluster_rep AND t.rn = 1
    """,
}

# Round 14: promoted on schedule (library + composed-diagnostics tests
# held through rounds 12-13, rehearsed at sf0.01 both rounds; the
# window slot is this round's registry edit).
ORACLE.update(ORACLE_R14)
QUERIES.update({
    "dedup_cluster_lang_purity": _q(cluster_lang_purity, "documents"),
})


def minhash_calibration(
    documents: DataFrame,
    n: int = 3,
    num_hashes: int = hashing.DEFAULT_NUM_HASHES,
    bands: int = hashing.DEFAULT_BANDS,
) -> DataFrame:
    """MinHash estimator calibration: over the LSH candidate pairs,
    compare the SIGNATURE-estimated Jaccard (matching positions ÷
    num_hashes) against the exact shingle Jaccard, binned by exact
    decile. This is the report that justifies the signature length
    the whole dedup family runs on: E[est] = j with σ = √(j(1−j)/k),
    so k=64 puts ±0.06 around the 0.5 threshold — and this op shows
    the REALIZED error on your corpus instead of the formula
    (a skewed shingle distribution or a hash-quality problem shows up
    here first, as bias rather than spread).

    Output: one row per exact-Jaccard decile bin — n_pairs,
    mean_est (Σ matching positions ÷ (k·n), exact integer arithmetic
    until one division), mean_exact, mean_abs_err, max_abs_err.

    Engine-defined (the signature positions depend on this engine's
    xxhash64 seeds), so rows-only by design: the pytest pins assert
    the estimator contract itself — identical docs read est=1, the
    per-bin |est−exact| stays inside the binomial envelope, every est
    sits on the k-grid. Scale shape: identical to minhash_lsh_pairs
    (band equi-join candidates, collision-bounded; exact side
    re-shingles only the semi-join-reduced candidate docs).

    Queued for round 15 (rows-only registration,
    `dedup_minhash_calibration`)."""
    # Optimization r16 (guide §5 / measure-first): `sig` feeds THREE
    # consumers — the banding below and BOTH sides of est_pairs — and
    # was unmaterialized, so the full shingle+signature aggregation ran
    # three times. One eager checkpoint of the (doc, 64-long) relation
    # runs it once; banding becomes a cheap projection of it, so the
    # banded persist/unpersist dance is no longer needed either.
    sig = hashing.minhash_signatures_df(
        _shingle_rows(documents, n), "doc_id", F.col("shingle"), num_hashes
    ).localCheckpoint(eager=True)
    banded = sig.select(
        "doc_id",
        F.posexplode(
            hashing.band_hashes(F.col("sig"), bands, num_hashes)
        ).alias("band", "bh"),
    )
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .localCheckpoint(eager=True)  # two consumers (est + exact joins)
    )
    matches = F.aggregate(
        F.zip_with(
            F.col("sa.sig"),
            F.col("sb.sig"),
            lambda x, y: (x == y).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    est_pairs = (
        cand.join(sig.alias("sa"), cand.doc_a == F.col("sa.doc_id"))
        .join(sig.alias("sb"), cand.doc_b == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", matches.alias("n_match"))
    )
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b")))
        .distinct()
    )
    sh = _shingled(documents.join(cand_ids, "doc_id", "left_semi"), n)
    j = hashing.jaccard(F.col("ja.sh"), F.col("jb.sh"))
    pairs = (
        est_pairs.join(sh.alias("ja"), est_pairs.doc_a == F.col("ja.doc_id"))
        .join(sh.alias("jb"), est_pairs.doc_b == F.col("jb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_match",
            (F.col("n_match") / F.lit(num_hashes)).alias("est"),
            j.alias("jaccard"),
        )
    )
    return (
        pairs.withColumn(
            "j_bin",
            F.least(F.floor(F.col("jaccard") * 10), F.lit(9)).cast("int"),
        )
        .groupBy("j_bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            (
                F.sum("n_match").cast("double")
                / (F.count(F.lit(1)) * F.lit(num_hashes))
            ).alias("mean_est"),
            F.avg("jaccard").alias("mean_exact"),
            F.avg(F.abs(F.col("est") - F.col("jaccard"))).alias(
                "mean_abs_err"
            ),
            F.max(F.abs(F.col("est") - F.col("jaccard"))).alias(
                "max_abs_err"
            ),
        )
    )


# Round-15 rows-only registration queue (no oracle by design — the
# estimator is engine-defined; see minhash_calibration's docstring for
# the pytest pins that stand in for the hash check). The rotation
# planner reads this list so the r15 slot arithmetic sees the
# registration coming.
QUEUED_ROWS_ONLY_R15 = ["dedup_minhash_calibration"]


def pair_degree_spectrum(
    documents: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Near-dup GRAPH degree spectrum: for each degree d (how many
    qualified near-dup partners a document has), how many documents
    sit at that degree — degree 0 included, so the spectrum partitions
    the corpus. The sixth consumer of the shared LSH-pairs pass, and
    the structural complement to the cluster-size profile: equal-size
    clusters can be cliques (template families — every member degree
    k−1) or chains/stars (drifting revisions, one canonical doc
    reposted with variations — degree mass at 1 with a high-degree
    hub), and the remediation differs (drop the family vs keep the
    hub). The profile can't see that; the spectrum can.

    Scale shape: pairs → symmetrize → one map-side-combined count per
    doc → a keyed left join marks degree-0 docs on the corpus scan →
    one count over the degree column, output |distinct degrees| rows;
    `share` is one exact BIGINT/BIGINT division computed over that
    tiny relation. Accepts a precomputed `pairs` so composed
    diagnostics share one LSH pass.

    Queued for round 15 (`dedup_pair_degree_spectrum`, ORACLE_R15)."""
    from pyspark.sql import Window

    if pairs is None:
        pairs = minhash_lsh_pairs(documents, threshold=threshold)
    deg = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("doc_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    per_doc = documents.select("doc_id").join(deg, "doc_id", "left").select(
        F.coalesce(F.col("degree"), F.lit(0).cast("long")).alias("degree")
    )
    spec = per_doc.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return spec.select(
        "degree",
        "n_docs",
        (
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(Window.partitionBy())
        ).alias("share"),
    )


# Round-15 queue, second dedup member (the hash-checked one — the
# calibration op above is the rows-only one). The mirror symmetrizes
# the brute-force exact pairs, counts per-doc degree, and left-joins
# the corpus so degree-0 docs appear; integers exact, share a single
# division.
ORACLE_R15 = {
    "dedup_pair_degree_spectrum": f"""
        WITH pairs AS ({_JACCARD_PAIRS_SQL}),
        deg AS (
            SELECT doc_id, count(*) AS degree FROM (
                SELECT doc_a AS doc_id FROM pairs
                UNION ALL SELECT doc_b FROM pairs
            ) GROUP BY doc_id
        ),
        per_doc AS (
            SELECT COALESCE(g.degree, 0) AS degree
            FROM documents d LEFT JOIN deg g USING (doc_id)
        ),
        spec AS (
            SELECT degree, count(*) AS n_docs FROM per_doc GROUP BY degree
        )
        SELECT CAST(degree AS BIGINT) AS degree,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER ()
                                             AS DOUBLE) AS share
        FROM spec
    """,
}

# Round 14: the R15 pair promoted ONE ROUND EARLY (VERDICT r13 #3 —
# drain the queue): library + oracle/pytest pins held since round 13,
# rehearsed at sf0.01 in rounds 13 and 14. The calibration op is the
# declared rows-only registration (engine-defined estimator — its
# correctness pins are the pytest bias/spread envelopes); it still
# takes a window slot the round it registers.
ORACLE.update(ORACLE_R15)
QUERIES.update({
    "dedup_pair_degree_spectrum": _q(pair_degree_spectrum, "documents"),
    "dedup_minhash_calibration": _q(minhash_calibration, "documents"),
})


def pair_transitivity(
    documents: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Near-dup graph triangle census — edges, wedges (2-paths),
    triangles, and the global transitivity 3·T/W. The one-number
    answer to the question the degree spectrum only gestures at: are
    near-dup families CLIQUES (template/boilerplate families — every
    pair of a member's partners are also partners, transitivity → 1)
    or CHAINS/STARS (drifting revisions around a hub, transitivity →
    0)? Cliques are safe to collapse to one representative; chains
    are not (the endpoints may be genuinely different documents), so
    this statistic picks the dedup remediation for the whole corpus.

    Exactness: triangle counting uses the oriented a<b<c join (each
    triangle counted exactly once — no /6 correction, no double
    count); wedges are Σᵥ C(deg v, 2) with integer `div` (d·(d−1) is
    always even); transitivity is one double division, NULL on a
    wedge-free graph. All counts exact bigints.

    Scale shape: the pairs relation (shared LSH pass — accepts a
    precomputed `pairs` like the other composed diagnostics) is
    checkpointed once and reused; the wedge join keys on the CENTRAL
    vertex and the closing probe on (a, c) — both equi-joins; the
    compute size is the true wedge count Σ C(deg, 2), the standard
    graph-mining bound, bounded here because upstream near-dup
    generation is itself banded/verified (a near-dup hub's degree is
    a cluster size, not the corpus).

    Queued for round 17 (`dedup_pair_transitivity`, ORACLE_R17)."""
    if pairs is None:
        # the internal LSH path already emits canonical (doc_a <
        # doc_b) deduplicated pairs — no normalization pass needed
        pairs = minhash_lsh_pairs(documents, threshold=threshold)
        e = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    else:
        # ADVICE r13: a caller-provided edge list may be unoriented or
        # carry duplicate edges, which would silently inflate every
        # census number — canonicalize (least/greatest, self-loops
        # dropped) and dedup before counting. Costs one distinct
        # shuffle on the pair relation only when a custom input is
        # passed.
        e = (
            pairs.select(
                F.least("doc_a", "doc_b").alias("a"),
                F.greatest("doc_a", "doc_b").alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
    e = e.localCheckpoint(eager=True)
    wedge = e.join(
        e.select(F.col("a").alias("b2"), F.col("b").alias("c")),
        F.col("b") == F.col("b2"),
    ).select("a", "b", "c")
    tri = wedge.join(
        e.select(F.col("a").alias("ta"), F.col("b").alias("tc")),
        (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    wedges = deg.agg(
        F.coalesce(
            F.sum(F.expr("d * (d - 1) div 2")), F.lit(0)
        )
        .cast("long")
        .alias("n_wedges")
    )
    n_edges = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        # 1-row × 1-row × 1-row normalizers — never a data cartesian
        n_edges.crossJoin(F.broadcast(wedges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                (F.lit(3.0) * F.col("n_triangles").cast("double"))
                / F.col("n_wedges").cast("double"),
            ).alias("transitivity"),
        )
    )


# Round-17 queue. The mirror runs the SAME census over the brute-force
# exact pairs — as with the degree spectrum, the hash certifies the
# LSH pair pass is recall-lossless AND the oriented triangle join is
# correct; integer counts, one double division.
ORACLE_R17 = {
    "dedup_pair_transitivity": f"""
        WITH pairs AS ({_JACCARD_PAIRS_SQL}),
        e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
        tri AS (
            SELECT CAST(count(*) AS BIGINT) AS n_triangles
            FROM e e1
            JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        deg AS (
            SELECT v, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
            GROUP BY v
        ),
        w AS (
            SELECT CAST(COALESCE(SUM(d * (d - 1) // 2), 0) AS BIGINT)
                       AS n_wedges
            FROM deg
        ),
        ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
        SELECT ne.n_edges, w.n_wedges, tri.n_triangles,
               CASE WHEN w.n_wedges > 0
                    THEN (3.0 * CAST(tri.n_triangles AS DOUBLE))
                         / CAST(w.n_wedges AS DOUBLE)
               END AS transitivity
        FROM ne CROSS JOIN w CROSS JOIN tri
    """,
}

# Round 16: the R17 transitivity census lands at its scheduled bound
# (VERDICT r15 #2): library + fixture tests + audited oracle held
# since round 13, parity-rehearsed at sf0.01 every round since. Takes
# a window slot this round (staleness at birth).
ORACLE.update(ORACLE_R17)
QUERIES.update({
    "dedup_pair_transitivity": _q(pair_transitivity, "documents"),
})


# ---------------------------------------------------------------------------
# Composed dedup diagnostics — one shared LSH pass, five consumers
# ---------------------------------------------------------------------------

def dedup_diagnostics_composed(documents: DataFrame) -> DataFrame:
    """The DEPLOYMENT shape of the dedup diagnostics (VERDICT r14 #5):
    savings-by-source, threshold yield curve, cluster size profile,
    cluster lang purity, and pair degree spectrum computed over ONE
    shared MinHash-LSH pairs pass and ONE connected-components
    closure — the composition SCALE.md §4-r12/r13 keeps measuring at
    ~1 s marginal per consumer, now certified as its own registry
    entry instead of only existing implicitly in curation_demo. The
    standalone entries remain (each pays its own LSH pass by design,
    pricing the diagnostic in isolation); this entry certifies the
    sharing contract: identical rows to the five standalones, one
    corpus pass.

    Output is the melted long form so five different report grains
    hash-certify in one relation: (diagnostic, k, t, n1..n4, ratio) —
      savings   k=source            n1..n4 = n_docs, chars_total,
                                    n_redundant, chars_removed;
                                    ratio = savings_ratio
      yield     k=threshold×10      n1 = n_pairs, n2 = n_docs
      size      k=cluster_size      n1 = n_clusters, n2 = n_docs,
                                    n3 = n_dup_docs
      purity    k=cluster_rep       t = top_lang; n1..n4 =
                                    cluster_size, n_langs,
                                    top_lang_cnt, cross_lang(0/1);
                                    ratio = top_lang_share
      degree    k=degree            n1 = n_docs; ratio = share
    (threshold melts as the integer 10× key — '5'..'9' — because
    float-to-string formatting is not engine-portable; every other
    key is an integer or a dictionary string on both engines.)

    Scale shape: the pairs pass is generated ONCE at the loosest
    yield threshold (every tighter set is a subset), eagerly
    checkpointed, filtered once to the dedup threshold for the
    cluster closure; every consumer downstream touches only
    pair-/cluster-/dimension-grain relations. The union of five
    small reports adds no exchange of its own."""
    loose = min(min(YIELD_THRESHOLDS), JACCARD_THRESHOLD)
    pairs = minhash_lsh_pairs(documents, threshold=loose).localCheckpoint(
        eager=True
    )
    qualified = pairs.filter(F.col("jaccard") >= F.lit(JACCARD_THRESHOLD))
    clusters = near_dup_clusters(qualified).localCheckpoint(eager=True)

    nl = F.lit(None).cast("long")
    ns = F.lit(None).cast("string")
    nd = F.lit(None).cast("double")

    sav = savings_by_source(documents, clusters=clusters).select(
        F.lit("savings").alias("diagnostic"),
        F.col("source").alias("k"),
        ns.alias("t"),
        F.col("n_docs").alias("n1"),
        F.col("chars_total").alias("n2"),
        F.col("n_redundant").alias("n3"),
        F.col("chars_removed").alias("n4"),
        F.col("savings_ratio").alias("ratio"),
    )
    yc = threshold_yield_curve(documents, pairs=pairs).select(
        F.lit("yield").alias("diagnostic"),
        F.round(F.col("threshold") * 10).cast("int").cast("string").alias("k"),
        ns.alias("t"),
        F.col("n_pairs").alias("n1"),
        F.col("n_docs").alias("n2"),
        nl.alias("n3"),
        nl.alias("n4"),
        nd.alias("ratio"),
    )
    sp = cluster_size_profile(documents, clusters=clusters).select(
        F.lit("size").alias("diagnostic"),
        F.col("cluster_size").cast("string").alias("k"),
        ns.alias("t"),
        F.col("n_clusters").alias("n1"),
        F.col("n_docs").cast("long").alias("n2"),
        F.col("n_dup_docs").cast("long").alias("n3"),
        nl.alias("n4"),
        nd.alias("ratio"),
    )
    lp = cluster_lang_purity(documents, clusters=clusters).select(
        F.lit("purity").alias("diagnostic"),
        F.col("cluster_rep").cast("string").alias("k"),
        F.col("top_lang").alias("t"),
        F.col("cluster_size").alias("n1"),
        F.col("n_langs").alias("n2"),
        F.col("top_lang_cnt").alias("n3"),
        F.col("cross_lang").cast("long").alias("n4"),
        F.col("top_lang_share").alias("ratio"),
    )
    ds = pair_degree_spectrum(documents, pairs=qualified).select(
        F.lit("degree").alias("diagnostic"),
        F.col("degree").cast("string").alias("k"),
        ns.alias("t"),
        F.col("n_docs").alias("n1"),
        nl.alias("n2"),
        nl.alias("n3"),
        nl.alias("n4"),
        F.col("share").alias("ratio"),
    )
    return sav.unionByName(yc).unionByName(sp).unionByName(lp).unionByName(ds)


# Stage-mirror oracle (the corpus_end_to_end_curation pattern): each
# diagnostic's ALREADY-CERTIFIED standalone mirror is embedded as a
# CTE and melted with the identical projections. DuckDB recomputes the
# exact-Jaccard pairs per CTE — the oracle prices correctness, not
# sharing; the sharing claim is Spark-side (one checkpointed pass) and
# measured in SCALE.md.
ORACLE.update({
    "dedup_diagnostics_composed": f"""
        SELECT 'savings' AS diagnostic, source AS k,
               CAST(NULL AS VARCHAR) AS t,
               n_docs AS n1, chars_total AS n2, n_redundant AS n3,
               chars_removed AS n4, savings_ratio AS ratio
        FROM ({ORACLE["dedup_savings_by_source"]})
        UNION ALL
        SELECT 'yield', CAST(CAST(round(threshold * 10) AS INT)
                             AS VARCHAR),
               NULL, n_pairs, n_docs, NULL, NULL, CAST(NULL AS DOUBLE)
        FROM ({ORACLE["dedup_threshold_yield_curve"]})
        UNION ALL
        SELECT 'size', CAST(cluster_size AS VARCHAR), NULL,
               n_clusters, n_docs, n_dup_docs, NULL, CAST(NULL AS DOUBLE)
        FROM ({ORACLE["dedup_cluster_size_profile"]})
        UNION ALL
        SELECT 'purity', CAST(cluster_rep AS VARCHAR), top_lang,
               cluster_size, n_langs, top_lang_cnt,
               CAST(cross_lang AS BIGINT), top_lang_share
        FROM ({ORACLE["dedup_cluster_lang_purity"]})
        UNION ALL
        SELECT 'degree', CAST(degree AS VARCHAR), NULL,
               n_docs, NULL, NULL, NULL, share
        FROM ({ORACLE["dedup_pair_degree_spectrum"]})
    """,
})
QUERIES.update({
    "dedup_diagnostics_composed": _q(dedup_diagnostics_composed, "documents"),
})
