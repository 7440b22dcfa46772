"""Similarity-hashing primitives: MinHash signatures, SimHash, banding.

All pure Column expressions over token/shingle arrays. xxhash64 is
Spark's built-in 64-bit hash (JVM, codegen); seeding it with a literal
per hash function gives the independent hash family MinHash needs.

Scale notes (100 TB): a signature is k longs per doc computed in the
scan stage — no shuffle. LSH banding then shuffles only (band_id,
band_hash) pairs, so the join that finds candidates is an equi-join on
a small key, never a cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 64
DEFAULT_BANDS = 16  # 16 bands x 4 rows: catches jaccard >~ 0.5 w.h.p.


def minhash_signature(shingle_col: Column, num_hashes: int = DEFAULT_NUM_HASHES) -> Column:
    """array<string> shingles → array<long> of length num_hashes.

    min over xxhash64(seed_i, shingle). Empty shingle sets get a
    sentinel signature of Long.MaxValue (never matches a real one in a
    band join because band hashes still differ per band seed... they
    don't — so callers must filter size(shingles)>0 first; we also
    guard here with nulls).
    """
    def hash_fn(seed: int):
        # NB: the lambda must be unary — PySpark passes (element, index)
        # to binary lambdas, which would shadow the seed.
        return lambda s: F.xxhash64(F.lit(seed), s)

    sig = F.array(
        *[
            F.array_min(F.transform(shingle_col, hash_fn(i)))
            for i in range(num_hashes)
        ]
    )
    return F.when(F.size(shingle_col) > 0, sig)


def band_hashes(sig_col: Column, bands: int = DEFAULT_BANDS,
                num_hashes: int = DEFAULT_NUM_HASHES) -> Column:
    """Signature → array of (band hash) longs, one per band.

    Docs sharing ANY band hash become LSH candidates. Band hash =
    xxhash64 over the band's rows plus the band index."""
    rows = num_hashes // bands
    return F.array(
        *[
            F.xxhash64(
                F.lit(b), *[sig_col[b * rows + r] for r in range(rows)]
            )
            for b in range(bands)
        ]
    )


# Bit masks for the 64 simhash positions as signed-long literals
# (bit 63 is the two's-complement sign bit).
_BIT_MASKS = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]


def simhash64(token_col: Column) -> Column:
    """64-bit SimHash over a token array.

    For each bit b: sum +1/-1 votes of xxhash64(token) bit b over all
    tokens; bit set iff the vote is positive. Pure nested higher-order
    functions — one fused JVM loop per row, no UDF.
    """
    masks = F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS])
    bit_votes = F.transform(
        masks,
        lambda m: F.aggregate(
            token_col,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.xxhash64(t).bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            bit_votes,
            masks,
            lambda vote, m: F.when(vote > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseOR(v),
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter.cast("double") / union
