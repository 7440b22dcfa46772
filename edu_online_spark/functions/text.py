"""Text-analysis column functions (extension surface, all JVM-side).

Tokenization, shingling, quality metrics, language-ID scoring, and a
rolling-hash fingerprint — every one a Column expression (codegen), no
Python UDFs. At 100 TB these run inside the scan stage, fully fused.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the n-gram/lexicon heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "los", "que", "de"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("的", "是", "了", "在", "我"),
}

STOPWORDS_EN = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
)

# BPE-ish token pattern: letter runs, digit runs, or single symbols.
# Kept RE2-compatible so the DuckDB oracle evaluates the identical regex.
BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; collapses runs, trims edges."""
    return F.split(F.trim(_c(col)), " +")


def shingle_rows(df, id_col: str, text_col: str = "text", n: int = 3):
    """(id, shingle)-row form of word n-gram shingling: posexplode +
    lead() window — every expression whole-stage-codegen'd, no
    higher-order functions. Prefer this over shingles() for anything
    corpus-sized: HOFs don't codegen, and after a join Catalyst can
    inline the tokenizing split() into the lambda, making it
    O(tokens²) per doc. One shuffle on the id column."""
    from pyspark.sql import Window

    tok = df.select(id_col, F.posexplode(tokens(text_col)).alias("pos", "t"))
    w = Window.partitionBy(id_col).orderBy("pos")
    grams = [F.col("t")] + [F.lead("t", i).over(w) for i in range(1, n)]
    return (
        tok.select(
            id_col,
            F.concat_ws(" ", *grams).alias("shingle"),
            grams[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .drop("_last")
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles. Documents shorter than n words
    yield an empty set (guard keeps `sequence` bounds valid)."""
    t = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.array_join(F.slice(t, i, n), " "),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(t) >= n, F.array_distinct(grams)).otherwise(empty)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish tokens via regexp_count (JVM regex engine)."""
    return F.regexp_count(_c(col), F.lit(BPE_TOKEN_PATTERN))


def punct_count(col: Column | str) -> Column:
    return F.regexp_count(_c(col), F.lit("[.,!?;:]"))


def marker_hits(col_name: str, markers: tuple[str, ...]) -> Column:
    """How many tokens are in the marker lexicon. IN-list inside a
    higher-order lambda stays entirely in codegen."""
    return F.expr(
        f"size(filter(split(trim({col_name}), ' +'), w -> w IN ({_in_list(markers)})))"
    )


def _in_list(words: tuple[str, ...]) -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in words)


def lang_scores(col_name: str) -> dict[str, Column]:
    """Marker-hit count per candidate language."""
    return {lang: marker_hits(col_name, m) for lang, m in LANG_MARKERS.items()}


def predict_lang(col_name: str) -> Column:
    """Argmax language by marker hits; deterministic tie-break on language
    code order; 'und' when no markers hit at all."""
    scores = lang_scores(col_name)
    ordered = sorted(scores)  # fixed lexicographic tie-break
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # Iterate descending so earlier (lexicographically smaller) language
    # wins ties with strict '>' on the final fold.
    for lang in reversed(ordered):
        s = scores[lang]
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def fingerprint_fast(col: Column | str) -> Column:
    """Default content fingerprint: xxhash64 — a single codegen'd JVM
    expression that runs inside the scan stage. This is the 100 TB
    form; the polynomial fold below is an interpreted per-character
    higher-order function (~100× slower on long documents) kept only
    for cross-engine oracle parity."""
    return F.xxhash64(_c(col))


def fingerprint(col: Column | str) -> Column:
    """Polynomial rolling hash over characters, mod 1e9+7 — the
    ORACLE-PARITY variant (use fingerprint_fast as the default).

    Sequential fold (acc*31 + ascii(char)) % p — identical order and
    arithmetic to the DuckDB oracle's list_reduce, so values match
    bit-for-bit. Empty-string guard: fingerprint('') = 0. Being an
    F.aggregate HOF it does NOT codegen; on long documents it is the
    scan-stage bottleneck, which is why it is not the default.
    """
    chars = F.filter(F.split(_c(col), ""), lambda ch: ch != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FINGERPRINT_BASE + F.ascii(ch)) % FINGERPRINT_MOD,
    )
