"""Text-pipeline edge cases the sf corpora don't cover: chunk
boundaries and contamination determinism."""

from __future__ import annotations

from edu_online_spark.operators.textops import CHUNK_STRIDE, CHUNK_TOKENS, chunk_documents


def _chunks(spark, text, chunk_tokens=CHUNK_TOKENS, stride=CHUNK_STRIDE):
    df = spark.createDataFrame([(1, text, "src1")], ["doc_id", "text", "source"])
    rows = sorted(
        chunk_documents(df, chunk_tokens, stride).collect(),
        key=lambda r: r["chunk_idx"],
    )
    return [(r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"]) for r in rows]


def test_chunking_short_doc_single_chunk(spark):
    assert _chunks(spark, "just five little words here") == [
        (0, 5, "just five little words here")
    ]


def test_chunking_exact_boundary_no_empty_tail(spark):
    """A doc of exactly chunk_tokens words must yield ONE chunk — a
    start offset at n_tokens would be an empty chunk."""
    text = " ".join(f"w{i}" for i in range(CHUNK_TOKENS))
    out = _chunks(spark, text)
    assert len(out) == 1 and out[0][1] == CHUNK_TOKENS


def test_chunking_overlap_and_coverage(spark):
    """chunk_tokens+1 words → two chunks; the second starts at the
    stride and covers the tail; every token appears in some chunk."""
    n = CHUNK_TOKENS + 1
    words = [f"w{i}" for i in range(n)]
    out = _chunks(spark, " ".join(words))
    assert [c[0] for c in out] == [0, 1]
    assert out[0][1] == CHUNK_TOKENS
    assert out[1][1] == n - CHUNK_STRIDE  # tail chunk, shorter
    covered = set()
    for _, _, text in out:
        covered.update(text.split(" "))
    assert covered == set(words)


def test_chunking_single_token(spark):
    assert _chunks(spark, "solo") == [(0, 1, "solo")]
