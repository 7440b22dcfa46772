"""BPE training on the classic hand-computable corpus + encode
properties (losslessness, compression, merge determinism)."""

from __future__ import annotations

from edu_online_spark.operators.bpe import (
    END_OF_WORD,
    bpe_encode,
    train_bpe_merges,
    word_frequencies,
)


def _corpus(spark):
    # the standard BPE teaching corpus: hug×10, pug×5, pun×12, bun×4,
    # hugs×5 (word frequencies realized by repetition inside documents)
    rows = [
        (0, " ".join(["hug"] * 10)),
        (1, " ".join(["pug"] * 5)),
        (2, " ".join(["pun"] * 12)),
        (3, " ".join(["bun"] * 4)),
        (4, " ".join(["hugs"] * 5)),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bpe_learns_the_textbook_merges(spark):
    """Hand-derived merge sequence on the hug/pug/pun corpus:
    ('u','g') at 20 (hug 10 + pug 5 + hugs 5); then a 16-16 tie
    between ('n','</w>') (pun 12 + bun 4) and ('u','n') resolved
    lexicographically ('n' < 'u'); ('u','n</w>') follows at 16, and
    ('h','ug') at 15 (hug 10 + hugs 5)."""
    merges = train_bpe_merges(_corpus(spark), n_merges=4)
    assert merges == [
        ("u", "g"),
        ("n", END_OF_WORD),
        ("u", "n" + END_OF_WORD),
        ("h", "ug"),
    ]


def test_bpe_merges_are_deterministic(spark):
    docs = _corpus(spark)
    assert train_bpe_merges(docs, 6) == train_bpe_merges(docs, 6)


def test_bpe_batched_loop_is_sequence_exact(spark, sf_dir):
    """The batched driver loop (batch_k merges per round-trip) must
    produce the IDENTICAL merge sequence as one-at-a-time training —
    on the tie-heavy textbook corpus and on real documents."""
    docs = _corpus(spark)
    assert train_bpe_merges(docs, 6, batch_k=8) == train_bpe_merges(
        docs, 6, batch_k=1
    )
    real = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert train_bpe_merges(real, 12, batch_k=8) == train_bpe_merges(
        real, 12, batch_k=1
    )


def test_bpe_encode_is_lossless_and_compresses(spark):
    """Tokens must reconstruct each word exactly (strip the end marker,
    concatenate) and frequent words must compress below char count."""
    docs = _corpus(spark)
    merges = train_bpe_merges(docs, 8)
    out = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, row in out.items():
        rebuilt = (
            "".join(row["tokens"])
            .replace(END_OF_WORD, " ")
            .strip()
        )
        assert rebuilt == texts[doc_id]
        assert row["n_words"] == len(texts[doc_id].split(" "))
    # 'hug' appears 10 times as a word type: with ug (and likely hug)
    # merged, its token count must be under the 4-symbol char baseline
    hug_tokens = out[0]["n_tokens"] / out[0]["n_words"]
    assert hug_tokens < 4, hug_tokens


def test_bpe_word_frequencies_shape(spark):
    wf = {r["word"]: r["freq"] for r in word_frequencies(_corpus(spark)).collect()}
    assert wf == {"hug": 10, "pug": 5, "pun": 12, "bun": 4, "hugs": 5}
