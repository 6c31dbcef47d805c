"""functions.bpe — committed-merge-table BPE tokenizer."""

import pytest

from geokit_spark.functions import bpe


def test_bpe_word_known_segmentations():
    # whole corpus words compress to single tokens via the chain of
    # committed merges (e|r first at rank 0, then f|i, fi|l, ...)
    for w in ("filter", "hash", "join", "batch", "scan", "column",
              "customer", "small"):
        assert bpe.bpe_word(w) == [bpe._VOCAB_ID[w]], w
    # partial compounds decompose deterministically
    assert bpe.bpe_word("er") == [bpe._VOCAB_ID["er"]]
    assert bpe.bpe_word("a") == [bpe._VOCAB_ID["a"]]
    assert bpe.bpe_word("") == []


def test_bpe_word_leftmost_lowest_rank():
    # 'erer': (e,r) is rank 0 at positions 1 and 3 -> leftmost merges
    # first, then the second; no (er,er) merge exists
    assert bpe.bpe_word("erer") == [bpe._VOCAB_ID["er"]] * 2
    # unknown characters (not in the committed base vocab) map to -1
    out = bpe.bpe_word("xy")
    assert out == [-1, bpe._VOCAB_ID["y"]]


def test_bpe_vocab_ids_stable():
    # ids are indices: base chars first (sorted), merges in order —
    # the committed contract both engines index into
    assert bpe.BPE_VOCAB[0] == "a"
    n_base = len(bpe.BPE_VOCAB) - len(bpe.BPE_MERGES)
    for i, (l, r) in enumerate(bpe.BPE_MERGES):
        assert bpe.BPE_VOCAB[n_base + i] == l + r


def test_bpe_token_stats_checksum_and_passthrough(spark):
    rows = [
        (1, "er a", "en"),
        (2, "", "de"),
        (3, None, "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r.doc_id: r
        for r in bpe.bpe_token_stats(df, passthrough=("lang",)).collect()
    }
    er, a = bpe._VOCAB_ID["er"], bpe._VOCAB_ID["a"]
    assert out[1].n_words == 2 and out[1].n_tokens == 2
    assert out[1].ids_checksum == 1 * er + 2 * a
    assert out[1].lang == "en"
    # '' splits to [''] (one empty word, zero tokens) per convention
    assert out[2].n_words == 1 and out[2].n_tokens == 0
    assert out[2].ids_checksum == 0
    assert out[3].n_words == 0 and out[3].n_tokens == 0


def test_pack_counts_equals_pack_sequences_on_whitespace(spark):
    """pack_sequences must be exactly pack_counts over the whitespace
    token counts (the refactor is behavior-preserving)."""
    from pyspark.sql import functions as F

    from geokit_spark.functions.text import token_count
    from geokit_spark.operators.packing import pack_counts, pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i % 7 + 1)), "en" if i % 2 else "de")
         for i in range(40)],
        "doc_id long, text string, lang string",
    )
    a = pack_sequences(docs, context_len=8, shard_docs=4).collect()
    b = pack_counts(
        docs.select(
            "doc_id", "lang", token_count(F.col("text")).alias("n_tokens")
        ),
        context_len=8,
        shard_docs=4,
    ).collect()
    key = lambda r: (r.doc_id,)  # noqa: E731
    assert sorted(map(tuple, a), key=lambda t: t[0]) == sorted(
        map(tuple, b), key=lambda t: t[0]
    )
