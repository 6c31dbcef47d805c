"""Sequence packing for LLM pretraining — the concat-and-chunk
layout: a shard's documents are tokenized, concatenated in a
deterministic order, and cut every ``context_len`` tokens; a document
therefore occupies the bin span [start div C, (start+len-1) div C]
and the packer's job is to report that span (and whether the doc
straddles a cut) without ever materializing the concatenation.

Scale shape: packing is inherently sequential WITHIN a stream, so the
stream is the unit of parallelism — documents group into bounded
shards (lang, doc_id div shard_docs) and the running-offset is one
window cumsum inside each shard: a single hash exchange on the shard
key, in-partition sort of ``shard_docs`` rows, no global sort, no
driver state. That is exactly how a 100-TB tokenize-and-pack job is
laid out (one output shard per task); the shard id is pure arithmetic
so the layout is reproducible across runs and engines.

All values are int64 (token counts, truncating division), so the
assignment is bit-identical at any parallelism and mirrors 1:1 into
the DuckDB oracle's window SQL.

Reference parity anchor: the reference's tiling of a region into
fixed-size pieces (`/root/reference/geokit/core/geom.py` tileize)
is the same cut-a-stream-into-constant-chunks contract, transposed
from geometry to token streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.text import token_count


def pack_sequences(
    docs: DataFrame,
    context_len: int = 512,
    shard_docs: int = 256,
) -> DataFrame:
    """Per-document packing assignment: (doc_id, lang, shard,
    n_tokens, start_off, bin_first, bin_last, crosses). ``start_off``
    is the token offset of the doc inside its shard's concatenated
    stream; bins are ``context_len`` tokens wide; ``crosses`` marks
    documents straddling a bin boundary (the ones a loss-masking
    loader must handle). The shared whitespace tokenizer counts empty
    text as one (empty) token, so every document advances the stream
    by >= 1; the greatest(n, 1) guard keeps bin_last well-defined if
    a caller ever substitutes a tokenizer that can emit 0."""
    n_tok = token_count(F.col("text")).cast("long")
    return pack_counts(
        docs.select("doc_id", "lang", n_tok.alias("n_tokens")),
        context_len=context_len,
        shard_docs=shard_docs,
    )


def pack_counts(
    counts: DataFrame,
    context_len: int = 512,
    shard_docs: int = 256,
) -> DataFrame:
    """pack_sequences over a PRE-TOKENIZED frame (doc_id, lang,
    n_tokens) — the tokenizer is a parameter, not a baked-in choice:
    the whitespace proxy and the committed-BPE counts
    (functions/bpe.bpe_token_stats) both feed the identical packing
    arithmetic. Same plan: one shard-key exchange, in-partition
    window cumsum."""
    c = int(context_len)
    shard = F.expr(f"doc_id div {int(shard_docs)}")
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    out = (
        counts.select(
            "doc_id",
            "lang",
            shard.alias("shard"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
        )
        .withColumn("start_off", start)
        .withColumn("bin_first", F.expr(f"start_off div {c}"))
        .withColumn(
            "bin_last",
            F.expr(
                f"(start_off + greatest(n_tokens, 1L) - 1L) div {c}"
            ),
        )
        .withColumn("crosses", F.col("bin_first") != F.col("bin_last"))
    )
    return out


def packing_stats(packed: DataFrame) -> DataFrame:
    """Per-lang packing audit: doc/shard counts, total tokens,
    boundary-crossing docs, and an order-independent checksum over
    the full (doc_id, bin_first, bin_last) assignment — any drift in
    the shard arithmetic, the cumsum, or the bin division shifts
    it."""
    chk = (
        F.col("doc_id") * 31 + F.col("bin_first") * 7 + F.col("bin_last")
    ) % 999983
    return packed.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("shard").alias("n_shards"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.col("crosses").cast("long")).alias("n_crossing"),
        F.sum(chk).cast("long").alias("checksum"),
    )


SHUF_PRIME = 999_983
SHUF_A = 2_654_435_761
SHUF_B = 40_503
SHUF_C = 12_345
SHUF_MOD = 2_147_483_647


def shuffle_key(doc_id_col: str = "doc_id") -> "F.Column":
    """Deterministic pseudorandom sort key in [0, 2^31 - 1): a bounded
    LCG mix of the doc_id's low and high parts (the repo-wide
    overflow-safe hash family — Spark 4 ANSI mode and DuckDB both
    fault on int64 wraparound, so no splitmix-style full-width
    multiplies). Collisions are broken by doc_id downstream, so the
    induced permutation is total and engine-independent."""
    return F.expr(
        f"(({doc_id_col} % {SHUF_PRIME}) * {SHUF_A}"
        f" + ({doc_id_col} div {SHUF_PRIME}) * {SHUF_B}"
        f" + {SHUF_C}) % {SHUF_MOD}"
    )


def corpus_shuffle(docs: DataFrame, n_shards: int = 64) -> DataFrame:
    """The pretraining corpus shuffle: place every document at a
    deterministic pseudorandom position of a deterministic shard —
    (doc_id) -> (shard, pos) with shard = key % n_shards and pos the
    rank of (key, doc_id) within the shard. Reproducible across
    retries, engines, and parallelism (the property a resumable
    100-TB shuffle job needs — rand() is none of these).

    100-TB shape: one hash exchange on shard + an in-partition sort;
    shard count is chosen so a shard fits one task (n/n_shards docs),
    so there is never a global sort. Exactly the physical layout of
    writing shuffled training shards."""
    from pyspark.sql import Window

    key = shuffle_key("doc_id").alias("skey")
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return (
        docs.select("doc_id", key)
        .withColumn("shard", (F.col("skey") % F.lit(int(n_shards))).cast("long"))
        .withColumn("pos", F.row_number().over(w).cast("long") - 1)
        .select("doc_id", "shard", "pos")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Overlapping-window document chunking (the RAG / long-context
    preprocessing layout): token windows of ``chunk_tokens`` starting
    every ``chunk_tokens - overlap`` tokens; the final window may be
    short; docs shorter than one window emit exactly one chunk.
    Output per chunk: (doc_id, chunk_id, start_tok, n_tok,
    chunk_md5) — the md5 pins the exact text split.

    100-TB shape: fully narrow — per-row chunk-count arithmetic, an
    in-row transform over the token array, and one explode; zero
    shuffles, zero UDFs, pipelined with the scan."""
    c = int(chunk_tokens)
    if not 0 <= int(overlap) < c:
        # a negative overlap would stride PAST the window width and
        # silently leave coverage gaps between chunks
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_tokens")
    s = c - int(overlap)
    toks = "split(text, ' ')"
    n = f"size({toks})"
    n_chunks = f"if({n} <= {c}, 1, ({n} - {c} + {s} - 1) div {s} + 1)"
    chunk = (
        f"transform(sequence(0, {n_chunks} - 1), i -> struct("
        f" i AS chunk_id,"
        f" i * {s} AS start_tok,"
        f" least({c}, {n} - i * {s}) AS n_tok,"
        f" md5(concat_ws(' ', slice({toks}, i * {s} + 1, {c})))"
        f"  AS chunk_md5))"
    )
    return docs.select(
        "doc_id", F.explode(F.expr(chunk)).alias("ch")
    ).select(
        "doc_id",
        F.col("ch.chunk_id").cast("long").alias("chunk_id"),
        F.col("ch.start_tok").cast("long").alias("start_tok"),
        F.col("ch.n_tok").cast("long").alias("n_tok"),
        F.col("ch.chunk_md5").alias("chunk_md5"),
    )
