"""Deduplication operators for the training-data pipeline.

All hot paths are built-in array/lambda functions (JVM) — shingling,
minhash, simhash and Jaccard run without Python. The LSH band join is
a plain equijoin on band keys, so at 100 TB it shuffles only
(doc_id, band_key) pairs and AQE splits skewed buckets.

* exact        — group by content hash, canonical = min doc_id
* ngram-jaccard— 3-char shingle sets, candidate pairs bounded by
                 (lang, length band), exact Jaccard refine
* minhash LSH  — NUM_HASHES permutation-free minhash over shingle
                 codes, banded into NUM_BANDS buckets, bucket equijoin
                 -> candidates -> exact Jaccard verify
* simhash      — SIM_BITS-bit sign-of-sum sketch over shingle codes,
                 hamming distance on candidate pairs
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# minhash parameters (shared with the SQL oracle)
NUM_HASHES = 16
NUM_BANDS = 4
ROWS_PER_BAND = NUM_HASHES // NUM_BANDS
MH_PRIME = 2147483647  # 2^31 - 1
# deterministic odd multipliers / offsets (LCG-derived, fixed)
MH_A = [2 * ((1103515245 * (i + 1) + 12345) % 1048576) + 1 for i in range(NUM_HASHES)]
MH_B = [(69069 * (i + 1) + 1) % MH_PRIME for i in range(NUM_HASHES)]

SIM_BITS = 16
SHINGLE_K = 3

LEN_BAND = 30  # candidate pairs must be within this n_chars distance


def shingle_codes_expr(text_col: str) -> F.Column:
    """Distinct 3-char shingle integer codes:
    code = ascii(c0)*65536 + ascii(c1)*256 + ascii(c2).
    Pure built-ins (JVM); identical closed form in the SQL oracle."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({text_col}) - 2, 1)),"
        f" i -> ascii(substring({text_col}, i, 1)) * 65536"
        f" + ascii(substring({text_col}, i + 1, 1)) * 256"
        f" + ascii(substring({text_col}, i + 2, 1))))"
    )


def minhash_signatures_fast(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sig array<long>): same NUM_HASHES minhash values as the
    JVM lambda form, computed in one Arrow-vectorized pandas UDF —
    whole batch flattened to a codepoint array, shingle codes by
    stride arithmetic, per-doc mins via np.minimum.reduceat. ~50x the
    throughput of per-element JVM lambdas on long docs (distinctness
    is irrelevant under min, so no per-doc unique pass)."""
    # docs per inner chunk: sized so the shingle-code slice (int32) +
    # hash buffer (int64) stay L2-RESIDENT per worker across the 16
    # hash passes — the passes then re-read from cache instead of DRAM,
    # which is what lets 32 concurrent workers scale on shared memory
    # bandwidth (measured: L3-sized chunks cap the 8->32 speedup).
    CHUNK = int(os.environ.get("GEOKIT_MH_CHUNK", "512"))

    def _chunk(texts: list[str]) -> np.ndarray:
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        # THREE NUL pads per doc emulate ascii(substring-beyond-end) = 0
        # for sub-3-char docs, matching the JVM expression exactly. Two
        # pads are not enough: an empty doc still emits one shingle
        # (n_sh = max(len-2, 1) = 1) whose 3-byte window must read
        # (0,0,0) -> code 0; with 2 pads it read the NEXT doc's first
        # byte, and past the buffer end for an empty doc at chunk end.
        flat = "".join(t + "\x00\x00\x00" for t in texts)
        cp = np.frombuffer(flat.encode("utf-32-le"), dtype=np.uint32).astype(
            np.int64
        )
        seg_lens = lens + 3
        starts = np.concatenate([[0], np.cumsum(seg_lens)[:-1]])
        codes = cp[:-2] * 65536 + cp[1:-1] * 256 + cp[2:]
        n_sh = np.maximum(lens - 2, 1)
        sh_starts = np.concatenate([[0], np.cumsum(n_sh)[:-1]])
        idx = np.repeat(starts, n_sh) + (
            np.arange(int(n_sh.sum())) - np.repeat(sh_starts, n_sh)
        )
        seg = codes[idx]
        # one pass per hash function: sequential 1-D ops stay in cache
        # (a single (NUM_HASHES, n) broadcast thrashes the allocator)
        mins = np.empty((NUM_HASHES, len(lens)), dtype=np.int64)
        for i in range(NUM_HASHES):
            h = (MH_A[i] * seg + MH_B[i]) % MH_PRIME
            mins[i] = np.minimum.reduceat(h, sh_starts)
        return mins.T

    def _chunk_bytes(data: np.ndarray, offs: np.ndarray) -> np.ndarray:
        """Same signatures straight from the Arrow UTF-8 buffer
        (ASCII-only batches: utf-8 byte == codepoint). One vectorized
        scatter builds the NUL-padded byte stream. Shingle codes MUST
        be int64: A*code reaches ~2^44 and numpy's NEP-50 loop
        selection multiplies int32 inputs in int32 even with an int64
        out= buffer (silent wraparound — caught by review, the int32
        'optimization' produced signatures diverging from the JVM
        formula on all-ASCII batches)."""
        lens = (offs[1:] - offs[:-1]).astype(np.int64)
        nd = len(lens)
        total = int(lens.sum())
        # three NUL pads per doc — see _chunk for why two is a bug
        padded = np.zeros(total + 3 * nd, dtype=np.uint8)
        tgt = np.arange(total, dtype=np.int64) + 3 * np.repeat(
            np.arange(nd, dtype=np.int64), lens
        )
        padded[tgt] = data[offs[0] : offs[-1]]
        b = padded.astype(np.int64)
        codes = b[:-2] * 65536 + b[1:-1] * 256 + b[2:]
        seg_lens = lens + 3
        starts = np.concatenate([[0], np.cumsum(seg_lens)[:-1]])
        n_sh = np.maximum(lens - 2, 1)
        sh_starts = np.concatenate([[0], np.cumsum(n_sh)[:-1]])
        idx = np.repeat(starts, n_sh) + (
            np.arange(int(n_sh.sum())) - np.repeat(sh_starts, n_sh)
        )
        seg = codes[idx]
        h = np.empty(len(seg), dtype=np.int64)
        mins = np.empty((NUM_HASHES, nd), dtype=np.int64)
        for i in range(NUM_HASHES):
            np.multiply(seg, MH_A[i], out=h)
            h += MH_B[i]
            np.remainder(h, MH_PRIME, out=h)
            mins[i] = np.minimum.reduceat(h, sh_starts)
        return mins.T

    def fn(batches):
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            tarr = batch.column(1)
            doc_id = batch.column(0)
            if tarr.null_count == 0:
                off_buf, data_buf = tarr.buffers()[1], tarr.buffers()[2]
                offs = np.frombuffer(off_buf, np.int32)[
                    tarr.offset : tarr.offset + n + 1
                ].astype(np.int64)
                data = np.frombuffer(data_buf, np.uint8)
                ascii_ok = (
                    offs[-1] == offs[0]
                    or int(data[offs[0] : offs[-1]].max()) < 128
                )
            else:
                ascii_ok = False
            if ascii_ok:
                outs = [
                    _chunk_bytes(data, offs[i : i + CHUNK + 1])
                    for i in range(0, n, CHUNK)
                ]
            else:  # non-ASCII / nulls: codepoint-exact python path
                lst = tarr.to_pylist()
                outs = [
                    _chunk([x or "" for x in lst[i : i + CHUNK]])
                    for i in range(0, n, CHUNK)
                ]
            mins = np.concatenate(outs, axis=0)
            sig = pa.ListArray.from_arrays(
                pa.array(
                    np.arange(0, NUM_HASHES * (n + 1), NUM_HASHES,
                              dtype=np.int32)
                ),
                pa.array(mins.ravel()),
            )
            yield pa.RecordBatch.from_arrays(
                [doc_id, sig], ["doc_id", "sig"]
            )

    return docs.select("doc_id", F.col(text_col)).mapInArrow(
        fn, schema="doc_id long, sig array<long>"
    )


def dedup_exact(docs: DataFrame) -> DataFrame:
    """(text_md5, n_docs, canonical_doc_id) per distinct content."""
    return (
        docs.select("doc_id", F.md5("text").alias("text_md5"))
        .groupBy("text_md5")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def _with_shingles(docs: DataFrame) -> DataFrame:
    return docs.withColumn("sh", shingle_codes_expr("text"))


def candidate_pairs(docs: DataFrame) -> DataFrame:
    """Blocked candidate pairs: same lang, n_chars within LEN_BAND.

    Physical shape: a pure EQUIJOIN on (lang, length-bucket). The left
    side explodes each doc to its bucket floor(n_chars/LEN_BAND) and
    the two neighbor buckets; the right side keeps its single bucket.
    Any pair within LEN_BAND differs by at most one bucket, so it is
    matched exactly once (the right doc's bucket is a single value and
    the exploded values are distinct) — no O(n²/|langs|) theta join,
    no post-join dedup. The exact |len_a-len_b| <= LEN_BAND and
    id_a < id_b predicates filter after the equijoin."""
    bucket = F.floor(F.col("n_chars") / F.lit(LEN_BAND))
    a = docs.select(
        F.col("doc_id").alias("id_a"),
        F.col("lang").alias("lang"),
        F.col("n_chars").alias("len_a"),
        F.explode(
            F.array(bucket - F.lit(1), bucket, bucket + F.lit(1))
        ).alias("bkt"),
    )
    b = docs.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang"),
        F.col("n_chars").alias("len_b"),
        bucket.alias("bkt"),
    )
    return (
        a.join(b, ["lang", "bkt"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= F.lit(LEN_BAND))
        )
        .select("id_a", "id_b")
    )


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.7) -> DataFrame:
    """(id_a, id_b, jac) for candidate pairs with Jaccard >= threshold
    over distinct 3-char shingles. jac = |A∩B| / |A∪B| in exact
    integer-count arithmetic."""
    sh = _with_shingles(docs).select("doc_id", "sh")
    pairs = candidate_pairs(docs)
    j = (
        pairs.join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        j.withColumn("jac", inter / union)
        .filter(F.col("jac") >= F.lit(threshold))
        .select("id_a", "id_b", "jac")
    )


def minhash_signature_cols(sh_col: str = "sh") -> list[F.Column]:
    """NUM_HASHES minhash values: min over shingles of (a*code + b) % P."""
    return [
        F.expr(
            f"array_min(transform({sh_col}, "
            f"c -> ({MH_A[i]} * CAST(c AS BIGINT) + {MH_B[i]}) % {MH_PRIME}))"
        ).alias(f"mh_{i}")
        for i in range(NUM_HASHES)
    ]


def minhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band, band_key): band_key concatenates the band's
    minhash values — the LSH bucket id. Signatures come from the
    Arrow-vectorized fast path (bit-identical to the JVM lambda form,
    see minhash_signatures_fast)."""
    sig = minhash_signatures_fast(docs)
    bands = []
    for b in range(NUM_BANDS):
        cols = [
            F.element_at("sig", b * ROWS_PER_BAND + r + 1)
            for r in range(ROWS_PER_BAND)
        ]
        key = F.concat_ws("_", *[c.cast("string") for c in cols])
        bands.append(
            sig.select("doc_id", F.lit(b).alias("band"), key.alias("band_key"))
        )
    out = bands[0]
    for df in bands[1:]:
        out = out.unionByName(df)
    return out


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """LSH candidate pairs (share >= 1 band bucket) verified by exact
    shingle Jaccard >= threshold. Returns (id_a, id_b, jac)."""
    bands = minhash_bands(docs)
    a = bands.select(
        F.col("doc_id").alias("id_a"), "band", "band_key"
    )
    b = bands.select(
        F.col("doc_id").alias("id_b"), "band", "band_key"
    )
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    sh = _with_shingles(docs).select("doc_id", "sh")
    j = (
        cand.join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        j.withColumn("jac", inter / union)
        .filter(F.col("jac") >= F.lit(threshold))
        .select("id_a", "id_b", "jac")
    )


def simhash_col(sh_col: str = "sh") -> F.Column:
    """SIM_BITS-bit simhash: bit b set iff sum over shingle codes of
    (2*bit_b(h(c)) - 1) > 0, with h(c) = (a0*c + b0) % P."""
    a0, b0 = MH_A[0], MH_B[0]
    terms = []
    for b in range(SIM_BITS):
        s = F.expr(
            f"aggregate(transform({sh_col}, "
            f"c -> 2 * (((({a0} * CAST(c AS BIGINT) + {b0}) % {MH_PRIME}) div {1 << b}) % 2) - 1), "
            f"0L, (acc, x) -> acc + x)"
        )
        terms.append(F.when(s > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def simhash_docs(docs: DataFrame) -> DataFrame:
    return _with_shingles(docs).select(
        "doc_id", simhash_col().alias("simhash")
    )


def simhash_band_exprs(max_hamming: int, sim_col: str = "simhash"):
    """Split the SIM_BITS sketch into max_hamming+1 contiguous bit
    bands. PIGEONHOLE: a pair within max_hamming differs in at most
    max_hamming bands, so it shares AT LEAST ONE band's exact value —
    the Hamming-ball equijoin key."""
    nb = max_hamming + 1
    sizes = [SIM_BITS // nb + (1 if i < SIM_BITS % nb else 0) for i in range(nb)]
    exprs = []
    off = 0
    for i, sz in enumerate(sizes):
        exprs.append(
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col(sim_col), off)
                .bitwiseAND(F.lit((1 << sz) - 1))
                .alias("band_val"),
            )
        )
        off += sz
    return exprs


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 2) -> DataFrame:
    """(id_a, id_b, hamming) for same-lang, length-banded pairs within
    max_hamming on the simhash sketch.

    Physical shape (round-3 rework): candidates come from a HAMMING-
    BALL band equijoin — each doc explodes to max_hamming+1 (band,
    band_bits) keys and any qualifying pair must share one (pigeonhole
    over the bit bands), so candidate volume is bounded by simhash
    band-bucket sizes instead of being quadratic within a length
    bucket for uniform-length corpora. The lang / LEN_BAND predicates
    are kept as post-filters, preserving the original output contract
    bit-for-bit."""
    sh = simhash_docs(docs)
    bands = sh.select(
        "doc_id",
        F.explode(F.array(*simhash_band_exprs(max_hamming))).alias("bk"),
    ).select(
        "doc_id", F.col("bk.band").alias("band"),
        F.col("bk.band_val").alias("band_val"),
    )
    a = bands.select(F.col("doc_id").alias("id_a"), "band", "band_val")
    b = bands.select(F.col("doc_id").alias("id_b"), "band", "band_val")
    cand = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    meta = docs.select("doc_id", "lang", "n_chars")
    j = (
        cand.join(
            sh.withColumnRenamed("doc_id", "id_a")
            .withColumnRenamed("simhash", "h_a"), "id_a"
        )
        .join(
            sh.withColumnRenamed("doc_id", "id_b")
            .withColumnRenamed("simhash", "h_b"), "id_b"
        )
        .join(
            meta.withColumnRenamed("doc_id", "id_a")
            .withColumnRenamed("lang", "lang_a")
            .withColumnRenamed("n_chars", "len_a"), "id_a"
        )
        .join(
            meta.withColumnRenamed("doc_id", "id_b")
            .withColumnRenamed("lang", "lang_b")
            .withColumnRenamed("n_chars", "len_b"), "id_b"
        )
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        j.withColumn("hamming", ham)
        .filter(
            (F.col("hamming") <= max_hamming)
            & (F.col("lang_a") == F.col("lang_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= F.lit(LEN_BAND))
        )
        .select("id_a", "id_b", "hamming")
    )


def dedup_clusters(docs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components of the
    MinHash-LSH pair graph, the end stage of a dedup pipeline (keep
    one canonical doc per cluster, drop the rest). Reuses the raster
    engine's iterative min-label contraction (components._resolve_roots
    — O(log diameter) join rounds, no driver state), so clustering
    scales exactly like the seam merge. Returns (cluster_id, n_docs,
    canonical_doc_id) for clusters of size >= 2; cluster_id ==
    canonical == min doc_id in the cluster."""
    from .components import _resolve_roots

    pairs = minhash_lsh_pairs(docs, threshold).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    )
    roots = _resolve_roots(pairs)
    return (
        roots.groupBy("root")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("label").alias("canonical_doc_id"),
        )
        .select(
            F.col("root").alias("cluster_id"), "n_docs", "canonical_doc_id"
        )
    )


BOILER_N = 5  # words per n-gram
BOILER_DF = 20  # an n-gram in >= this many distinct docs is boilerplate


def ngram_doc_freq(docs: DataFrame, n: int = BOILER_N) -> DataFrame:
    """(ngram_md5, df) document frequency of word n-grams — the
    corpus-wide pass of CCNet-style boilerplate / benchmark-
    contamination detection. Pure built-ins: split -> slice window ->
    md5; the shuffle carries (ngram_md5, doc_id) pairs only and the
    distinct-doc count is a map-side-combinable agg."""
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(size(split(text, ' ')) - {n - 1}, 0)),"
                f" i -> md5(concat_ws(' ', slice(split(text, ' '), i, {n}))))"
            )
        ).alias("ngram_md5"),
    )
    return grams.groupBy("ngram_md5").agg(
        F.countDistinct("doc_id").alias("df")
    )


def boilerplate_flags(
    docs: DataFrame, n: int = BOILER_N, min_df: int = BOILER_DF
) -> DataFrame:
    """Per-doc boilerplate statistics: (doc_id, n_ngrams, n_boiler,
    boiler_ratio) where n_boiler counts n-gram POSITIONS whose n-gram
    is high-document-frequency (df >= min_df). The high-df set is the
    small side (bounded by corpus-wide distinct boilerplate n-grams)
    and broadcast-joins back against the exploded positions — the big
    side shuffles nothing."""
    hot = ngram_doc_freq(docs, n).filter(F.col("df") >= min_df).select(
        "ngram_md5"
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(size(split(text, ' ')) - {n - 1}, 0)),"
                f" i -> md5(concat_ws(' ', slice(split(text, ' '), i, {n}))))"
            )
        ).alias("ngram_md5"),
    )
    per_doc = (
        grams.join(F.broadcast(hot), "ngram_md5", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_boiler"))
    )
    totals = docs.select(
        "doc_id",
        F.greatest(
            F.size(F.split("text", " ")) - F.lit(n - 1), F.lit(0)
        ).cast("long").alias("n_ngrams"),
    )
    return (
        totals.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_ngrams",
            F.coalesce("n_boiler", F.lit(0)).cast("long").alias("n_boiler"),
            (
                F.coalesce("n_boiler", F.lit(0)).cast("double")
                / F.col("n_ngrams").cast("double")
            ).alias("boiler_ratio"),
        )
    )
