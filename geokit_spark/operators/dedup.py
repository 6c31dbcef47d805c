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
from pyspark.sql import DataFrame, Window
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

# 64-bit sketch (industry standard): bit b is derived from hash
# function j = b // 16 (MH_A[j], MH_B[j]) at bit position b % 16 —
# the 31-bit LCG hashes cannot feed more than ~16 well-mixed low bits
# each, so the sketch draws 16 bits from each of 4 independent hashes.
# Bit 63 is the long sign bit (term value -2^63).
SIM_BITS = 64
SIM_BITS_PER_HASH = 16
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


def _shingle_seg(texts: list) -> tuple:
    """Codepoint-exact shingle extraction for one chunk of docs.
    Returns (seg, sh_starts, n_sh): concatenated int64 shingle codes,
    per-doc start offsets into seg, and per-doc shingle counts.
    THREE NUL pads per doc emulate ascii(substring-beyond-end) = 0
    for sub-3-char docs, matching the JVM expression exactly (two
    pads would read the next doc's first byte — see round-2 bug)."""
    lens = np.array([len(t) for t in texts], dtype=np.int64)
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
    return codes[idx], sh_starts, n_sh


def _shingle_seg_bytes(data: np.ndarray, offs: np.ndarray) -> tuple:
    """Same shingle codes straight from the Arrow UTF-8 buffer
    (ASCII-only batches: utf-8 byte == codepoint). One vectorized
    scatter builds the NUL-padded byte stream. Codes MUST be int64:
    hash multipliers reach ~2^44 and numpy's NEP-50 loop selection
    multiplies int32 inputs in int32 even with an int64 out= buffer
    (silent wraparound)."""
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    nd = len(lens)
    total = int(lens.sum())
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
    return codes[idx], sh_starts, n_sh


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
        seg, sh_starts, n_sh = _shingle_seg(texts)
        # one pass per hash function: sequential 1-D ops stay in cache
        # (a single (NUM_HASHES, n) broadcast thrashes the allocator)
        mins = np.empty((NUM_HASHES, len(n_sh)), dtype=np.int64)
        for i in range(NUM_HASHES):
            h = (MH_A[i] * seg + MH_B[i]) % MH_PRIME
            mins[i] = np.minimum.reduceat(h, sh_starts)
        return mins.T

    def _chunk_bytes(data: np.ndarray, offs: np.ndarray) -> np.ndarray:
        seg, sh_starts, n_sh = _shingle_seg_bytes(data, offs)
        h = np.empty(len(seg), dtype=np.int64)
        mins = np.empty((NUM_HASHES, len(n_sh)), dtype=np.int64)
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


def simhash_col(sh_col: str = "sh", sim_bits: int = SIM_BITS) -> F.Column:
    """sim_bits-bit simhash: bit b set iff sum over DISTINCT shingle
    codes of (2*bit_{b%16}(h_j(c)) - 1) > 0 with j = b // 16 and
    h_j(c) = (MH_A[j]*c + MH_B[j]) % P. Bit 63 is the long sign bit
    (term value -2^63, added LAST so no partial sum overflows ANSI
    long arithmetic). This is the JVM closed form — the oracle SQL and
    the Arrow fast path (simhash_docs) mirror it bit-for-bit."""
    terms = []
    for b in range(sim_bits):
        j, p = b // SIM_BITS_PER_HASH, b % SIM_BITS_PER_HASH
        s = F.expr(
            f"aggregate(transform({sh_col}, "
            f"c -> 2 * (((({MH_A[j]} * CAST(c AS BIGINT) + {MH_B[j]}) % {MH_PRIME}) div {1 << p}) % 2) - 1), "
            f"0L, (acc, x) -> acc + x)"
        )
        val = -(1 << 63) if b == 63 else (1 << b)
        terms.append(F.when(s > 0, F.lit(val).cast("long")).otherwise(F.lit(0).cast("long")))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def _simhash_from_seg(seg, sh_starts, n_sh, sim_bits: int) -> np.ndarray:
    """Vectorized simhash over concatenated shingle codes. Replicates
    simhash_col exactly: per-doc DISTINCT codes (array_distinct), then
    per bit the sign of 2*count_set - n_distinct."""
    nd = len(n_sh)
    docidx = np.repeat(np.arange(nd, dtype=np.int64), n_sh)
    order = np.lexsort((seg, docidx))
    ds, ss = docidx[order], seg[order]
    keep = np.empty(len(ss), dtype=bool)
    keep[0] = True
    keep[1:] = (ds[1:] != ds[:-1]) | (ss[1:] != ss[:-1])
    useg = ss[keep]
    udoc = ds[keep]
    # every doc emits >= 1 shingle, so udoc covers all doc indices
    ustarts = np.flatnonzero(np.r_[True, udoc[1:] != udoc[:-1]])
    n_u = np.diff(np.r_[ustarts, len(udoc)])
    acc = np.zeros(nd, dtype=np.uint64)
    h = np.empty(len(useg), dtype=np.int64)
    for j in range((sim_bits + SIM_BITS_PER_HASH - 1) // SIM_BITS_PER_HASH):
        np.multiply(useg, MH_A[j], out=h)
        h += MH_B[j]
        np.remainder(h, MH_PRIME, out=h)
        for p in range(min(SIM_BITS_PER_HASH, sim_bits - SIM_BITS_PER_HASH * j)):
            b = SIM_BITS_PER_HASH * j + p
            cnt = np.add.reduceat((h >> p) & 1, ustarts)
            acc |= ((2 * cnt) > n_u).astype(np.uint64) << np.uint64(b)
    return acc.view(np.int64)


def simhash_docs(
    docs: DataFrame,
    text_col: str = "text",
    sim_bits: int = SIM_BITS,
    extra_cols: tuple = (),
) -> DataFrame:
    """(doc_id, simhash[, *extra_cols]): the 64-bit sketch via one
    Arrow-vectorized pass (same parsing fast paths as minhash —
    zero-copy UTF-8 buffer when the batch is ASCII, codepoint-exact
    fallback otherwise). extra_cols are forwarded through the batch so
    callers (simhash_near_pairs) avoid a join back to the docs table.

    NULL text sketches to 0 — the same value the JVM closed form
    simhash_col yields for NULL (empty string, by contrast, keeps its
    well-defined nonzero sketch in both paths)."""
    CHUNK = int(os.environ.get("GEOKIT_MH_CHUNK", "512"))

    def fn(batches):
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            tarr = batch.column(1)
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
            lst = None if ascii_ok else tarr.to_pylist()
            outs = []
            for i in range(0, n, CHUNK):
                if ascii_ok:
                    seg, st, ns = _shingle_seg_bytes(data, offs[i : i + CHUNK + 1])
                    outs.append(_simhash_from_seg(seg, st, ns, sim_bits))
                else:
                    chunk = lst[i : i + CHUNK]
                    seg, st, ns = _shingle_seg(
                        [x if x is not None else "" for x in chunk]
                    )
                    sk = _simhash_from_seg(seg, st, ns, sim_bits)
                    # NULL -> 0, matching the JVM closed form (not the
                    # empty-string sketch the '' placeholder computed)
                    nulls = np.fromiter(
                        (x is None for x in chunk), dtype=bool, count=len(chunk)
                    )
                    sk[nulls] = 0
                    outs.append(sk)
            sketch = pa.array(np.concatenate(outs))
            cols = [batch.column(0), sketch] + [
                batch.column(2 + k) for k in range(len(extra_cols))
            ]
            yield pa.RecordBatch.from_arrays(
                cols, ["doc_id", "simhash", *extra_cols]
            )

    sel = docs.select("doc_id", F.col(text_col), *extra_cols)
    extra_schema = "".join(
        f", {c} {t}" for c, t in zip(
            extra_cols,
            [dict(docs.dtypes)[c] for c in extra_cols],
        )
    )
    return sel.mapInArrow(
        fn, schema=f"doc_id long, simhash long{extra_schema}"
    )


def simhash_band_exprs(
    max_hamming: int, sim_col: str = "simhash", sim_bits: int = SIM_BITS
):
    """Split the sim_bits sketch into max_hamming+1 contiguous bit
    bands. PIGEONHOLE: a pair within max_hamming differs in at most
    max_hamming bands, so it shares AT LEAST ONE band's exact value —
    the Hamming-ball equijoin key. At the default 64 bits with
    max_hamming=3 each band carries 16 bits (65k bucket values), so
    band buckets actually discriminate at corpus scale (the round-3
    16-bit sketch gave 4-bit bands = 16 buckets — quadratic/16)."""
    nb = max_hamming + 1
    sizes = [sim_bits // nb + (1 if i < sim_bits % nb else 0) for i in range(nb)]
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


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 2, sim_bits: int = SIM_BITS
) -> DataFrame:
    """(id_a, id_b, hamming) for same-lang, length-banded pairs within
    max_hamming on the simhash sketch.

    Physical shape (round-4 rework): ONE Hamming-ball band EQUIJOIN on
    (band, band_val, lang, len_bucket). Each doc explodes to
    (max_hamming+1) bands x 3 length buckets (the +-1 explode trick
    from candidate_pairs: any pair within LEN_BAND differs by at most
    one floor(n_chars/LEN_BAND) bucket, and the right side keeps its
    single bucket, so a qualifying pair is matched once per shared
    band). The sketch and meta columns ride through the explode, so
    hamming and the exact length predicate evaluate directly on the
    join output — no join-back to the docs table — and the final
    distinct() dedupes the <= max_hamming+1 band matches. Candidates
    are bounded by (lang, len-bucket, 16-bit band value) bucket sizes:
    the blocking factor of the old (lang, length) scheme TIMES the
    65k-way band split."""
    sh = simhash_docs(
        docs, sim_bits=sim_bits, extra_cols=("lang", "n_chars")
    )
    bands = F.explode(
        F.array(*simhash_band_exprs(max_hamming, sim_bits=sim_bits))
    ).alias("bk")
    # r8: SYMMETRIC self-join — both sides are the IDENTICAL exploded
    # frame (bands x the +-1 length-bucket explode), so AQE reuses the
    # one shuffle at runtime and the Arrow sketch pass runs ONCE
    # instead of once per side (the r7 asymmetric shape recomputed
    # simhash_docs for each side: two full Python passes, 193 MB
    # written vs 145 now; measured 3.5 s -> 2.6 s at 500k docs).
    # Candidate semantics: the bucket key is only a PREFILTER — the
    # exact |len_a - len_b| <= LEN_BAND predicate below decides — and
    # a qualifying pair (bucket distance <= 1) always shares one of
    # the +-1 values on both sides; the symmetric explode admits a few
    # extra |bucket distance| = 2 candidates that the exact filter
    # drops, and duplicate band/bucket matches collapse in the same
    # final distinct() as before. Results identical (oracle + pytest).
    ex = (
        sh.select(
            "doc_id",
            "simhash",
            "lang",
            F.col("n_chars").alias("len"),
            bands,
        )
        # one generator per projection: the bucket explode chains after
        .withColumn(
            "bkt",
            F.explode(
                F.array(
                    F.floor(F.col("len") / F.lit(LEN_BAND)) - F.lit(1),
                    F.floor(F.col("len") / F.lit(LEN_BAND)),
                    F.floor(F.col("len") / F.lit(LEN_BAND)) + F.lit(1),
                )
            ),
        )
        .select(
            "doc_id", "simhash", "lang", "len", "bkt",
            F.col("bk.band").alias("band"),
            F.col("bk.band_val").alias("band_val"),
        )
    )
    a = ex.select(
        F.col("doc_id").alias("id_a"),
        F.col("simhash").alias("h_a"),
        "lang",
        F.col("len").alias("len_a"),
        "bkt", "band", "band_val",
    )
    b = ex.select(
        F.col("doc_id").alias("id_b"),
        F.col("simhash").alias("h_b"),
        "lang",
        F.col("len").alias("len_b"),
        "bkt", "band", "band_val",
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        a.join(b, ["band", "band_val", "lang", "bkt"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= F.lit(LEN_BAND))
        )
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
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
                f"if(size(split(text, ' ')) >= {n},"
                # IF guard, not greatest(..., 0): Spark sequence(1, 0)
                # is the DESCENDING [1, 0] and slice(_, 0, _) throws —
                # an unguarded bound crashes on any doc under n words
                f" transform(sequence(1, size(split(text, ' ')) - {n - 1}),"
                f" i -> md5(concat_ws(' ', slice(split(text, ' '), i, {n})))),"
                f" array())"
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
    is high-document-frequency (df >= min_df).

    The high-df set's size is DATA-DEPENDENT — on a web corpus the
    n-grams with df >= min_df can be billions of rows, so a forced
    broadcast would OOM every executor. The join side therefore goes
    through the size-aware hint (plans.hints): hinted only when
    Catalyst's estimate fits the threshold, otherwise unhinted and AQE
    picks broadcast at runtime iff the materialized set is small."""
    from ..plans.hints import size_aware_broadcast

    hot = size_aware_broadcast(
        ngram_doc_freq(docs, n).filter(F.col("df") >= min_df).select(
            "ngram_md5"
        )
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"if(size(split(text, ' ')) >= {n},"
                # IF guard, not greatest(..., 0): Spark sequence(1, 0)
                # is the DESCENDING [1, 0] and slice(_, 0, _) throws —
                # an unguarded bound crashes on any doc under n words
                f" transform(sequence(1, size(split(text, ' ')) - {n - 1}),"
                f" i -> md5(concat_ws(' ', slice(split(text, ' '), i, {n})))),"
                f" array())"
            )
        ).alias("ngram_md5"),
    )
    per_doc = (
        grams.join(hot, "ngram_md5", "left_semi")
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
            # NULL ratio for docs with no n-grams (ANSI division would
            # throw on 0; the oracle mirrors the CASE)
            F.when(
                F.col("n_ngrams") > 0,
                F.coalesce("n_boiler", F.lit(0)).cast("double")
                / F.col("n_ngrams").cast("double"),
            ).alias("boiler_ratio"),
        )
    )


def mirror_clusters(pages) -> "DataFrame":
    """Cross-host MIRROR detection over the input_hint page table:
    clusters of pages whose byte-level EXTRACTED main text is
    identical under >= 2 urls, with the registrable-domain spread
    that separates mirror farms (n_domains >= 2) from same-site
    revisits (n_domains == 1). canonical_url = lexicographic min.

    Scale shape: one narrow Arrow extract pass (pipelines with the
    scan), the md5/domain per-row expressions all-JVM, then ONE
    shuffle (the md5 group, map-side combinable) — content dedup over
    a 100-TB crawl never compares texts pairwise, only 16-byte
    digests. Reference parity anchor: the webtext analog of the
    reference's duplicate-geometry filtering in vector workflows
    (`/root/reference/geokit/core/vector.py:365-434` uniqueness
    handling)."""
    from ..functions.url import registrable_domain
    from ..sources.pages import extract_text_sql

    # r8: all-JVM extractor (byte-identical, pytest-pinned) — the md5
    # grouping below sees the same bytes with zero Python crossings
    per = extract_text_sql(pages).select(
        F.md5(F.col("text_extracted")).alias("text_md5"),
        "url",
        registrable_domain(F.col("url")).alias("domain"),
    )
    return (
        per.groupBy("text_md5")
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.countDistinct("domain").cast("long").alias("n_domains"),
            F.min("url").alias("canonical_url"),
        )
        .filter(F.col("n_copies") >= 2)
        .select("text_md5", "canonical_url", "n_copies", "n_domains")
    )


# --- cardinality sketch ----------------------------------------------------

SKETCH_HASH_BITS = 48  # int64(md5[:12]) — identical parse both engines
SKETCH_M = 1 << SKETCH_HASH_BITS


def sketch_hash_expr(col: str) -> str:
    """Uniform deterministic 48-bit hash shared bit-for-bit by Spark
    (conv) and DuckDB ('0x' cast): int64 of the first 12 md5 hex
    chars."""
    return (
        f"cast(conv(substring(md5({col}), 1, 12), 16, 10) as bigint)"
    )


def _kmv_kept(
    df: DataFrame, col: str, by: tuple[str, ...], k: int
) -> DataFrame:
    """Shared KMV pipeline: distinct non-NULL hashes -> per-group
    k smallest. NULL values are dropped BEFORE ranking — Spark
    windows sort NULLS FIRST while DuckDB defaults NULLS LAST, so an
    unfiltered NULL both corrupts the kept set and breaks
    cross-engine parity."""
    h = F.expr(sketch_hash_expr(col))
    hashes = (
        df.select(*by, h.alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(*by).orderBy("h")
    return hashes.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= int(k)
    )


def kmv_distinct(
    df: DataFrame,
    col: str,
    by: tuple[str, ...] = ("lang",),
    k: int = 64,
) -> DataFrame:
    """Approximate distinct counting with a KMV (theta) sketch: the k
    smallest distinct 48-bit hashes per group; when fewer than k
    distinct values exist the count is EXACT (everything was kept),
    otherwise est = (k-1) * M div h_k. Deterministic integer
    arithmetic end-to-end — bit-reproducible and oracle-mirrorable,
    unlike engine HLL implementations.

    100-TB shape: the map side distinct-combines (group, hash) pairs
    — the one exchange carries each distinct hash once, the same
    first phase exact countDistinct pays — then a bounded per-group
    top-k. Groups here are the bounded lang dimension; for
    high-cardinality groups the theta refinement (per-partition
    partial top-k before the merge) bounds the exchange at k rows
    per task."""
    kk = int(k)
    agg = _kmv_kept(df, col, by, kk).groupBy(*by).agg(
        F.max("h").alias("hk"), F.count("*").alias("n_kept")
    )
    est = F.when(F.col("n_kept") < kk, F.col("n_kept")).otherwise(
        F.expr(f"({kk} - 1) * {SKETCH_M}L div hk")
    )
    return agg.select(*by, est.cast("long").alias("est_distinct"))


def kmv_sketch(
    df: DataFrame,
    col: str,
    by: tuple[str, ...] = ("lang",),
    k: int = 64,
) -> DataFrame:
    """The KMV synopsis itself: per group, the sorted array of the k
    smallest distinct hashes — a MERGEABLE sketch (union two corpora
    by merging arrays and re-truncating; the k smallest of a union
    equal the k smallest of the two k-min sets, exactly). Bounded k
    longs per group on the wire."""
    return _kmv_kept(df, col, by, k).groupBy(*by).agg(
        F.sort_array(F.collect_list("h")).alias("sketch")
    )


def kmv_merge_col(a: str, b: str, k: int) -> F.Column:
    """Merge two KMV sketch arrays: sorted distinct union, truncated
    back to k. NULL sketches (a group absent from one side) are
    treated as empty."""
    ca = f"coalesce({a}, array())"
    cb = f"coalesce({b}, array())"
    return F.expr(
        f"slice(array_sort(array_distinct(concat({ca}, {cb}))),"
        f" 1, {int(k)})"
    )


def kmv_estimate_col(sketch: str, k: int) -> F.Column:
    """Estimate from a sketch array: exact below k, else
    (k-1) * M div h_k."""
    kk = int(k)
    return F.expr(
        f"if(size({sketch}) < {kk}, size({sketch}),"
        f" ({kk} - 1) * {SKETCH_M}L div element_at({sketch}, {kk}))"
    ).cast("long")
