"""Training-data pipeline ops beyond the reference: deterministic
stratified sampling, per-group embedding centroids, text
normalization. All pure JVM expressions (whole-stage codegen) with
exact SQL mirrors — no Python in any hot path.

* stratified_sample — per-stratum keep fractions via an LCG hash of
  doc_id (NOT rand(): reproducible across retries/resumes, the
  property a lineage-tracked 100-TB pipeline needs; Spark's sampleBy
  is seed-dependent per partitioning).
* embedding_centroids — posexplode + hash agg per (key, dim); the
  mean is floor-quantized because float summation order differs
  between engines (1e4 quantization absorbs the ~1e-13 drift).
* normalize_text — lower + whitespace-collapse + trim, md5
  fingerprint of the canonical form (java.util.regex and RE2 agree on
  the ASCII \\s class used here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SAMPLE_MOD = 1_000_000
SAMPLE_PRIME = 999_983  # bounds doc_id term so the LCG never overflows
SAMPLE_A = 2_654_435_761
SAMPLE_B = 12_345


def sample_hash_col(doc_id) -> F.Column:
    """Deterministic per-doc hash in [0, SAMPLE_MOD)."""
    return (
        (F.col(doc_id) % F.lit(SAMPLE_PRIME)) * F.lit(SAMPLE_A)
        + F.lit(SAMPLE_B)
    ) % F.lit(SAMPLE_MOD)


def stratified_sample(
    docs: DataFrame, fractions: dict[str, float], key: str = "lang"
) -> DataFrame:
    """Rows whose stratum survives its keep fraction. fractions:
    {stratum_value: fraction}; strata absent from the dict are dropped
    (matching DataFrameStatFunctions.sampleBy semantics)."""
    thresh = F.create_map(
        *[
            x
            for k, f in sorted(fractions.items())
            for x in (F.lit(k), F.lit(int(round(f * SAMPLE_MOD))))
        ]
    )
    return docs.withColumn("_h", sample_hash_col("doc_id")).filter(
        F.col("_h") < F.coalesce(thresh[F.col(key)], F.lit(0))
    ).drop("_h")


def embedding_centroids(
    emb: DataFrame, key: str = "label", q: float = 1e4
) -> DataFrame:
    """(key, pos, n_vecs, mean_q): per-group mean embedding component,
    floor-quantized at `q`. posexplode -> ONE hash aggregation with
    map-side partials — the shape of IVF/k-means centroid updates at
    any scale."""
    px = emb.select(
        key, F.posexplode("embedding").alias("pos", "v")
    ).select(key, "pos", F.col("v").cast("double").alias("v"))
    return (
        px.groupBy(key, "pos")
        .agg(F.count("*").alias("n_vecs"), F.sum("v").alias("_s"))
        .select(
            key,
            "pos",
            "n_vecs",
            F.floor(
                F.col("_s") / F.col("n_vecs").cast("double") * F.lit(q)
            ).alias("mean_q"),
        )
    )


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_norm, norm_md5): canonical text form — lowercase,
    whitespace runs collapsed to single spaces, trimmed — with its md5
    fingerprint (the key exact dedup runs on after normalization)."""
    norm = F.lower(
        F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    )
    return docs.select(
        "doc_id",
        F.length(norm).alias("n_norm"),
        F.md5(norm).alias("norm_md5"),
    )


def mix_weights(docs: DataFrame, budget: int = 1_000_000_000) -> DataFrame:
    """Data-mixture weights per language (the pretraining "mixing
    table"): temperature-0.5 sampling weights w_i ~ sqrt(tokens_i)
    and an exact token-budget allocation.

    Exactness scheme: the numerator is floor(sqrt(total_tokens)) —
    IEEE sqrt is correctly rounded, so both engines produce the SAME
    double and the SAME floor (and for totals < 2^52 the floor equals
    the true integer sqrt). From there everything stays in int64: the
    denominator is an ORDER-FREE integer sum (no cross-row float
    accumulation anywhere), the weight is one double division of two
    exact integers, and the budget allocation is truncating integer
    arithmetic — all bit-reproducible at any parallelism.

    100-TB shape: one hash-agg shuffle on lang (map-side combined);
    the single-partition window runs over the BOUNDED lang dimension
    (a handful of rows), not the corpus.
    """
    from pyspark.sql import Window

    from ..functions.text import token_count

    agg = docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("long"))
        .cast("long")
        .alias("total_tokens"),
    )
    num = F.floor(F.sqrt(F.col("total_tokens").cast("double"))).cast(
        "long"
    )
    out = agg.withColumn("w_num", num).withColumn(
        "w_denom",
        F.sum("w_num").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    return out.select(
        "lang",
        "n_docs",
        "total_tokens",
        "w_num",
        (F.col("w_num").cast("double") / F.col("w_denom").cast("double")).alias(
            "weight"
        ),
        F.expr(f"({int(budget)}L * w_num) div w_denom").alias(
            "alloc_tokens"
        ),
    )
