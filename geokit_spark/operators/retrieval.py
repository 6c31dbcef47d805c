"""BM25 relevance scoring over the document corpus.

The retrieval-grade quality/relevance weighting a web-text pipeline
uses to rank documents against query term sets (Robertson/Sparck
Jones BM25 with the Lucene non-negative idf ln(1 + (N-df+0.5)/
(df+0.5))). The reference has no text operators — this is the
training-data-pipeline graft (task mandate), like functions/text.

Plan shape (scale-first):
  base   — one narrow pass: per-doc token count dl and one integer
           tf column per query term (size(filter(tokens, = term)));
           no explode, no shuffle.
  stats  — ONE partial+final aggregation to a single row: N docs,
           sum(dl) and per-term document frequencies, all integer
           sums (order-independent, exact).
  scored — base crossJoin broadcast(stats) (a 1-row broadcast, not a
           real cartesian) + per-query scoring expressions. The sum
           over a query's terms is a FIXED-ORDER scalar expression,
           never a float aggregation, so the plan has exactly one
           exchange (the stats agg) at any scale.

Oracle bit-parity: tf/dl/df are integers (engine wrappers differ,
values cannot), and the double-valued scoring runs ONE SHARED
expression text (score_select_exprs) over those integer columns in
both engines — identical IEEE trees, literals via the repr emitter.
The only cross-engine surface is ln (documented 1-ULP class), which
the floor(score * 1e6) quantization absorbs; the sf0.01 gate margins
are asserted in tests/test_retrieval.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_col
from ..oracle.sqlgen import d

# committed query term sets over the synthetic corpus vocabulary
BM25_QUERIES: dict[str, tuple[str, ...]] = {
    "q_spark": ("spark", "join", "fast"),
    "q_vector": ("vector", "hash"),
    "q_customer": ("customer", "order", "stream", "slow"),
}

K1 = 1.2
B = 0.75
QUANTUM = 1_000_000


def _terms(queries: dict[str, tuple[str, ...]]) -> list[str]:
    out: list[str] = []
    for ts in queries.values():
        for t in ts:
            if t not in out:
                out.append(t)
    return out


def score_select_exprs(
    queries: dict[str, tuple[str, ...]] = BM25_QUERIES,
    k1: float = K1,
    b: float = B,
    quantum: int = QUANTUM,
) -> list[str]:
    """The ENGINE-SHARED scoring expressions (interpolated verbatim
    into Spark selectExpr and the DuckDB oracle — the parity
    contract): per query, a fixed-order left-associated sum of
    per-term BM25 scores over the integer columns
    (dl, tf_<term>, n_docs, sum_dl, df_<term>), floor-quantized."""
    avgdl = "(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    half = d(0.5)
    one = d(1.0)
    k1l = d(float(k1))
    k1p1 = d(float(k1) + 1.0)
    omb = d(1.0 - float(b))
    bl = d(float(b))
    ql = d(float(quantum))

    def term_score(t: str) -> str:
        idf = (
            f"ln({one} + (CAST(n_docs - df_{t} AS DOUBLE) + {half})"
            f" / (CAST(df_{t} AS DOUBLE) + {half}))"
        )
        tf = f"CAST(tf_{t} AS DOUBLE)"
        den = (
            f"({tf} + {k1l} * ({omb} + {bl} * CAST(dl AS DOUBLE)"
            f" / {avgdl}))"
        )
        return f"({idf} * ({tf} * {k1p1}) / {den})"

    exprs = []
    for qname, ts in queries.items():
        total = term_score(ts[0])
        for t in ts[1:]:
            total = f"({total} + {term_score(t)})"
        exprs.append(
            f"CAST(floor({total} * {ql}) AS BIGINT) AS {qname}"
        )
    return exprs


def bm25_scores(
    docs: DataFrame,
    queries: dict[str, tuple[str, ...]] = BM25_QUERIES,
    k1: float = K1,
    b: float = B,
    quantum: int = QUANTUM,
) -> DataFrame:
    """Per-document quantized BM25 score for each query term set.

    Returns (doc_id, <one BIGINT column per query name>)."""
    toks = tokens_col(F.col("text"))

    def _eq(term: str):
        # NOT a default-arg lambda: pyspark reads a second lambda
        # parameter as the (element, index) signature
        return lambda x: x == F.lit(term)

    cols = [F.col("doc_id"), F.size(toks).alias("dl")]
    for t in _terms(queries):
        cols.append(
            F.size(F.filter(toks, _eq(t))).alias(f"tf_{t}")
        )
    base = docs.select(*cols)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    ]
    for t in _terms(queries):
        aggs.append(
            F.sum((F.col(f"tf_{t}") > F.lit(0)).cast("long"))
            .alias(f"df_{t}")
        )
    stats = base.agg(*aggs)
    return base.crossJoin(F.broadcast(stats)).selectExpr(
        "doc_id", *score_select_exprs(queries, k1, b, quantum)
    )


def bm25_oracle_sql(
    queries: dict[str, tuple[str, ...]] = BM25_QUERIES,
    k1: float = K1,
    b: float = B,
    quantum: int = QUANTUM,
    source: str = "documents",
) -> str:
    """DuckDB mirror: integer tf/dl/df via list_filter wrappers, then
    the SAME score_select_exprs text over the stats cross join."""
    toks = "string_split_regex(trim(text), ' +')"
    tf_cols = ",\n    ".join(
        f"len(list_filter({toks}, x -> x = '{t}')) AS tf_{t}"
        for t in _terms(queries)
    )
    df_cols = ",\n    ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in _terms(queries)
    )
    score_cols = ",\n  ".join(score_select_exprs(queries, k1, b, quantum))
    return f"""
WITH base AS (
  SELECT doc_id, len({toks}) AS dl,
    {tf_cols}
  FROM {source}
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(dl) AS BIGINT) AS sum_dl,
    {df_cols}
  FROM base
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  {score_cols}
FROM base CROSS JOIN stats
"""
