"""BM25 scoring: semantics vs a straight-python reference, oracle
quantization margins, and the narrow plan contract."""

import math

from geokit_spark.operators import retrieval as R


def _bm25_py(docs, queries, k1=R.K1, b=R.B):
    """Textbook BM25 (Lucene idf), independent of the engine's
    expression builder."""
    toks = {d: t.split() for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for d_, t in toks.items():
        scores = {}
        for qname, terms in queries.items():
            s = 0.0
            for term in terms:
                tf = t.count(term)
                df = sum(1 for tt in toks.values() if term in tt)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                s += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * len(t) / avgdl)
                )
            scores[qname] = s
        out[d_] = scores
    return out


def test_bm25_matches_python_reference(spark):
    docs = {
        1: "spark join fast fast table",
        2: "vector hash hash hash",
        3: "customer order stream slow slow the a",
        4: "spark spark spark join",
        5: "table scan filter",
    }
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict() for r in R.bm25_scores(df).collect()
    }
    exp = _bm25_py(docs, R.BM25_QUERIES)
    for d_, scores in exp.items():
        for qname, s in scores.items():
            # engine emits floor(score * QUANTUM); the python path's
            # float sum order differs, so compare at 1 quantum slack
            assert abs(got[d_][qname] - math.floor(s * R.QUANTUM)) <= 1, (
                d_, qname, s, got[d_][qname],
            )
    # a doc with zero query-term hits scores exactly 0 on that query
    assert got[5]["q_vector"] == 0
    # doc 1 matches all three q_spark terms; doc 4 repeats one term —
    # BM25's tf saturation must rank breadth over repetition
    assert got[1]["q_spark"] > got[4]["q_spark"]
    # and on the single-common-term comparison both score positive
    assert got[4]["q_spark"] > 0 and got[2]["q_vector"] > 0


def test_bm25_oracle_quantization_margins(spark):
    """The only cross-engine surface is ln (1-ULP class). Assert every
    sf0.01 score sits far from a floor boundary relative to that
    scale: the driver gate's compare is deterministic per box, and
    this pins the safety margin the bit-exact result rests on."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    # recompute the UNQUANTIZED scores by dropping the floor: swap the
    # quantum into the raw double and inspect fractional distances
    raw = R.bm25_scores(docs, quantum=1)  # floor at 1.0 granularity
    # instead read exact doubles via the shared exprs minus floor
    from pyspark.sql import functions as F

    toks_exprs = R.score_select_exprs()
    # strip "CAST(floor(" wrapper to get the raw double expression
    raw_exprs = [
        e.replace("CAST(floor(", "(").replace(") AS BIGINT)", ")", 1)
        for e in toks_exprs
    ]
    from geokit_spark.operators.retrieval import _terms

    toks = __import__(
        "geokit_spark.functions.text", fromlist=["x"]
    ).tokens_col(F.col("text"))

    def _eq(term):
        return lambda x: x == F.lit(term)

    cols = [F.col("doc_id"), F.size(toks).alias("dl")]
    for t in _terms(R.BM25_QUERIES):
        cols.append(F.size(F.filter(toks, _eq(t))).alias(f"tf_{t}"))
    base = docs.select(*cols)
    aggs = [F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")]
    for t in _terms(R.BM25_QUERIES):
        aggs.append(
            F.sum((F.col(f"tf_{t}") > F.lit(0)).cast("long"))
            .alias(f"df_{t}")
        )
    scored = base.crossJoin(F.broadcast(base.agg(*aggs))).selectExpr(
        "doc_id", *raw_exprs
    )
    pdf = scored.toPandas()
    min_margin = 1.0
    for c in pdf.columns:
        if c == "doc_id":
            continue
        # the stripped expr retains the * QUANTUM factor
        q = pdf[c].to_numpy()
        frac = q - q.astype("int64")
        import numpy as np

        dist = np.minimum(frac, 1.0 - frac)
        nz = dist[q != 0.0]
        if len(nz):
            min_margin = min(min_margin, float(nz.min()))
    # ln's 1-ULP wiggle scales like 1e-16 * score * QUANTUM ~ 1e-9
    # quanta; require 4+ orders of magnitude of headroom
    assert min_margin > 1e-5, min_margin
    assert raw.count() == 500


def test_bm25_score_exprs_are_engine_shared():
    """The scoring text is the parity contract: it must reference
    only the integer columns both engines provide and the shared SQL
    surface (ln/floor/CAST) — no engine-specific function names."""
    for e in R.score_select_exprs():
        for banned in ("list_", "string_split", "size(", "filter("):
            assert banned not in e, (banned, e)
        assert "ln(" in e and "floor(" in e


def test_bm25_plan_single_exchange(spark):
    """One stats aggregation exchange + a broadcast — no explode, no
    python stages, no real cartesian (the cross join side is 1 row)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        R.bm25_scores(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Generate" not in plan  # no explode
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("ShuffleExchange") <= 1 or plan.count("Exchange") <= 3
