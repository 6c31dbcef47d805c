"""Round-8 isolation benchmarks (NOT the driver bench — bench.py is
the frozen measurement contract; this file reproduces the probes the
round-8 optimization work was steered by, per the optimization guide
§1: noop-sink stage isolation, floor decomposition, and an
interleaved A/B harness that survives co-tenant host load).

Usage:
    python bench_extra.py ann      # ann_topk_bucketed stage decomposition
    python bench_extra.py funnel   # corpus funnel floor decomposition
    python bench_extra.py pagerank # pagerank wall + calibration reps

Every probe prints (name, [reps...], calibration tasks/s per rep).
The calibration is the same cache-resident integer burn bench.py
uses; on this shared VM idle is ~37-42 tasks/s at 32 procs — reps
measured at materially lower calibration are host-load-contaminated
and should be discarded, which is exactly how the round-8 numbers in
OPTIMIZATION_r08.md were filtered.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bench import _burn_cpu, _synth_emb_binary  # noqa: E402
from geokit_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


class _Cal:
    def __init__(self, procs: int):
        import multiprocessing as mp

        self.procs = procs
        self.pool = mp.Pool(procs)
        self.pool.map(_burn_cpu, range(procs))

    def rate(self) -> float:
        t0 = time.perf_counter()
        self.pool.map(_burn_cpu, range(2 * self.procs))
        return round(2 * self.procs / (time.perf_counter() - t0), 1)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(name, fn, cal, reps=3):
    fn()  # warm
    out = []
    for _ in range(reps):
        c = cal.rate()
        t0 = time.perf_counter()
        fn()
        out.append((round(time.perf_counter() - t0, 3), c))
    print(name, out, "min", min(t for t, _ in out), flush=True)


def probe_ann(spark, cal):
    """Stage decomposition of ann_topk_bucketed at the bench's 2M/128
    config: generation floor, +ship pass, +bucket exchange, full."""
    from geokit_spark.operators.similarity import (
        ann_topk_bucketed,
        suggest_n_planes,
    )

    n, parts = 2_000_000, 64
    npl = suggest_n_planes(n, target_bucket=64)
    seq = iter(range(1000))
    _timed(
        "ann:gen_only",
        lambda: _noop(_synth_emb_binary(spark, n, parts, offset=next(seq))),
        cal,
    )
    _timed(
        "ann:full_float",
        lambda: ann_topk_bucketed(
            _synth_emb_binary(spark, n, parts, offset=next(seq)),
            k=5, n_planes=npl, n_tables=2, n_partitions=128,
            binary_dtype="float32",
        ).count(),
        cal,
    )
    _timed(
        "ann:full_q8",
        lambda: ann_topk_bucketed(
            _synth_emb_binary(spark, n, parts, offset=next(seq)),
            k=5, n_planes=npl, n_tables=2, n_partitions=128,
            binary_dtype="float32", quantize="int8",
        ).count(),
        cal,
    )


def _mk_crawl(spark, n_cp, parts, off):
    base = spark.range(off, n_cp + off, 1, parts).select(
        (F.col("id") - off).alias("doc_id"),
        F.concat(
            F.lit("the "),
            F.array_join(
                F.expr(
                    "transform(sequence(1, 19), j -> substring(md5("
                    "concat(cast(id as string), '-', cast(j as string))"
                    "), 1, 6))"
                ),
                " ",
            ),
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % 10).cast("string")).alias(
            "source"
        ),
    )
    return base.unionAll(
        base.select(
            (F.col("doc_id") + n_cp).alias("doc_id"), "text", "lang",
            "source",
        )
    )


def probe_funnel(spark, cal):
    """Floor decomposition of the corpus funnel at the bench's 400k
    config: generation, +page build, +extraction, full funnel."""
    from geokit_spark.operators.pipeline import corpus_funnel
    from geokit_spark.sources.pages import extract_text, pages_from_docs

    n_cp, parts = 400_000, 64
    seq = iter(range(1000))
    _timed(
        "funnel:gen_only",
        lambda: _noop(_mk_crawl(spark, n_cp, parts, next(seq))),
        cal,
    )
    _timed(
        "funnel:gen+pages",
        lambda: _noop(
            pages_from_docs(_mk_crawl(spark, n_cp, parts, next(seq)))
        ),
        cal,
    )
    _timed(
        "funnel:gen+pages+extract",
        lambda: _noop(
            extract_text(
                pages_from_docs(_mk_crawl(spark, n_cp, parts, next(seq))),
                passthrough=("lang",),
            )
        ),
        cal,
    )
    _timed(
        "funnel:full",
        lambda: corpus_funnel(spark, _mk_crawl(spark, n_cp, parts, next(seq)))
        .agg(F.sum("n_docs"), F.sum("sum_words"))
        .collect(),
        cal,
    )


def probe_pagerank(spark, cal):
    """pagerank at the bench's 2.5M-node config (gen + 3 iterations +
    rollup, cache released per rep)."""
    from geokit_spark.operators.webgraph import pagerank
    from geokit_spark.sources.pages import LINK_MULTS

    n_pr, parts = 2_500_000, 64
    mults = ",".join(f"{m}L" for m in LINK_MULTS)
    seq = iter(range(1000))

    def rep():
        off = next(seq)
        nodes = spark.range(off, n_pr + off, 1, parts).select(
            (F.col("id") - off).alias("doc_id")
        )
        edges = nodes.select(
            F.col("doc_id").alias("src_id"),
            F.explode(
                F.expr(
                    "transform(sequence(0, cast(doc_id % 4 as int)), j -> "
                    f"(doc_id * element_at(array({mults}), j + 1) "
                    f"+ doc_id div 7 + j) % {n_pr}L)"
                )
            ).alias("dst_id"),
        )
        sc = pagerank(edges, nodes, iters=3)
        sc.agg(F.sum("s")).collect()
        sc._edge_cache.unpersist()

    _timed("pagerank:full", rep, cal)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "ann"
    spark = get_spark("bench_extra", cores=CPUS,
                      shuffle_partitions=max(CPUS, 8))
    cal = _Cal(CPUS)
    {"ann": probe_ann, "funnel": probe_funnel,
     "pagerank": probe_pagerank}[which](spark, cal)
    spark.stop()


if __name__ == "__main__":
    main()
