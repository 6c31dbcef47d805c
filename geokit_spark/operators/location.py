"""LocationSet partitioning primitives (reference location.py:458-535):
median bisect and k-means splitting — the reference's own partitioning
helpers, re-expressed as window/ML operations.

bisect: split points at the median of the wider axis (deterministic
rank-based median: rank by (coord, doc_id), side = rank <= n/2).
split_kmeans: Lloyd iterations with deterministic seeding, implemented
with DataFrame aggs (assignments are the output; used as a
partitioning hint like RegionMask.subRegions)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bisect(points: DataFrame, axis: str = "lon", _checkpoint: bool = True) -> DataFrame:
    """(doc_id, side): side 0 = first half by exact rank on
    (`axis`, doc_id) — exact-rank median, no interpolation.

    Distributed rank (no global single-partition Window, the round-1
    anti-pattern): ONE range shuffle orders partitions by the sort key,
    rows are sorted within partitions, and the global rank is the
    within-partition position plus the cumulative size of lower
    partitions (P driver-side integers — bounded by the partition
    count, never by rows). The range-partitioned DataFrame is
    localCheckpoint-ed so the size pass and the rank pass see the
    identical partitioning."""
    spark = points.sparkSession
    n = points.count()
    half = n // 2
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rp = (
        points.select("doc_id", axis)
        .repartitionByRange(p, F.col(axis), F.col("doc_id"))
        .sortWithinPartitions(F.col(axis), F.col("doc_id"))
    )
    if _checkpoint:  # pinned partitioning; False only for plan tests
        rp = rp.localCheckpoint()
    sizes = (
        rp.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    by_pid = {int(r["pid"]): int(r["count"]) for r in sizes}
    offsets = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]
    bc = spark.sparkContext.broadcast(offsets)

    def fn(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = bc.value.get(pid, 0)
        seen = 0
        for pdf in batches:
            rnk = base + seen + np.arange(1, len(pdf) + 1, dtype=np.int64)
            seen += len(pdf)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(np.int64),
                    "side": np.where(rnk <= half, 0, 1).astype(np.int32),
                }
            )

    return rp.mapInPandas(fn, schema="doc_id long, side int")


def split_kmeans(
    points: DataFrame, k: int = 2, iters: int = 5
) -> DataFrame:
    """(doc_id, cluster) after `iters` Lloyd steps. Deterministic init:
    the k points with the smallest doc_id. Driver holds only the k
    centroids; assignment + recentering are DataFrame ops."""
    pts = points.select("doc_id", "lon", "lat")
    seeds = pts.orderBy("doc_id").limit(k).collect()
    centroids = [(float(r["lon"]), float(r["lat"])) for r in seeds]

    def assign(cents):
        dist_cols = [
            (
                (F.col("lon") - F.lit(cx)) * (F.col("lon") - F.lit(cx))
                + (F.col("lat") - F.lit(cy)) * (F.col("lat") - F.lit(cy))
            ).alias(f"d{i}")
            for i, (cx, cy) in enumerate(cents)
        ]
        d = pts.select("doc_id", "lon", "lat", *dist_cols)
        best = F.lit(0)
        bestd = F.col("d0")
        for i in range(1, len(cents)):
            cond = F.col(f"d{i}") < bestd
            best = F.when(cond, F.lit(i)).otherwise(best)
            bestd = F.when(cond, F.col(f"d{i}")).otherwise(bestd)
        return d.withColumn("cluster", best)

    for _ in range(iters):
        a = assign(centroids)
        rows = (
            a.groupBy("cluster")
            .agg(F.avg("lon").alias("cx"), F.avg("lat").alias("cy"))
            .collect()
        )
        new = dict((int(r["cluster"]), (r["cx"], r["cy"])) for r in rows)
        centroids = [new.get(i, centroids[i]) for i in range(k)]

    return assign(centroids).select("doc_id", "cluster")
