"""LocationSet partitioning primitives (reference location.py:458-535):
median bisect and k-means splitting — the reference's own partitioning
helpers, re-expressed as window/ML operations.

bisect: split points at the median of the wider axis (deterministic
rank-based median: rank by (coord, doc_id), side = rank <= n/2).
split_kmeans: Lloyd iterations with deterministic seeding, implemented
with DataFrame aggs (assignments are the output; used as a
partitioning hint like RegionMask.subRegions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bisect(points: DataFrame, axis: str = "lon") -> DataFrame:
    """(doc_id, side): side 0 = first half by rank on `axis`
    (tie-broken by doc_id — exact-rank median, no interpolation)."""
    w = Window.orderBy(F.col(axis), F.col("doc_id"))
    n = points.count()
    half = n // 2
    return (
        points.withColumn("rnk", F.row_number().over(w))
        .select(
            "doc_id",
            F.when(F.col("rnk") <= F.lit(half), F.lit(0))
            .otherwise(F.lit(1))
            .alias("side"),
        )
    )


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
