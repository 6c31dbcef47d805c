"""Distributed contour statistics (reference contours,
raster.py:2044-2137; SURVEY §7: parity on counts/lengths).

Each marching-squares cell spans a 2x2 pixel block, so a tile owns the
cells whose top-left pixel lies inside it and needs a 1-pixel halo on
its right/bottom edges. Halo exchange: every tile is also sent to its
left/top/top-left neighbors; the per-tile pandas stage assembles the
(T+1)^2 block and runs the numpy marching-squares kernel. Final agg:
exact segment counts (+ float lengths) per level."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import TILE_SIZE
from ..kernels.contours import LENGTH_Q, contour_stats_per_level_q
from ..sources.tiles import NTX, NTY


def contour_stats(tiles: DataFrame, levels: list[float]) -> DataFrame:
    """(level, n_segments, total_length) across the raster.

    Lengths are summed as per-segment integer LENGTH_Q quanta, so the
    final totals are exact and independent of partitioning — that is
    what lets the driver hash-compare this against the full-matrix
    golden (oracle.geooracle.contours_sql)."""
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (0, -1)
            for dy in (0, -1)
        ]
    )
    exploded = (
        tiles.withColumn("o", F.explode(offsets))
        .withColumn("tgt_x", F.col("tile_x") + F.col("o.dx"))
        .withColumn("tgt_y", F.col("tile_y") + F.col("o.dy"))
        .filter(
            (F.col("tgt_x") >= 0) & (F.col("tgt_x") < NTX)
            & (F.col("tgt_y") >= 0) & (F.col("tgt_y") < NTY)
        )
        .select("tgt_x", "tgt_y", "tile_x", "tile_y", "data")
    )
    T = TILE_SIZE
    lv = [float(x) for x in levels]

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tgt_x"].iloc[0])
        ty = int(pdf["tgt_y"].iloc[0])
        # (T+1)^2 block: own tile + right/bottom halo strips
        size_x = T + (1 if tx < NTX - 1 else 0)
        size_y = T + (1 if ty < NTY - 1 else 0)
        block = np.full((size_y, size_x), np.nan)
        for r in pdf.itertuples():
            m = np.asarray(r.data, dtype=np.float64).reshape(T, T)
            ox = (r.tile_x - tx) * T
            oy = (r.tile_y - ty) * T
            xs = slice(ox, min(ox + T, size_x))
            ys = slice(oy, min(oy + T, size_y))
            block[ys, xs] = m[: ys.stop - ys.start, : xs.stop - xs.start]
        rows = [
            {"level": level, "n_segments": n, "length_q": q}
            for level, n, q in contour_stats_per_level_q(block, lv)
        ]
        return pd.DataFrame(rows)

    per = exploded.groupBy("tgt_x", "tgt_y").applyInPandas(
        per_tile, schema="level double, n_segments long, length_q long"
    )
    return per.groupBy("level").agg(
        F.sum("n_segments").alias("n_segments"),
        (F.sum("length_q").cast("double") / F.lit(float(LENGTH_Q))).alias(
            "total_length"
        ),
    )
