"""Resampling + mosaic operators.

* scale_down / scale_up — the reference's scaleMatrix block-average
  downsample / block-repeat upsample (util.py:113-253), per tile with
  numpy reshape (no cross-tile traffic when the factor divides the
  tile size — the layout invariant the tile grid is designed for).
* warp 'average' to an arbitrary coarser grid == scale_down followed
  by regrouping — the regrid-aggregate path of reference warp
  (raster.py:2140-2418, 'average' resampleAlg).
* mosaic_last_wins — combineSimilarRasters semantics: later source
  wins on non-noData pixels (combineSimilarRasters.py:179-188),
  as a JVM zip_with fold over priority-ordered tile tables.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import TILE_SIZE


def scale_down_tiles(tiles: DataFrame, k: int) -> DataFrame:
    """Block-average downsample by factor k (k must divide TILE_SIZE).
    Returns (block_x, block_y, value) rows on the coarse grid —
    mean of each k x k block, exact for integer-valued data."""
    assert TILE_SIZE % k == 0
    t = TILE_SIZE
    nb = t // k

    def fn(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                m = np.asarray(r.data, dtype=np.float64).reshape(t, t)
                # rows are y (y-at-top layout), columns are x
                blocks = m.reshape(nb, k, nb, k).sum(axis=(1, 3)) / float(k * k)
                yb, xb = np.meshgrid(np.arange(nb), np.arange(nb), indexing="ij")
                out.append(
                    pd.DataFrame(
                        {
                            "block_x": (r.tile_x * nb + xb.ravel()).astype("int32"),
                            "block_y": (r.tile_y * nb + yb.ravel()).astype("int32"),
                            "value": blocks.ravel(),
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                {"block_x": [], "block_y": [], "value": []}
            )

    return tiles.mapInPandas(fn, schema="block_x int, block_y int, value double")


def scale_up_tiles(tiles: DataFrame, k: int) -> DataFrame:
    """Block-repeat upsample by factor k: each tile becomes k*k tiles
    on the fine grid (reference scaleMatrix scale>0, util.py:198-202)."""
    t = TILE_SIZE

    def fn(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                m = np.asarray(r.data, dtype=np.float64).reshape(t, t)
                big = np.repeat(np.repeat(m, k, axis=0), k, axis=1)
                for sy in range(k):
                    for sx in range(k):
                        sub = big[sy * t : (sy + 1) * t, sx * t : (sx + 1) * t]
                        out.append(
                            {
                                "tile_x": r.tile_x * k + sx,
                                "tile_y": r.tile_y * k + sy,
                                "data": sub.ravel(),
                            }
                        )
            yield pd.DataFrame(out)

    return tiles.mapInPandas(fn, schema="tile_x int, tile_y int, data array<double>")


def mosaic_last_wins(layers: list[DataFrame], nodata: float = -9999.0) -> DataFrame:
    """Merge same-grid tile tables; for each pixel the LAST layer's
    non-noData value wins (reference combineSimilarRasters merge rule,
    combineSimilarRasters.py:179-188). Pure JVM: full-outer joins on
    the tile key + zip_with coalesce fold."""
    assert layers
    out = layers[0].select("tile_x", "tile_y", F.col("data").alias("acc"))
    t2 = TILE_SIZE * TILE_SIZE
    empty = F.array_repeat(F.lit(float(nodata)), t2)
    for layer in layers[1:]:
        nxt = layer.select("tile_x", "tile_y", F.col("data").alias("nxt"))
        out = (
            out.join(nxt, ["tile_x", "tile_y"], "full_outer")
            .withColumn("acc_f", F.coalesce(F.col("acc"), empty))
            .withColumn("nxt_f", F.coalesce(F.col("nxt"), empty))
            .select(
                "tile_x",
                "tile_y",
                F.zip_with(
                    "acc_f",
                    "nxt_f",
                    lambda a, b: F.when(b != F.lit(nodata), b).otherwise(a),
                ).alias("acc"),
            )
        )
    return out.select("tile_x", "tile_y", F.col("acc").alias("data"))
