"""Tile-table raster sources (the engine's raster layout).

A raster is a DataFrame with one row per fixed-size tile:
  (tile_x int, tile_y int, data array<double>, nodata double)
data is the row-major flattening of the tile's TILE_SIZE x TILE_SIZE
pixel block, y-at-top (reference raster normalization,
/root/reference/geokit/core/raster.py:249-287). This is the
Iceberg-friendly layout: at 100 TB the table is partitioned by
(tile_x bucket, tile_y) so scans prune by cell and a tile row
(~32 KB at 64x64 float64) stays well under page size.

Synthetic fixture rasters are generated with mapInPandas from the
analytic fields (kernels.raster_fields) — distributed generation, no
driver-side materialization (reference createRaster, raster.py:122-348).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..constants import RASTER_H, RASTER_W, TILE_SIZE
from ..kernels.raster_fields import clc_value, elev_value

NTX = RASTER_W // TILE_SIZE
NTY = RASTER_H // TILE_SIZE


def tile_pixel_indices(tx: int, ty: int):
    """Global pixel index arrays (ix, iy) for a tile, row-major."""
    ix = np.arange(tx * TILE_SIZE, (tx + 1) * TILE_SIZE, dtype=np.int64)
    iy = np.arange(ty * TILE_SIZE, (ty + 1) * TILE_SIZE, dtype=np.int64)
    gx, gy = np.meshgrid(ix, iy)  # gy varies along rows: row-major y-at-top
    return gx.ravel(), gy.ravel()


def _field_fn(field: str):
    return {"clc": clc_value, "elev": elev_value}[field]


def raster_table(spark: SparkSession, field: str = "elev") -> DataFrame:
    """Distributed tile-table build for a named analytic field."""
    fn = _field_fn(field)

    def gen(batches):
        for pdf in batches:
            out = []
            for tid in pdf["id"].to_numpy():
                tx, ty = int(tid) % NTX, int(tid) // NTX
                gx, gy = tile_pixel_indices(tx, ty)
                out.append(
                    {
                        "tile_x": tx,
                        "tile_y": ty,
                        "data": fn(gx, gy).astype(np.float64),
                        "nodata": -9999.0,
                    }
                )
            yield pd.DataFrame(out)

    return spark.range(NTX * NTY).repartition(8).mapInPandas(
        gen, schema="tile_x int, tile_y int, data array<double>, nodata double"
    )


# patch-layer bounds in pixel indices (mosaic fixture): the second
# raster covers this window with elev+1000, noData elsewhere
PATCH_X0, PATCH_X1 = 128, 256
PATCH_Y0, PATCH_Y1 = 192, 320


def patch_raster_table(spark: SparkSession) -> DataFrame:
    """Second mosaic source: elev + 1000 inside the patch window,
    noData (-9999) outside (divided_raster multi-source analog,
    FIXTURES.md §8)."""

    def gen(batches):
        for pdf in batches:
            out = []
            for tid in pdf["id"].to_numpy():
                tx, ty = int(tid) % NTX, int(tid) // NTX
                gx, gy = tile_pixel_indices(tx, ty)
                v = elev_value(gx, gy).astype(np.float64) + 1000.0
                inside = (
                    (gx >= PATCH_X0) & (gx < PATCH_X1)
                    & (gy >= PATCH_Y0) & (gy < PATCH_Y1)
                )
                v = np.where(inside, v, -9999.0)
                out.append(
                    {"tile_x": tx, "tile_y": ty, "data": v, "nodata": -9999.0}
                )
            yield pd.DataFrame(out)

    return spark.range(NTX * NTY).repartition(8).mapInPandas(
        gen, schema="tile_x int, tile_y int, data array<double>, nodata double"
    )


def save_raster(df: DataFrame, path: str):
    """Persist a tile table (saveRasterAsTif analog,
    raster.py:350-428): parquet partitioned by tile_x so window reads
    prune on the tile key (the Iceberg partition-layout analog)."""
    df.write.mode("overwrite").partitionBy("tile_x").parquet(path)


def load_raster(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def raster_like(spark: SparkSession, template: DataFrame, fill: float = 0.0) -> DataFrame:
    """createRasterLike (raster.py:350-428): same tile grid as the
    template, constant fill."""
    import pyspark.sql.functions as F

    t2 = TILE_SIZE * TILE_SIZE
    return template.select(
        "tile_x",
        "tile_y",
        F.array_repeat(F.lit(float(fill)), t2).alias("data"),
        F.lit(-9999.0).alias("nodata"),
    )


def raster_info(df: DataFrame) -> dict:
    """Raster schema/stats summary (reference rasterInfo,
    raster.py:770-858): tile grid, pixel count, value stats."""
    import pyspark.sql.functions as F

    row = df.select(
        F.count("*").alias("n_tiles"),
        F.min("tile_x").alias("tx0"),
        F.max("tile_x").alias("tx1"),
        F.min("tile_y").alias("ty0"),
        F.max("tile_y").alias("ty1"),
        F.sum(F.aggregate("data", F.lit(0.0), lambda a, x: a + x)).alias("sum"),
    ).collect()[0]
    return {
        "n_tiles": row["n_tiles"],
        "tile_size": TILE_SIZE,
        "extent_tiles": (row["tx0"], row["ty0"], row["tx1"], row["ty1"]),
        "sum": row["sum"],
    }
