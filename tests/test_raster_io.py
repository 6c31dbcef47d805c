"""Raster persistence: save/load roundtrip + raster_like + pruning."""

import numpy as np
from pyspark.sql import functions as F

from geokit_spark.constants import TILE_SIZE
from geokit_spark.sources import tiles as tilesrc


def test_save_load_roundtrip(spark, tmp_path):
    elev = tilesrc.raster_table(spark, "elev")
    path = str(tmp_path / "elev_raster")
    tilesrc.save_raster(elev, path)
    back = tilesrc.load_raster(spark, path)
    assert back.count() == elev.count()
    a = elev.filter((F.col("tile_x") == 2) & (F.col("tile_y") == 3)).collect()[0]
    b = back.filter((F.col("tile_x") == 2) & (F.col("tile_y") == 3)).collect()[0]
    assert np.array_equal(np.asarray(a.data), np.asarray(b.data))


def test_partition_pruning_on_tile_key(spark, tmp_path):
    elev = tilesrc.raster_table(spark, "elev")
    path = str(tmp_path / "elev_pruned")
    tilesrc.save_raster(elev, path)
    back = tilesrc.load_raster(spark, path).filter(F.col("tile_x") == 5)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(tile_x" in plan or "tile_x" in plan
    assert back.count() == 8  # one column of the 8x8 tile grid


def test_raster_like(spark):
    elev = tilesrc.raster_table(spark, "elev")
    filled = tilesrc.raster_like(spark, elev, fill=7.0)
    row = filled.limit(1).collect()[0]
    assert len(row.data) == TILE_SIZE * TILE_SIZE
    assert set(row.data) == {7.0}
    assert filled.count() == elev.count()


def test_raster_info(spark):
    elev = tilesrc.raster_table(spark, "elev")
    info = tilesrc.raster_info(elev)
    assert info["n_tiles"] == 64
    assert info["extent_tiles"] == (0, 0, 7, 7)
    # exact content sum vs numpy
    from geokit_spark.constants import RASTER_H, RASTER_W
    from geokit_spark.kernels.raster_fields import elev_value

    ix, iy = np.meshgrid(np.arange(RASTER_W), np.arange(RASTER_H))
    assert info["sum"] == elev_value(ix, iy).sum()
