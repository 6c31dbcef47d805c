"""Rasterize: burn vector features into the tile grid (reference
vector.rasterize, /root/reference/geokit/core/vector.py:1620-1849).

Per-tile coverage: for each tile the (broadcast) candidate polygons
are tested against the tile's pixel-center coordinate arrays with the
vectorized PIP kernel; overlapping features resolve by feature order —
the last burned feature wins (GDAL burns features sequentially,
vector.py:1798-1848) which for zone_id-ordered burning equals
max(zone_id).

Outputs both the burned tile table (downstream raster ops) and
aggregated burn counts (oracle-compared).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import fixtures
from ..kernels.pip import points_in_poly
from ..kernels.raster_fields import pixel_center
from ..sources.tiles import tile_pixel_indices
from .zonal import _tile_bbox


def rasterize_zones_tiles(tiles: DataFrame, zones=None, attr: str = "year") -> DataFrame:
    """Burned tile table: (tile_x, tile_y, burn array<long>) where burn
    is the winning feature's attribute, -1 where unburned."""
    zones = zones if zones is not None else fixtures.ZONES
    zlist = [
        (z["zone_id"], int(z[attr]) if attr != "zone_id" else z["zone_id"],
         z["verts"], fixtures.poly_bbox(z["verts"]))
        for z in zones
    ]

    def fn(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                tx, ty = int(r.tile_x), int(r.tile_y)
                bx0, by0, bx1, by1 = _tile_bbox(tx, ty)
                gx, gy = tile_pixel_indices(tx, ty)
                px, py = pixel_center(gx, gy)
                burn = np.full(len(px), -1, dtype=np.int64)
                for zid, aval, verts, (zx0, zy0, zx1, zy1) in zlist:
                    if zx1 < bx0 or zx0 > bx1 or zy1 < by0 or zy0 > by1:
                        continue
                    m = points_in_poly(px, py, verts)
                    burn[m] = aval  # sequential burn: later features win
                rows.append({"tile_x": tx, "tile_y": ty, "burn": burn})
            yield pd.DataFrame(rows)

    return tiles.mapInPandas(fn, schema="tile_x int, tile_y int, burn array<long>")


def rasterize_zone_counts(tiles: DataFrame, zones=None, attr: str = "year") -> DataFrame:
    """(burn_value, n_pixels) for the burned raster — the oracle-
    comparable aggregate of rasterize-by-attribute
    (reference test semantics: rasterize value=\"YEAR\",
    test_05_vector.py:474-498)."""
    burned = rasterize_zones_tiles(tiles, zones, attr)
    return (
        burned.select(F.explode("burn").alias("burn_value"))
        .filter(F.col("burn_value") >= 0)
        .groupBy("burn_value")
        .agg(F.count("*").alias("n_pixels"))
    )
