"""Analytic raster fields + grid math.

The synthetic rasters (FIXTURES.md §6-§7) are defined as closed-form
integer-valued functions of the pixel index so that the Spark engine,
this numpy oracle, and the DuckDB SQL all agree exactly:

* ``clc``  — categorical land-cover analog: 8x8-pixel blocks of
             classes 1..44 (value-range DSL queries select patches)
* ``elev`` — integer-valued "elevation": linear ramp + deterministic
             roughness (drives gradient / interpolation / zonal stats)

Pixel grid: RASTER_W x RASTER_H pixels over the bbox, row 0 at the
*top* (y-at-top, matching the reference's normalized geotransform,
/root/reference/geokit/core/raster.py:249-287).
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    CLC_CLASSES,
    ELEV_MOD,
    PIX_DX,
    PIX_DY,
    RASTER_H,
    RASTER_W,
    XMIN,
    YMAX,
)


def clc_value(ix, iy):
    """Categorical class at integer pixel index (ix right, iy down)."""
    ix = np.asarray(ix, dtype=np.int64)
    iy = np.asarray(iy, dtype=np.int64)
    return (1 + ((ix // 8) * 37 + (iy // 8) * 61) % CLC_CLASSES).astype(np.int64)


def elev_value(ix, iy):
    """Integer-valued elevation at pixel index (exact in float64)."""
    ix = np.asarray(ix, dtype=np.int64)
    iy = np.asarray(iy, dtype=np.int64)
    return (100 + ix + 2 * iy + (ix * iy) % ELEV_MOD).astype(np.int64)


def pixel_center(ix, iy):
    """Pixel index -> center coordinates (reference indexToCoord,
    raster.py:1452-1523, y-at-top)."""
    ix = np.asarray(ix, dtype=np.float64)
    iy = np.asarray(iy, dtype=np.float64)
    return XMIN + (ix + 0.5) * PIX_DX, YMAX - (iy + 0.5) * PIX_DY


def raster_cell_no(lon, lat):
    """Point -> integer pixel index; out-of-bounds -> (-1, -1)
    (reference rasterCellNo, raster.py:2560-2673, core math :2652-2665)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    ix = np.floor((lon - XMIN) / PIX_DX).astype(np.int64)
    iy = np.floor((YMAX - lat) / PIX_DY).astype(np.int64)
    bad = (ix < 0) | (ix >= RASTER_W) | (iy < 0) | (iy >= RASTER_H)
    ix = np.where(bad, -1, ix)
    iy = np.where(bad, -1, iy)
    return ix, iy
