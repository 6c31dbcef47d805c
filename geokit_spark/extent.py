"""Extent — bounding-box workspace arithmetic (reference
/root/reference/geokit/core/extent.py:26-983).

Pure closed-form math (no Spark dependency): grid snapping (`fit`,
extent.py:557-627), resolution checks (`fitsResolution`,
extent.py:513-555), extent relations (`overlaps`/`contains`,
extent.py:833-917), pixel-window arithmetic (`findWithin`,
extent.py:919-983), bbox point containment (`containsLoc`,
extent.py:797-831 — as a Spark column predicate in
functions.geo/grid_cell_cols). The Spark-side uses these to turn
window reads into tile-key equijoins (alignment = key equality)."""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass(frozen=True)
class Extent:
    xmin: float
    ymin: float
    xmax: float
    ymax: float

    def fits_resolution(self, unit: float | tuple[float, float]) -> bool:
        """True iff the extent dimensions are integer multiples of
        unit (reference fitsResolution, extent.py:513-555)."""
        ux, uy = unit if isinstance(unit, tuple) else (unit, unit)
        for span, u in (((self.xmax - self.xmin), ux), ((self.ymax - self.ymin), uy)):
            n = span / u
            if abs(n - round(n)) > 1e-9:
                return False
        return True

    def fit(self, unit: float | tuple[float, float], grow: bool = True) -> "Extent":
        """Snap bounds outward (grow) or inward to the unit grid
        anchored at the origin (reference fit, extent.py:557-627)."""
        ux, uy = unit if isinstance(unit, tuple) else (unit, unit)
        if grow:
            return Extent(
                math.floor(self.xmin / ux) * ux,
                math.floor(self.ymin / uy) * uy,
                math.ceil(self.xmax / ux) * ux,
                math.ceil(self.ymax / uy) * uy,
            )
        return Extent(
            math.ceil(self.xmin / ux) * ux,
            math.ceil(self.ymin / uy) * uy,
            math.floor(self.xmax / ux) * ux,
            math.floor(self.ymax / uy) * uy,
        )

    def pad(self, amount: float) -> "Extent":
        return Extent(
            self.xmin - amount, self.ymin - amount,
            self.xmax + amount, self.ymax + amount,
        )

    def overlaps(self, other: "Extent") -> bool:
        return not (
            self.xmax <= other.xmin or other.xmax <= self.xmin
            or self.ymax <= other.ymin or other.ymax <= self.ymin
        )

    def contains(self, other: "Extent", res=None) -> bool:
        """other fits inside self; if res given, the offset must also
        align to the resolution grid (reference contains,
        extent.py:867-917)."""
        inside = (
            self.xmin <= other.xmin and self.ymin <= other.ymin
            and self.xmax >= other.xmax and self.ymax >= other.ymax
        )
        if not inside or res is None:
            return inside
        rx, ry = res if isinstance(res, tuple) else (res, res)
        for off, u in (
            (other.xmin - self.xmin, rx), (other.ymin - self.ymin, ry),
            (self.xmax - other.xmax, rx), (self.ymax - other.ymax, ry),
        ):
            n = off / u
            if abs(n - round(n)) > 1e-6:
                return False
        return True

    def contains_loc(self, x: float, y: float) -> bool:
        return self.xmin <= x <= self.xmax and self.ymin <= y <= self.ymax

    def find_within(
        self, other: "Extent", res: float | tuple[float, float], y_at_top: bool = True
    ) -> tuple[int, int, int, int]:
        """Pixel offsets + window size of `other` inside `self` at
        resolution res (reference findWithin, extent.py:919-983):
        (xoff, yoff, xwin, ywin)."""
        rx, ry = res if isinstance(res, tuple) else (res, res)
        xoff = int(round((other.xmin - self.xmin) / rx))
        if y_at_top:
            yoff = int(round((self.ymax - other.ymax) / ry))
        else:
            yoff = int(round((other.ymin - self.ymin) / ry))
        xwin = int(round((other.xmax - other.xmin) / rx))
        ywin = int(round((other.ymax - other.ymin) / ry))
        return xoff, yoff, xwin, ywin


def tile_sources(template: str, tiles) -> list[str]:
    """Template-expand {z}/{x}/{y} tile paths (reference
    Extent.tileSources, extent.py:1501-1535): the partition-path
    enumeration for cell-keyed external tile stores."""
    return [
        template.format(z=z, x=x, y=y) for x, y, z in tiles
    ]


def extract_matrix_window(tiles, extent: Extent):
    """Windowed raster read: filter the tile table to the tiles
    intersecting `extent` (reference extractMatrix, raster.py:433-583 —
    the snap math turns the window into integer tile keys, so Catalyst
    prunes on the tile_x/tile_y predicate)."""
    from pyspark.sql import functions as F

    from .constants import PIX_DX, PIX_DY, TILE_SIZE, XMIN, YMAX

    tx0 = int(math.floor((extent.xmin - XMIN) / (PIX_DX * TILE_SIZE)))
    tx1 = int(math.ceil((extent.xmax - XMIN) / (PIX_DX * TILE_SIZE))) - 1
    ty0 = int(math.floor((YMAX - extent.ymax) / (PIX_DY * TILE_SIZE)))
    ty1 = int(math.ceil((YMAX - extent.ymin) / (PIX_DY * TILE_SIZE))) - 1
    return tiles.filter(
        (F.col("tile_x") >= tx0) & (F.col("tile_x") <= tx1)
        & (F.col("tile_y") >= ty0) & (F.col("tile_y") <= ty1)
    )
