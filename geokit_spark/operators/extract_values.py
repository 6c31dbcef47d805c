"""Point -> raster lookup joins (reference extractValues /
interpolateValues, /root/reference/geokit/core/raster.py:866-1303).

The reference loops per-point ReadAsArray window reads
(raster.py:1062-1101); here each stencil corner is one row in an
equi-join against the tile table, and the gather is F.element_at on
the tile's data array — fully JVM-side, zero Python in the hot path.
The join strategy is SIZE-AWARE (_tile_side): a bounded regional
raster broadcasts (the points side then never shuffles until the
per-point pivot — a groupBy on doc_id, map-side combinable); a large
raster is left unhinted so Catalyst/AQE picks a shuffle join rather
than OOMing every executor with a forced broadcast (round-2 review
finding)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import (
    PIX_DX,
    PIX_DY,
    RASTER_H,
    RASTER_W,
    TILE_SIZE,
    XMIN,
    YMAX,
)


def pixel_index_cols(lon, lat):
    """Point -> integer pixel index (y-at-top); out-of-bounds -> null
    (reference rasterCellNo raster.py:2652-2665, oob handling
    raster.py:1115-1118)."""
    ix = F.floor((lon - F.lit(XMIN)) / F.lit(PIX_DX)).cast("long")
    iy = F.floor((F.lit(YMAX) - lat) / F.lit(PIX_DY)).cast("long")
    oob = (ix < 0) | (ix >= RASTER_W) | (iy < 0) | (iy >= RASTER_H)
    return (
        F.when(oob, F.lit(None)).otherwise(ix),
        F.when(oob, F.lit(None)).otherwise(iy),
    )


def _tile_cols(ix, iy):
    tx = F.floor(ix / F.lit(TILE_SIZE)).cast("int")
    ty = F.floor(iy / F.lit(TILE_SIZE)).cast("int")
    off = ((iy % TILE_SIZE) * TILE_SIZE + (ix % TILE_SIZE) + 1).cast("int")
    return tx, ty, off


def _tile_side(tiles: DataFrame) -> DataFrame:
    """Size-aware build side for the point->tile equijoin: broadcast
    hint only when Catalyst's size estimate fits the threshold. A
    general raster can be arbitrarily large — force-broadcasting it
    OOMs every executor (see plans.hints for the shared rationale)."""
    from ..plans.hints import size_aware_broadcast

    return size_aware_broadcast(tiles)


def extract_values(points: DataFrame, tiles: DataFrame, value_name: str = "value") -> DataFrame:
    """Nearest-pixel value at each point ('near' mode). points needs
    (doc_id, lon, lat); returns (doc_id, <value_name>), null if oob."""
    ix, iy = pixel_index_cols(F.col("lon"), F.col("lat"))
    pts = points.withColumn("ix", ix).withColumn("iy", iy)
    tx, ty, off = _tile_cols(F.col("ix"), F.col("iy"))
    pts = pts.withColumn("tile_x", tx).withColumn("tile_y", ty).withColumn("off", off)
    j = pts.join(_tile_side(tiles), ["tile_x", "tile_y"], "left")
    return j.select(
        "doc_id", F.element_at("data", F.col("off")).alias(value_name)
    )


def _stencil_join(points: DataFrame, tiles: DataFrame, corners) -> DataFrame:
    """Explode per-point stencil corners -> tile join -> gather -> pivot
    back to one row per point with one column per corner value.

    corners: list of (name, dx_col_fn) producing (ix, iy) per corner
    from the base columns already on `points`.
    """
    dfs = None
    pts = points
    corner_rows = []
    for name, (ix_c, iy_c) in corners.items():
        corner_rows.append(
            F.struct(
                F.lit(name).alias("corner"), ix_c.alias("cix"), iy_c.alias("ciy")
            )
        )
    exploded = pts.withColumn("c", F.explode(F.array(*corner_rows))).select(
        "*", F.col("c.corner").alias("corner"), F.col("c.cix").alias("cix"),
        F.col("c.ciy").alias("ciy"),
    ).drop("c")
    tx, ty, off = _tile_cols(F.col("cix"), F.col("ciy"))
    exploded = (
        exploded.withColumn("tile_x", tx)
        .withColumn("tile_y", ty)
        .withColumn("off", off)
        .join(_tile_side(tiles), ["tile_x", "tile_y"], "left")
        .withColumn("val", F.element_at("data", F.col("off")))
    )
    agg = [
        F.max(F.when(F.col("corner") == name, F.col("val"))).alias(f"v_{name}")
        for name in corners
    ]
    return exploded.groupBy("doc_id").agg(*agg)


def interpolate_bilinear(points: DataFrame, tiles: DataFrame) -> DataFrame:
    """Bilinear interpolation at each point (reference
    interpolateValues mode='linear-spline' window-2 analog,
    raster.py:1241-1297). Border handling: the 2x2 stencil origin is
    clamped to the grid, matching the oracle exactly."""
    gx = (F.col("lon") - F.lit(XMIN)) / F.lit(PIX_DX) - F.lit(0.5)
    gy = (F.lit(YMAX) - F.col("lat")) / F.lit(PIX_DY) - F.lit(0.5)
    ix0 = F.least(F.greatest(F.floor(gx), F.lit(0)), F.lit(RASTER_W - 2)).cast("long")
    iy0 = F.least(F.greatest(F.floor(gy), F.lit(0)), F.lit(RASTER_H - 2)).cast("long")
    pts = (
        points.withColumn("fx", gx - ix0)
        .withColumn("fy", gy - iy0)
        .withColumn("ix0", ix0)
        .withColumn("iy0", iy0)
    )
    corners = {
        "00": (F.col("ix0"), F.col("iy0")),
        "10": (F.col("ix0") + 1, F.col("iy0")),
        "01": (F.col("ix0"), F.col("iy0") + 1),
        "11": (F.col("ix0") + 1, F.col("iy0") + 1),
    }
    vals = _stencil_join(pts.select("doc_id", "fx", "fy", "ix0", "iy0"), tiles, corners)
    out = pts.select("doc_id", "fx", "fy").join(vals, "doc_id")
    one = F.lit(1.0)
    interp = (
        F.col("v_00") * (one - F.col("fx")) * (one - F.col("fy"))
        + F.col("v_10") * F.col("fx") * (one - F.col("fy"))
        + F.col("v_01") * (one - F.col("fx")) * F.col("fy")
        + F.col("v_11") * F.col("fx") * F.col("fy")
    )
    return out.select("doc_id", interp.alias("elev_bilinear"))


def _cubic1d(fm1, f0, f1, f2, u):
    """Catmull-Rom cubic (Keys a=-0.5) in Horner form — the SAME
    expression tree as oracle.sqlgen emits, so both engines round
    identically."""
    half = F.lit(0.5)
    return f0 + half * u * (
        f1 - fm1
        + u * (
            F.lit(2.0) * fm1 - F.lit(5.0) * f0 + F.lit(4.0) * f1 - f2
            + u * (F.lit(3.0) * (f0 - f1) + f2 - fm1)
        )
    )


def interpolate_cubic(points: DataFrame, tiles: DataFrame) -> DataFrame:
    """Bicubic (cubic-spline window-4) interpolation at each point
    (reference interpolateValues mode='cubic-spline',
    raster.py:1241-1297): 4x4 stencil, row-wise cubic then column-wise
    cubic. The stencil base is clamped to [1, W-3] so all 16 taps stay
    in bounds (fractions then exceed [0,1) at the border band —
    deterministic extrapolation mirrored by the oracle)."""
    gx = (F.col("lon") - F.lit(XMIN)) / F.lit(PIX_DX) - F.lit(0.5)
    gy = (F.lit(YMAX) - F.col("lat")) / F.lit(PIX_DY) - F.lit(0.5)
    ixb = F.least(F.greatest(F.floor(gx), F.lit(1)), F.lit(RASTER_W - 3)).cast("long")
    iyb = F.least(F.greatest(F.floor(gy), F.lit(1)), F.lit(RASTER_H - 3)).cast("long")
    pts = (
        points.withColumn("fx", gx - ixb)
        .withColumn("fy", gy - iyb)
        .withColumn("ixb", ixb)
        .withColumn("iyb", iyb)
    )
    corners = {
        f"{dx + 1}{dy + 1}": (F.col("ixb") + dx, F.col("iyb") + dy)
        for dy in (-1, 0, 1, 2)
        for dx in (-1, 0, 1, 2)
    }
    vals = _stencil_join(pts.select("doc_id", "fx", "fy", "ixb", "iyb"), tiles, corners)
    out = pts.select("doc_id", "fx", "fy").join(vals, "doc_id")
    rows = [
        _cubic1d(
            F.col(f"v_0{dy + 1}"), F.col(f"v_1{dy + 1}"),
            F.col(f"v_2{dy + 1}"), F.col(f"v_3{dy + 1}"), F.col("fx"),
        )
        for dy in (-1, 0, 1, 2)
    ]
    interp = _cubic1d(rows[0], rows[1], rows[2], rows[3], F.col("fy"))
    return out.select("doc_id", interp.alias("elev_cubic"))


def interpolate_func(
    points: DataFrame, tiles: DataFrame, func, window: int = 1,
    out_name: str = "value",
) -> DataFrame:
    """interpolateValues mode='func' (reference raster.py:1176-1199,
    1287-1294): a user function (window_matrix, xoff, yoff) -> scalar
    applied at each point over its (2*window+1)^2 pixel neighborhood
    (clamped at borders). The window is gathered JVM-side via the same
    stencil join as the closed-form modes; only the user function runs
    in an Arrow-batched pandas UDF — the engine's UDF surface, not the
    hot path."""
    ix, iy = pixel_index_cols(F.col("lon"), F.col("lat"))
    pts = points.withColumn("ix", ix).withColumn("iy", iy)
    corners = {}
    side = 2 * window + 1
    for dy in range(-window, window + 1):
        for dx in range(-window, window + 1):
            cx = F.least(F.greatest(F.col("ix") + dx, F.lit(0)), F.lit(RASTER_W - 1))
            cy = F.least(F.greatest(F.col("iy") + dy, F.lit(0)), F.lit(RASTER_H - 1))
            corners[f"{dx + window}_{dy + window}"] = (cx, cy)
    vals = _stencil_join(pts.select("doc_id", "ix", "iy"), tiles, corners)
    win = F.array(
        *[
            F.col(f"v_{dx}_{dy}")
            for dy in range(side)
            for dx in range(side)
        ]
    )
    # fractional offsets of the point inside its pixel (reference
    # passes xOff/yOff to the user func)
    gx = (F.col("lon") - F.lit(XMIN)) / F.lit(PIX_DX)
    gy = (F.lit(YMAX) - F.col("lat")) / F.lit(PIX_DY)
    offs = pts.select(
        "doc_id",
        (gx - F.floor(gx)).alias("xoff"),
        (gy - F.floor(gy)).alias("yoff"),
    )

    @F.pandas_udf(T.DoubleType())
    def apply_func(w: pd.Series, xo: pd.Series, yo: pd.Series) -> pd.Series:
        out = np.empty(len(w))
        xon = xo.to_numpy(np.float64)
        yon = yo.to_numpy(np.float64)
        for i, arr in enumerate(w):
            out[i] = func(
                np.asarray(arr, dtype=np.float64).reshape(side, side),
                xon[i], yon[i],
            )
        return pd.Series(out)

    joined = vals.join(offs, "doc_id")
    return joined.select(
        "doc_id",
        apply_func(win, F.col("xoff"), F.col("yoff")).alias(out_name),
    )


def extract_values_multi(
    points: DataFrame, sources: list[DataFrame], value_name: str = "value",
    nodata: float = -9999.0,
) -> DataFrame:
    """Multi-source point lookup with priority routing (reference
    extractValues bbox routing across rasters, raster.py:997-1008;
    divided_raster fixture FIXTURES.md §8): later sources win where
    they have data; points covered by no source -> null. One broadcast
    join per source + a coalesce — no per-point routing loop."""
    out = points.select("doc_id", "lon", "lat")
    val_cols = []
    for i, tiles in enumerate(sources):
        v = extract_values(
            points.select("doc_id", "lon", "lat"), tiles, f"_v{i}"
        ).withColumn(
            f"_v{i}",
            F.when(F.col(f"_v{i}") == F.lit(nodata), F.lit(None)).otherwise(
                F.col(f"_v{i}")
            ),
        )
        out = out.join(v, "doc_id", "left")
        val_cols.append(f"_v{i}")
    # later sources take precedence (reference mosaic ordering)
    merged = F.coalesce(*[F.col(c) for c in reversed(val_cols)])
    return out.select("doc_id", merged.alias(value_name))


def interpolate_average3(points: DataFrame, tiles: DataFrame) -> DataFrame:
    """interpolateValues mode='average' (window 3): mean of the 3x3
    neighborhood around each point's pixel (reference
    raster.py:1241-1297), neighbors clamped at the raster border.
    Sum of 9 integer-valued gathers / 9.0 — exact, oracle-safe."""
    ix, iy = pixel_index_cols(F.col("lon"), F.col("lat"))
    pts = points.withColumn("ix", ix).withColumn("iy", iy)
    corners = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            cx = F.least(F.greatest(F.col("ix") + dx, F.lit(0)), F.lit(RASTER_W - 1))
            cy = F.least(F.greatest(F.col("iy") + dy, F.lit(0)), F.lit(RASTER_H - 1))
            corners[f"{dx + 1}{dy + 1}"] = (cx, cy)
    vals = _stencil_join(pts.select("doc_id", "ix", "iy"), tiles, corners)
    total = None
    for name in corners:
        c = F.col(f"v_{name}")
        total = c if total is None else total + c
    return vals.select("doc_id", (total / F.lit(9.0)).alias("elev_avg3"))


def gradient_at_points(points: DataFrame, tiles: DataFrame) -> DataFrame:
    """Central-difference gradient at each point's pixel (reference
    gradient, raster.py:640-753; stencil :724-740). Neighbor indices
    clamp at raster borders (one-sided difference there would change
    the divisor; the reference pads edges — we clamp, documented and
    mirrored in the oracle)."""
    ix, iy = pixel_index_cols(F.col("lon"), F.col("lat"))
    pts = points.withColumn("ix", ix).withColumn("iy", iy)
    xm = F.greatest(F.col("ix") - 1, F.lit(0))
    xp = F.least(F.col("ix") + 1, F.lit(RASTER_W - 1))
    ym = F.greatest(F.col("iy") - 1, F.lit(0))
    yp = F.least(F.col("iy") + 1, F.lit(RASTER_H - 1))
    corners = {
        "xm": (xm, F.col("iy")),
        "xp": (xp, F.col("iy")),
        "ym": (F.col("ix"), ym),
        "yp": (F.col("ix"), yp),
    }
    vals = _stencil_join(pts.select("doc_id", "ix", "iy"), tiles, corners)
    dzdx = (F.col("v_xp") - F.col("v_xm")) / F.lit(2.0 * PIX_DX)
    # y-at-top: increasing iy = decreasing latitude
    dzdy = (F.col("v_ym") - F.col("v_yp")) / F.lit(2.0 * PIX_DY)
    return vals.select("doc_id", dzdx.alias("dzdx"), dzdy.alias("dzdy"))
