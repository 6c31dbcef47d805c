"""Sliding-window kernel ops via tile halo exchange.

Reference: KernelProcessor (util.py:259-341) applies a (2s+1)^2 window
per pixel over a whole matrix, padding the outside with a constant
edgeValue. Distributed shape:

  tiles ──explode 9 neighbor copies──► groupBy(target tile)
        ──applyInPandas: assemble padded block, vectorized stride
          window op──► filtered tile table

Each tile row is copied to itself + its 8 neighbors (the halo
exchange); the per-tile pandas stage assembles a (T+2s)^2 padded
matrix and applies the kernel with numpy stride tricks — no Python
per-pixel loop. At 100 TB the shuffle moves 9x tile bytes (or 4x with
edge-strip-only halos — noted as the production refinement); the agg
is per-tile local.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import RASTER_H, RASTER_W, TILE_SIZE
from ..sources.tiles import NTX, NTY


def _window_view(padded: np.ndarray, size: int) -> np.ndarray:
    """(T, T, k, k) sliding windows of a (T+2s, T+2s) padded block."""
    k = 2 * size + 1
    t = padded.shape[0] - 2 * size
    return np.lib.stride_tricks.sliding_window_view(padded, (k, k))[:t, :t]


def kernel_filter_tiles(
    tiles: DataFrame,
    kernel: str = "max",
    size: int = 1,
    edge_value: float = 0.0,
) -> DataFrame:
    """Apply a (2*size+1)^2 window reduce ('max'|'min'|'mean'|'sum', or
    any callable (T,T,k,k)->(T,T) — the reference's arbitrary
    KernelProcessor hook, util.py:259-341) per pixel. Out-of-raster
    pixels contribute edge_value (reference KernelProcessor edgeValue
    padding, util.py:318-324)."""
    red = kernel if callable(kernel) else {
        "max": lambda w: w.max(axis=(2, 3)),
        "min": lambda w: w.min(axis=(2, 3)),
        "mean": lambda w: w.mean(axis=(2, 3)),
        "sum": lambda w: w.sum(axis=(2, 3)),
    }[kernel]

    # halo exchange: send each tile to itself and its 8 neighbors
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
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

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tgt_x"].iloc[0])
        ty = int(pdf["tgt_y"].iloc[0])
        padded = np.full((T + 2 * size, T + 2 * size), edge_value, dtype=np.float64)
        for r in pdf.itertuples():
            block = np.asarray(r.data, dtype=np.float64).reshape(T, T)
            dy = (r.tile_y - ty) * T
            dx = (r.tile_x - tx) * T
            y0 = size + dy
            x0 = size + dx
            ys = slice(max(y0, 0), min(y0 + T, T + 2 * size))
            xs = slice(max(x0, 0), min(x0 + T, T + 2 * size))
            if ys.start >= ys.stop or xs.start >= xs.stop:
                continue
            padded[ys, xs] = block[
                ys.start - y0 : ys.stop - y0, xs.start - x0 : xs.stop - x0
            ]
        out = red(_window_view(padded, size))
        return pd.DataFrame(
            [{"tile_x": tx, "tile_y": ty, "data": out.ravel()}]
        )

    return (
        exploded.groupBy("tgt_x", "tgt_y")
        .applyInPandas(per_tile, schema="tile_x int, tile_y int, data array<double>")
    )


def aspect_octant_case(ns: str = "ns", ew: str = "ew") -> str:
    """Aspect OCTANT classification of the gradient vector (the D8
    flow-direction binning of reference gradient mode='dir',
    raster.py:740-753): sector boundaries sit on the 45-degree
    diagonals and the axes, so the whole classification is pure float
    COMPARISONS of the exact (ns, ew) fields — no atan2, hence
    bit-identical between the JVM and DuckDB (the continuous aspect
    stays numpy-pytest-verified; this gives the aspect PATH a
    driver-green oracle row). Octants 0..7 go N, NE, E, SE, S, SW, W,
    NW in half-open 45-degree sectors starting at due north
    (boundary ties resolve by the shared CASE order); -1 = flat.
    The SQL is dialect-neutral and shared VERBATIM with the oracle.
    Arguments may be compound expressions — every substitution is
    parenthesized (a bare '-{ns}' would mis-negate 'a - b')."""
    ns, ew = f"({ns})", f"({ew})"
    return (
        # NULL inputs must not fall through every comparison into the
        # ELSE 7 (NW) arm — a null gradient propagates as NULL octant
        # (same text on both engines, so parity is preserved).
        f"CASE WHEN {ns} IS NULL OR {ew} IS NULL THEN NULL"
        f" WHEN {ns} = 0 AND {ew} = 0 THEN -1"
        f" WHEN {ew} >= 0 AND {ns} > 0 AND {ns} >= {ew} THEN 0"
        f" WHEN {ew} > 0 AND {ns} > 0 THEN 1"
        f" WHEN {ew} > 0 AND {ns} <= 0 AND {ew} >= -{ns} THEN 2"
        f" WHEN {ew} > 0 AND {ns} < 0 THEN 3"
        f" WHEN {ew} <= 0 AND {ns} < 0 AND -{ns} >= -{ew} THEN 4"
        f" WHEN {ew} < 0 AND {ns} < 0 THEN 5"
        f" WHEN {ew} < 0 AND {ns} >= 0 AND -{ew} >= {ns} THEN 6"
        f" ELSE 7 END"
    )


def latlon_to_m_factors(y_min: float, y_max: float) -> tuple[float, float]:
    """The reference's factor='latlonToM' scaling (raster.py:707-715):
    meters per degree at the raster's mid latitude. Computed DRIVER-
    side so both the Spark kernel and the SQL oracle receive the same
    float literal (cos is libm — never evaluate it engine-side)."""
    import math

    lat_mid = (y_max + y_min) / 2.0
    deg_to_rad = math.pi / 180.0
    y_factor = 6371000.0 * deg_to_rad
    x_factor = y_factor * math.cos(lat_mid * deg_to_rad)
    return x_factor, y_factor


def gradient_fields(
    tiles: DataFrame,
    factor="latlonToM",
    dx: float | None = None,
    dy: float | None = None,
) -> DataFrame:
    """Whole-raster central-difference gradient fields (reference
    gradient, raster.py:640-753; stencil :724-740):

      ns = (south - north) / (2*dy*yFactor)   (0 on the raster's top
      ew = (west - east)  / (2*dx*xFactor)     and bottom / left and
                                               right border rows/cols)

    Returns (tile_x, tile_y, ns array<double>, ew array<double>) — one
    halo pass produces both fields; the mode wrappers (slope / aspect)
    derive from them JVM-side. The halo is the 4-neighbor CROSS (5
    copies), not the 9-copy box: the stencil never reads diagonals, so
    the shuffle moves 5x tile bytes instead of 9x.

    factor: 'latlonToM' (meters-per-degree at mid latitude, the
    reference's terrain-analysis default) or a number or (xf, yf)."""
    from ..constants import PIX_DX, PIX_DY, YMAX, YMIN

    if dx is None:
        dx = PIX_DX
    if dy is None:
        dy = PIX_DY
    if factor == "latlonToM":
        xf, yf = latlon_to_m_factors(YMIN, YMAX)
    else:
        try:
            xf, yf = factor
        except TypeError:
            xf = yf = float(factor)
    den_x = 2.0 * float(dx) * float(xf)
    den_y = 2.0 * float(dy) * float(yf)

    offsets = F.array(
        *[
            F.struct(F.lit(dx_).alias("dx"), F.lit(dy_).alias("dy"))
            for dx_, dy_ in ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))
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

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tgt_x"].iloc[0])
        ty = int(pdf["tgt_y"].iloc[0])
        padded = np.zeros((T + 2, T + 2), dtype=np.float64)
        for r in pdf.itertuples():
            block = np.asarray(r.data, dtype=np.float64).reshape(T, T)
            oy = (r.tile_y - ty) * T + 1
            ox = (r.tile_x - tx) * T + 1
            ys = slice(max(oy, 0), min(oy + T, T + 2))
            xs = slice(max(ox, 0), min(ox + T, T + 2))
            if ys.start >= ys.stop or xs.start >= xs.stop:
                continue
            padded[ys, xs] = block[
                ys.start - oy : ys.stop - oy, xs.start - ox : xs.stop - ox
            ]
        core = slice(1, T + 1)
        # y-at-top matrix: row iy+1 is SOUTH of row iy
        ns = (padded[2:, core] - padded[:-2, core]) / den_y
        ew = (padded[core, :-2] - padded[core, 2:]) / den_x
        # reference zeroes the raster's outermost rows / cols
        gy = np.arange(ty * T, ty * T + T)
        gx = np.arange(tx * T, tx * T + T)
        ns[(gy == 0) | (gy == RASTER_H - 1), :] = 0.0
        ew[:, (gx == 0) | (gx == RASTER_W - 1)] = 0.0
        return pd.DataFrame(
            [{"tile_x": tx, "tile_y": ty,
              "ns": ns.ravel(), "ew": ew.ravel()}]
        )

    return exploded.groupBy("tgt_x", "tgt_y").applyInPandas(
        per_tile,
        schema=(
            "tile_x int, tile_y int, ns array<double>, ew array<double>"
        ),
    )


def gradient_tiles(
    tiles: DataFrame, mode: str = "total", factor="latlonToM"
) -> DataFrame:
    """Reference gradient mode surface (raster.py:692-753): returns a
    tile table (tile_x, tile_y, data) for mode in
    total|slope|north-south|ns|east-west|ew|aspect|dir. slope/aspect
    combine the two fields per pixel JVM-side (zip_with; sqrt is
    IEEE-correctly-rounded — oracle-safe; atan2 is libm —
    pytest-verified like lanczos)."""
    acceptable = {
        "total", "slope", "north-south", "ns", "east-west", "ew",
        "aspect", "dir",
    }
    if mode not in acceptable:
        raise ValueError(f"gradient mode {mode!r} not in {sorted(acceptable)}")
    g = gradient_fields(tiles, factor)
    if mode in ("north-south", "ns"):
        data = F.col("ns")
    elif mode in ("east-west", "ew"):
        data = F.col("ew")
    elif mode in ("total", "slope"):
        data = F.zip_with(
            "ns", "ew", lambda a, b: F.sqrt(a * a + b * b)
        )
    else:  # aspect / dir: radians, 0 = east
        data = F.zip_with("ns", "ew", lambda a, b: F.atan2(a, b))
    return g.select("tile_x", "tile_y", data.alias("data"))


def tile_sums(tiles: DataFrame) -> DataFrame:
    """(tile_x, tile_y, sum_v): exact per-tile content sums (the
    oracle-comparable aggregate of any tile transform)."""
    return tiles.select(
        "tile_x",
        "tile_y",
        F.aggregate("data", F.lit(0.0), lambda a, x: a + x).alias("sum_v"),
    )
