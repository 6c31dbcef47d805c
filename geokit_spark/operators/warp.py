"""Resampling + mosaic operators.

* scale_down / scale_up — the reference's scaleMatrix block-average
  downsample / block-repeat upsample (util.py:113-253), per tile with
  numpy reshape (no cross-tile traffic when the factor divides the
  tile size — the layout invariant the tile grid is designed for).
* warp 'average' to an arbitrary coarser grid == scale_down followed
  by regrouping — the regrid-aggregate path of reference warp
  (raster.py:2140-2418, 'average' resampleAlg).
* warp_to_grid — 'near' / 'bilinear' resampling onto an ARBITRARY
  target grid (reference warp resampleAlg list raster.py:2142-2157):
  the tile-regridding join of SURVEY §2.6 — each target tile equijoins
  the bounded set of source tiles it reads from, then a vectorized
  numpy gather/interpolation per target tile. The source side shuffles
  only the overlapped tiles; nothing is broadcast, so the pattern
  holds when the source raster is 100 TB.
* mosaic_last_wins — combineSimilarRasters semantics: later source
  wins on non-noData pixels (combineSimilarRasters.py:179-188),
  as a JVM zip_with fold over priority-ordered tile tables.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import (
    PIX_DX,
    PIX_DY,
    RASTER_H,
    RASTER_W,
    TILE_SIZE,
    XMIN,
    YMAX,
)


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


# default driver-query target grid: full source extent regridded at a
# non-integer 1.6x coarser resolution (exercises true regridding, not
# the aligned block fast path)
WARP_W = 320
WARP_H = 320
WARP_DXT = PIX_DX * 1.6
WARP_DYT = PIX_DY * 1.6


def _catmull_w(x: np.ndarray) -> np.ndarray:
    """Catmull-Rom (a=-0.5) kernel weight — Horner form mirrored
    literally by the SQL oracle (only +,-,*,abs)."""
    ax = np.abs(x)
    inner = ((1.5 * ax - 2.5) * ax) * ax + 1.0
    outer = ((-0.5 * ax + 2.5) * ax - 4.0) * ax + 2.0
    return np.where(ax <= 1.0, inner, np.where(ax < 2.0, outer, 0.0))


def _bspline_w(x: np.ndarray) -> np.ndarray:
    """Cubic B-spline reconstruction kernel (GDAL 'cubicspline') —
    Horner form mirrored by the SQL oracle."""
    ax = np.abs(x)
    inner = (4.0 - 6.0 * (ax * ax) + 3.0 * ((ax * ax) * ax)) / 6.0
    t2 = 2.0 - ax
    outer = (t2 * t2 * t2) / 6.0
    return np.where(ax <= 1.0, inner, np.where(ax < 2.0, outer, 0.0))


def _lanczos_w(x: np.ndarray) -> np.ndarray:
    """Lanczos a=3 windowed sinc (sin-based — verified by pytest
    goldens, not the SQL oracle: libm sin differs across engines)."""
    ax = np.abs(x)
    px = np.pi * x
    with np.errstate(invalid="ignore", divide="ignore"):
        w = np.where(
            ax < 1e-12,
            1.0,
            3.0 * np.sin(px) * np.sin(px / 3.0) / (px * px),
        )
    return np.where(ax < 3.0, w, 0.0)


def lanczos_tables(
    ox: float = XMIN,
    oy: float = YMAX,
    dxt: float = WARP_DXT,
    dyt: float = WARP_DYT,
    w: int = WARP_W,
    h: int = WARP_H,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Driver-side exact lanczos weight tables per target pixel index.

    sin is libm — it can never be evaluated engine-side in an
    oracle-compared query (JVM/numpy/DuckDB differ by ULPs). But for a
    FIXED target grid the fractional stencil offset is a pure function
    of the pixel index (the same IEEE +,-,*,/ /floor/clamp tree both
    engines evaluate), so the weights form a finite per-index table.
    This computes that table ONCE with python math.sin and both
    engines consume the identical float64 values — the Spark kernel by
    array lookup (warp_to_grid(..., lanczos_exact=True)), the DuckDB
    oracle as CAST('<repr>' AS DOUBLE) literals (the table IS the
    parity contract; cf. the same driver-side-constants rule used by
    latlon_to_m_factors). Returns (wx[w,6], sx[w], wy[h,6], sy[h])
    with sx/sy the left-assoc weight sums used for normalization."""
    import math

    def axis(n, grid, src_n):
        wt = np.empty((n, 6), dtype=np.float64)
        st = np.empty(n, dtype=np.float64)
        for j in range(n):
            g = grid(j)  # same IEEE expression tree as the kernel
            ib = min(max(math.floor(g), 2), src_n - 4)
            f = g - float(ib)
            for k in range(6):
                x = f - float(k - 2)
                if abs(x) < 1e-12:
                    wt[j, k] = 1.0
                elif abs(x) < 3.0:
                    px = math.pi * x
                    wt[j, k] = (
                        3.0 * math.sin(px) * math.sin(px / 3.0) / (px * px)
                    )
                else:
                    wt[j, k] = 0.0
            st[j] = sum(wt[j, k] for k in range(6))
        return wt, st

    oxl, oyl, dxl, dyl = float(ox), float(oy), float(dxt), float(dyt)
    wx, sx = axis(
        w,
        lambda j: ((oxl + (float(j) + 0.5) * dxl) - XMIN) / PIX_DX - 0.5,
        RASTER_W,
    )
    wy, sy = axis(
        h,
        lambda j: (YMAX - (oyl - (float(j) + 0.5) * dyl)) / PIX_DY - 0.5,
        RASTER_H,
    )
    return wx, sx, wy, sy


def warp_to_grid(
    tiles: DataFrame,
    ox: float = XMIN,
    oy: float = YMAX,
    dxt: float = WARP_DXT,
    dyt: float = WARP_DYT,
    w: int = WARP_W,
    h: int = WARP_H,
    alg: str = "near",
    lanczos_exact: bool = False,
) -> DataFrame:
    """Resample the source tile table onto the target grid
    (origin (ox, oy-at-top), pixel size (dxt, dyt), w x h pixels).
    Stencil algs of the reference warp resampleAlg list
    (raster.py:2142-2157):
      'near'        enclosing source pixel
      'bilinear'    2x2 stencil at the target pixel center
      'cubic'       4x4 Catmull-Rom (same kernel as interpolate_cubic)
      'cubicspline' 4x4 cubic B-spline reconstruction (smoothing)
      'lanczos'     6x6 windowed-sinc, a=3, weight-normalized
    Stencil origins are clamped at source borders. Returns
    (jx, jy, value) target-pixel rows.

    Physical shape: target-tile skeleton (spark.range) exploded to the
    source tile keys each target tile reads → equijoin with the source
    tile table → groupBy(target tile) → one vectorized numpy resample
    per target tile. Source-tile fan-out per target tile is bounded by
    ceil(T*dxt/PIX_DX/T)+1 — constant, so the join scales linearly."""
    t = TILE_SIZE
    ntx = math.ceil(w / t)
    nty = math.ceil(h / t)
    spark = tiles.sparkSession
    ntx_src = RASTER_W // t
    nty_src = RASTER_H // t

    skel = spark.range(ntx * nty).select(
        (F.col("id") % ntx).cast("int").alias("ttx"),
        (F.col("id") / ntx).cast("int").alias("tty"),
    )
    # source tile range each target tile needs (per-alg stencil
    # margin in source px), computed driver-free as column arithmetic;
    # off_x/off_y translate the TARGET origin into the source frame
    # (review fix: an ox/oy away from the raster corner used to join
    # the wrong source tiles while pixel indices used the true origin)
    margins = {"near": 1.0, "bilinear": 1.0, "cubic": 2.0,
               "cubicspline": 2.0, "lanczos": 3.0}
    if alg not in margins:
        raise ValueError(f"unsupported warp alg {alg!r}")
    margin = margins[alg]
    off_x = float(ox) - XMIN
    off_y = YMAX - float(oy)
    x_lo = (off_x + F.col("ttx") * t * dxt - margin * PIX_DX) / (t * PIX_DX)
    x_hi = (off_x + (F.col("ttx") + 1) * t * dxt + margin * PIX_DX) / (t * PIX_DX)
    y_lo = (off_y + F.col("tty") * t * dyt - margin * PIX_DY) / (t * PIX_DY)
    y_hi = (off_y + (F.col("tty") + 1) * t * dyt + margin * PIX_DY) / (t * PIX_DY)
    sx0 = F.greatest(F.floor(x_lo).cast("int"), F.lit(0))
    sx1 = F.least(F.floor(x_hi).cast("int"), F.lit(ntx_src - 1))
    sy0 = F.greatest(F.floor(y_lo).cast("int"), F.lit(0))
    sy1 = F.least(F.floor(y_hi).cast("int"), F.lit(nty_src - 1))
    # Target tiles entirely outside the source raster clamp to
    # sx0 > sx1 (or sy0 > sy1); F.sequence would silently generate a
    # DESCENDING key list that joins the border tile by accident.
    # Filter them explicitly: out-of-coverage target tiles emit no
    # rows (the noData semantics of a warp past the source extent).
    keys = (
        skel.withColumn("sx0", sx0).withColumn("sx1", sx1)
        .withColumn("sy0", sy0).withColumn("sy1", sy1)
        .filter(
            (F.col("sx0") <= F.col("sx1")) & (F.col("sy0") <= F.col("sy1"))
        )
        .withColumn("tile_x", F.explode(F.sequence("sx0", "sx1")))
        .withColumn("tile_y", F.explode(F.sequence("sy0", "sy1")))
        .drop("sx0", "sx1", "sy0", "sy1")
    )
    joined = keys.join(tiles, ["tile_x", "tile_y"], "inner")

    oxl, oyl, dxl, dyl = float(ox), float(oy), float(dxt), float(dyt)
    # oracle-grade lanczos: weights from the driver-computed per-index
    # table (shared verbatim with the SQL oracle) instead of np.sin
    lz = (
        lanczos_tables(ox, oy, dxt, dyt, w, h)
        if (alg == "lanczos" and lanczos_exact)
        else None
    )

    def per_target(pdf: pd.DataFrame) -> pd.DataFrame:
        ttx = int(pdf["ttx"].iloc[0])
        tty = int(pdf["tty"].iloc[0])
        sxs = pdf["tile_x"].to_numpy()
        sys_ = pdf["tile_y"].to_numpy()
        mx0, my0 = int(sxs.min()), int(sys_.min())
        pw = (int(sxs.max()) - mx0 + 1) * t
        ph = (int(sys_.max()) - my0 + 1) * t
        patch = np.full((ph, pw), np.nan)
        for r in pdf.itertuples():
            patch[
                (r.tile_y - my0) * t : (r.tile_y - my0 + 1) * t,
                (r.tile_x - mx0) * t : (r.tile_x - mx0 + 1) * t,
            ] = np.asarray(r.data, dtype=np.float64).reshape(t, t)

        jx = np.arange(ttx * t, min((ttx + 1) * t, w), dtype=np.int64)
        jy = np.arange(tty * t, min((tty + 1) * t, h), dtype=np.int64)
        gjx, gjy = np.meshgrid(jx, jy)
        # target pixel centers — same expression tree as the SQL oracle
        cx = oxl + (gjx.astype(np.float64) + 0.5) * dxl
        cy = oyl - (gjy.astype(np.float64) + 0.5) * dyl
        if alg == "near":
            ix = np.minimum(
                np.maximum(np.floor((cx - XMIN) / PIX_DX), 0.0), RASTER_W - 1
            ).astype(np.int64)
            iy = np.minimum(
                np.maximum(np.floor((YMAX - cy) / PIX_DY), 0.0), RASTER_H - 1
            ).astype(np.int64)
            val = patch[iy - my0 * t, ix - mx0 * t]
        elif alg == "bilinear":
            gx = (cx - XMIN) / PIX_DX - 0.5
            gy = (YMAX - cy) / PIX_DY - 0.5
            ix0 = np.minimum(np.maximum(np.floor(gx), 0.0), RASTER_W - 2).astype(np.int64)
            iy0 = np.minimum(np.maximum(np.floor(gy), 0.0), RASTER_H - 2).astype(np.int64)
            fx = gx - ix0
            fy = gy - iy0
            px = ix0 - mx0 * t
            py = iy0 - my0 * t
            v00 = patch[py, px]
            v10 = patch[py, px + 1]
            v01 = patch[py + 1, px]
            v11 = patch[py + 1, px + 1]
            val = (
                v00 * (1.0 - fx) * (1.0 - fy)
                + v10 * fx * (1.0 - fy)
                + v01 * (1.0 - fx) * fy
                + v11 * fx * fy
            )
        elif alg in ("cubic", "cubicspline", "lanczos"):
            half = 1 if alg != "lanczos" else 2
            ntaps = 2 * half + 2
            gx = (cx - XMIN) / PIX_DX - 0.5
            gy = (YMAX - cy) / PIX_DY - 0.5
            ixb = np.minimum(
                np.maximum(np.floor(gx), half), RASTER_W - half - 2
            ).astype(np.int64)
            iyb = np.minimum(
                np.maximum(np.floor(gy), half), RASTER_H - half - 2
            ).astype(np.int64)
            fx = gx - ixb
            fy = gy - iyb
            if alg == "cubic":
                wxs = [_catmull_w(fx - (k - half)) for k in range(ntaps)]
                wys = [_catmull_w(fy - (k - half)) for k in range(ntaps)]
            elif alg == "cubicspline":
                wxs = [_bspline_w(fx - (k - half)) for k in range(ntaps)]
                wys = [_bspline_w(fy - (k - half)) for k in range(ntaps)]
            elif lz is not None:
                wxt, sxt, wyt, syt = lz
                wxs = [wxt[gjx, k] for k in range(ntaps)]
                wys = [wyt[gjy, k] for k in range(ntaps)]
            else:
                wxs = [_lanczos_w(fx - (k - half)) for k in range(ntaps)]
                wys = [_lanczos_w(fy - (k - half)) for k in range(ntaps)]
            num = np.zeros_like(fx)
            for ky in range(ntaps):
                row = np.zeros_like(fx)
                for kx in range(ntaps):
                    v = patch[
                        iyb + (ky - half) - my0 * t,
                        ixb + (kx - half) - mx0 * t,
                    ]
                    row = row + wxs[kx] * v
                num = num + wys[ky] * row
            if alg == "lanczos":  # GDAL normalizes the truncated sinc
                sx = sum(wxs)
                sy = sum(wys)
                val = num / (sx * sy)
            else:
                val = num
        else:
            raise ValueError(f"unsupported warp alg {alg!r}")
        return pd.DataFrame(
            {
                "jx": gjx.ravel().astype("int32"),
                "jy": gjy.ravel().astype("int32"),
                "value": val.ravel(),
            }
        )

    return joined.groupBy("ttx", "tty").applyInPandas(
        per_target, schema="jx int, jy int, value double"
    )


def warp_cutline(
    warped: DataFrame,
    cutline_verts,
    ox: float = XMIN,
    oy: float = YMAX,
    dxt: float = WARP_DXT,
    dyt: float = WARP_DYT,
    nodata: float = -9999.0,
) -> DataFrame:
    """GDAL warp's `cutline` option (reference raster.py:2226-2238):
    target pixels whose centers fall outside the cutline polygon are
    set to noData. Pure JVM: the ray-casting crossing test on the
    target pixel center as a codegen expression over the warped
    (jx, jy, value) rows — composes with any warp_to_grid /
    warp_aggregate output. cropToCutline == a subsequent
    filter(value != nodata) or jx/jy range filter."""
    from ..functions.geo import pip_literal_col

    cx = F.lit(float(ox)) + (F.col("jx").cast("double") + F.lit(0.5)) * F.lit(float(dxt))
    cy = F.lit(float(oy)) - (F.col("jy").cast("double") + F.lit(0.5)) * F.lit(float(dyt))
    inside = pip_literal_col(cx, cy, cutline_verts)
    return warped.withColumn(
        "value",
        F.when(inside, F.col("value")).otherwise(F.lit(float(nodata))),
    )


def warp_aggregate(
    tiles: DataFrame,
    ox: float = XMIN,
    oy: float = YMAX,
    dxt: float = WARP_DXT,
    dyt: float = WARP_DYT,
    w: int = WARP_W,
    h: int = WARP_H,
) -> DataFrame:
    """The aggregating resampleAlgs of reference warp
    (raster.py:2142-2157): average / min / max / med / q1 / q3 / sum /
    rms / mode in ONE pass onto an arbitrary coarser target grid. Each
    source pixel belongs to exactly one target pixel (the one whose
    footprint contains its center — a deviation from GDAL's
    area-weighted 'average' documented in COVERAGE.md), so the whole
    operator is posexplode → JVM column arithmetic → ONE hash
    aggregation with map-side partials. No Python in the hot path;
    mode is a second agg on the same key (AQE coalesces), tie-broken
    to the smallest value so the result is deterministic.

    Returns (jx, jy, n, avg_v, min_v, max_v, med_v, q1_v, q3_v, sum_v,
    rms_v, mode_v)."""
    t = TILE_SIZE
    px = tiles.select(
        "tile_x", "tile_y", F.posexplode("data").alias("pos", "value")
    ).select(
        (F.col("tile_x") * t + F.col("pos") % t).alias("ix"),
        (F.col("tile_y") * t + (F.col("pos") / t).cast("int")).alias("iy"),
        "value",
    )
    sx = XMIN + (F.col("ix").cast("double") + F.lit(0.5)) * F.lit(PIX_DX)
    sy = YMAX - (F.col("iy").cast("double") + F.lit(0.5)) * F.lit(PIX_DY)
    binned = px.select(
        F.floor((sx - F.lit(float(ox))) / F.lit(float(dxt))).cast("int").alias("jx"),
        F.floor((F.lit(float(oy)) - sy) / F.lit(float(dyt))).cast("int").alias("jy"),
        "value",
    ).where(
        (F.col("jx") >= 0) & (F.col("jx") < w)
        & (F.col("jy") >= 0) & (F.col("jy") < h)
    )
    stats = binned.groupBy("jx", "jy").agg(
        F.count("value").alias("n"),
        (F.sum("value") / F.count("value").cast("double")).alias("avg_v"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
        # med/q1/q3 are computed over values quantized to 2^-10 units:
        # an interpolated quantile of INTEGER-grid inputs at frac
        # k/4 is a dyadic rational, exactly representable and identical
        # under any lerp formula — which keeps the DuckDB oracle
        # comparison bit-exact by construction instead of by luck
        # (percentile interpolation trees differ between engines).
        (F.expr("percentile(floor(value * 1024D), 0.5D)") / F.lit(1024.0)).alias("med_v"),
        (F.expr("percentile(floor(value * 1024D), 0.25D)") / F.lit(1024.0)).alias("q1_v"),
        (F.expr("percentile(floor(value * 1024D), 0.75D)") / F.lit(1024.0)).alias("q3_v"),
        F.sum("value").alias("sum_v"),
        # rms over integer-valued pixels: sum of exact squares /
        # count, then IEEE sqrt — bit-exact vs the oracle
        F.sqrt(
            F.sum(F.col("value") * F.col("value"))
            / F.count("value").cast("double")
        ).alias("rms_v"),
    )
    mode = (
        binned.groupBy("jx", "jy", "value")
        .count()
        .groupBy("jx", "jy")
        .agg(
            F.max(
                F.struct(F.col("count"), (-F.col("value")).alias("nv"))
            ).alias("top")
        )
        .select("jx", "jy", (-F.col("top.nv")).alias("mode_v"))
    )
    return stats.join(mode, ["jx", "jy"], "inner")


def mosaic_last_wins(
    layers: list[DataFrame], nodata: float = -9999.0, combiner=None
) -> DataFrame:
    """Merge same-grid tile tables; for each pixel the LAST layer's
    non-noData value wins (reference combineSimilarRasters merge rule,
    combineSimilarRasters.py:179-188). Pure JVM: full-outer joins on
    the tile key + zip_with coalesce fold.

    combiner: optional (acc: Column, nxt: Column) -> Column hook — the
    reference's combiningFunc parameter (combineSimilarRasters.py:
    38-58). It is applied per pixel inside the JVM zip_with lambda
    (so it must be built from pyspark.sql.functions Column ops, the
    engine's UDF-surface contract for raster combiners); default is
    the last-non-noData rule."""
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
                    combiner
                    if combiner is not None
                    else lambda a, b: F.when(b != F.lit(nodata), b)
                    .otherwise(a),
                ).alias("acc"),
            )
        )
    return out.select("tile_x", "tile_y", F.col("acc").alias("data"))
