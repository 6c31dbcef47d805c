"""warp_to_grid stencil algs + warp_aggregate vs single-node numpy.

Covers the reference warp resampleAlg list (raster.py:2142-2157):
near/bilinear/cubic/cubicspline have bit-exact SQL oracles in the
driver contract; here we verify lanczos (libm sin is not
oracle-mirrorable) and the shared invariants of every kernel.
"""

import numpy as np
import pytest

from geokit_spark.constants import (
    PIX_DX, PIX_DY, RASTER_H, RASTER_W, TILE_SIZE, XMIN, YMAX,
)
from geokit_spark.kernels.raster_fields import elev_value
from geokit_spark.operators.warp import (
    WARP_DXT, WARP_DYT, WARP_H, WARP_W,
    _bspline_w, _catmull_w, _lanczos_w, warp_aggregate, warp_to_grid,
)
from geokit_spark.sources import tiles as tilesrc


@pytest.fixture(scope="module")
def elev_tiles(spark):
    return tilesrc.raster_table(spark, "elev").cache()


def _field():
    ix, iy = np.meshgrid(np.arange(RASTER_W), np.arange(RASTER_H))
    return elev_value(ix, iy).astype(np.float64)


def _numpy_stencil(alg: str) -> np.ndarray:
    """Single-node reference resample using the same kernels."""
    half = 2 if alg == "lanczos" else 1
    wfn = {"cubic": _catmull_w, "cubicspline": _bspline_w,
           "lanczos": _lanczos_w}[alg]
    ntaps = 2 * half + 2
    f = _field()
    jx, jy = np.meshgrid(np.arange(WARP_W), np.arange(WARP_H))
    cx = XMIN + (jx + 0.5) * WARP_DXT
    cy = YMAX - (jy + 0.5) * WARP_DYT
    gx = (cx - XMIN) / PIX_DX - 0.5
    gy = (YMAX - cy) / PIX_DY - 0.5
    ixb = np.clip(np.floor(gx), half, RASTER_W - half - 2).astype(np.int64)
    iyb = np.clip(np.floor(gy), half, RASTER_H - half - 2).astype(np.int64)
    fx = gx - ixb
    fy = gy - iyb
    wxs = [wfn(fx - (k - half)) for k in range(ntaps)]
    wys = [wfn(fy - (k - half)) for k in range(ntaps)]
    num = np.zeros_like(fx)
    for ky in range(ntaps):
        row = np.zeros_like(fx)
        for kx in range(ntaps):
            row = row + wxs[kx] * f[iyb + (ky - half), ixb + (kx - half)]
        num = num + wys[ky] * row
    if alg == "lanczos":
        num = num / (sum(wxs) * sum(wys))
    return num


@pytest.mark.parametrize("alg", ["cubic", "cubicspline", "lanczos"])
def test_stencil_matches_numpy(spark, elev_tiles, alg):
    out = warp_to_grid(elev_tiles, alg=alg).toPandas()
    got = np.full((WARP_H, WARP_W), np.nan)
    got[out["jy"].to_numpy(), out["jx"].to_numpy()] = out["value"].to_numpy()
    exp = _numpy_stencil(alg)
    assert np.array_equal(got, exp)  # bit-identical: same kernel fns


def test_kernels_partition_of_unity():
    # every reconstruction kernel's 4 (or 6, normalized) taps sum to 1
    u = np.linspace(0.0, 1.0, 101)
    for wfn, half in [(_catmull_w, 1), (_bspline_w, 1)]:
        taps = sum(wfn(u - (k - half)) for k in range(2 * half + 2))
        assert np.allclose(taps, 1.0, atol=1e-12)
    # lanczos is normalized explicitly; after normalization a constant
    # field must be reproduced exactly at every phase
    const = np.full((WARP_H, WARP_W), 7.25)
    # emulate: num / (sx*sy) with f == const -> const
    taps = sum(_lanczos_w(u - (k - 2)) for k in range(6))
    assert np.all(taps > 0.5)  # truncated sinc never degenerates


def test_lanczos_constant_field_exact(spark):
    t = TILE_SIZE
    ntx = RASTER_W // t
    rows = [
        (tx, ty, [13.5] * (t * t))
        for tx in range(ntx) for ty in range(RASTER_H // t)
    ]
    tiles = spark.createDataFrame(
        rows, "tile_x int, tile_y int, data array<double>"
    )
    out = warp_to_grid(tiles, alg="lanczos").toPandas()
    assert np.allclose(out["value"].to_numpy(), 13.5, atol=1e-12)


def test_warp_aggregate_matches_numpy(spark, elev_tiles):
    out = warp_aggregate(elev_tiles).toPandas().set_index(["jx", "jy"])
    f = _field()
    ix, iy = np.meshgrid(np.arange(RASTER_W), np.arange(RASTER_H))
    px = XMIN + (ix + 0.5) * PIX_DX
    py = YMAX - (iy + 0.5) * PIX_DY
    jx = np.floor((px - XMIN) / WARP_DXT).astype(np.int64)
    jy = np.floor((YMAX - py) / WARP_DYT).astype(np.int64)
    rng = np.random.default_rng(7)
    for _ in range(25):
        tx, ty = int(rng.integers(WARP_W)), int(rng.integers(WARP_H))
        m = (jx == tx) & (jy == ty)
        v = np.sort(f[m])
        row = out.loc[(tx, ty)]
        assert row["n"] == len(v)
        assert row["min_v"] == v.min() and row["max_v"] == v.max()
        assert row["sum_v"] == v.sum()
        assert row["avg_v"] == v.sum() / len(v)
        assert row["med_v"] == np.quantile(v, 0.5)
        assert row["q1_v"] == np.quantile(v, 0.25)
        assert row["q3_v"] == np.quantile(v, 0.75)
        vals, cnt = np.unique(v, return_counts=True)
        assert row["mode_v"] == vals[cnt == cnt.max()].min()


def test_stencil_plan_has_bounded_fanout(spark, elev_tiles):
    # the skeleton join must not broadcast/shuffle the full source per
    # target tile: the exploded key count is bounded
    df = warp_to_grid(elev_tiles, alg="cubic")
    plan = df._sc is not None and df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_warp_cutline(spark, elev_tiles):
    from geokit_spark import fixtures
    from geokit_spark.kernels.pip import points_in_poly
    from geokit_spark.operators.warp import warp_cutline

    w = warp_to_grid(elev_tiles, alg="near")
    out = warp_cutline(w, fixtures.REGION_VERTS).toPandas()
    cx = XMIN + (out["jx"].to_numpy() + 0.5) * WARP_DXT
    cy = YMAX - (out["jy"].to_numpy() + 0.5) * WARP_DYT
    inside = points_in_poly(cx, cy, fixtures.REGION_VERTS)
    vals = out["value"].to_numpy()
    assert (vals[~inside] == -9999.0).all()
    assert (vals[inside] != -9999.0).all()
    assert 0 < inside.sum() < len(out)


def test_mosaic_custom_combiner(spark, elev_tiles):
    from pyspark.sql import functions as F

    from geokit_spark.operators.warp import mosaic_last_wins

    a = elev_tiles
    b = elev_tiles.select(
        "tile_x", "tile_y",
        F.transform("data", lambda x: x + F.lit(10.0)).alias("data"),
    )
    # combiningFunc hook: per-pixel max instead of last-wins
    out = mosaic_last_wins([a, b], combiner=lambda x, y: F.greatest(x, y))
    s = out.select(
        F.sum(F.aggregate("data", F.lit(0.0), lambda acc, v: acc + v))
    ).collect()[0][0]
    s_a = a.select(
        F.sum(F.aggregate("data", F.lit(0.0), lambda acc, v: acc + v))
    ).collect()[0][0]
    # max(v, v+10) == v+10 everywhere
    assert s == s_a + 10.0 * RASTER_W * RASTER_H


def test_warp_offset_origin(spark, elev_tiles):
    """Regression: a target origin away from the raster corner must
    join the RIGHT source tiles (the tile-range arithmetic once
    ignored ox/oy and indexed past the assembled patch)."""
    ox = XMIN + 100.5 * PIX_DX
    oy = YMAX - 37.25 * PIX_DY
    out = warp_to_grid(
        elev_tiles, ox=ox, oy=oy, w=96, h=96, alg="near"
    ).toPandas()
    assert len(out) == 96 * 96
    f = _field()
    jx = out["jx"].to_numpy()
    jy = out["jy"].to_numpy()
    cx = ox + (jx + 0.5) * WARP_DXT
    cy = oy - (jy + 0.5) * WARP_DYT
    ix = np.clip(np.floor((cx - XMIN) / PIX_DX), 0, RASTER_W - 1).astype(int)
    iy = np.clip(np.floor((YMAX - cy) / PIX_DY), 0, RASTER_H - 1).astype(int)
    assert np.array_equal(out["value"].to_numpy(), f[iy, ix])
