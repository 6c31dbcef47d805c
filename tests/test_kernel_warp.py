"""Halo-exchange kernel + scaleMatrix + mosaic tests vs numpy oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geokit_spark.constants import RASTER_H, RASTER_W, TILE_SIZE
from geokit_spark.kernels.raster_fields import elev_value
from geokit_spark.operators.kernel import kernel_filter_tiles, tile_sums
from geokit_spark.operators.warp import (
    mosaic_last_wins, scale_down_tiles, scale_up_tiles,
)
from geokit_spark.sources import tiles as tilesrc


@pytest.fixture(scope="module")
def elev_tiles(spark):
    return tilesrc.raster_table(spark, "elev").cache()


def _full():
    ix, iy = np.meshgrid(np.arange(RASTER_W), np.arange(RASTER_H))
    return elev_value(ix, iy).astype(np.float64)


def test_kernel_max3_matches_numpy(spark, elev_tiles):
    got = (
        kernel_filter_tiles(elev_tiles, "max", 1, 0.0)
        .toPandas()
        .sort_values(["tile_x", "tile_y"])
    )
    full = _full()
    padded = np.zeros((RASTER_H + 2, RASTER_W + 2))
    padded[1:-1, 1:-1] = full
    win = np.lib.stride_tricks.sliding_window_view(padded, (3, 3))
    expected = win.max(axis=(2, 3))
    for r in got.itertuples():
        block = expected[
            r.tile_y * TILE_SIZE : (r.tile_y + 1) * TILE_SIZE,
            r.tile_x * TILE_SIZE : (r.tile_x + 1) * TILE_SIZE,
        ]
        assert np.array_equal(
            np.asarray(r.data).reshape(TILE_SIZE, TILE_SIZE), block
        ), (r.tile_x, r.tile_y)


def test_kernel_mean_cross_tile_continuity(spark, elev_tiles):
    """Mean kernel across a tile seam must use neighbor values, not
    edge padding — checks the halo exchange specifically."""
    got = (
        kernel_filter_tiles(elev_tiles, "mean", 1, 0.0)
        .filter((F.col("tile_x") == 1) & (F.col("tile_y") == 1))
        .collect()[0]
    )
    full = _full()
    m = np.asarray(got.data).reshape(TILE_SIZE, TILE_SIZE)
    # pixel at tile-local (0,0) = global (64,64): window fully interior
    expected = full[63:66, 63:66].mean()
    assert m[0, 0] == expected


def test_scale_down_matches_numpy(spark, elev_tiles):
    got = (
        scale_down_tiles(elev_tiles, 8)
        .toPandas()
        .set_index(["block_x", "block_y"])["value"]
    )
    full = _full()
    nb = RASTER_W // 8
    blocks = full.reshape(nb, 8, nb, 8).sum(axis=(1, 3)) / 64.0
    for (bx, by), v in got.items():
        assert v == blocks[by, bx]
    assert len(got) == nb * nb


def test_scale_up_then_down_identity(spark, elev_tiles):
    up = scale_up_tiles(elev_tiles, 2)
    down = scale_down_tiles(up, 2).toPandas()
    full = _full()
    # block grid of the downsample of the upsample = original pixels
    nb = TILE_SIZE // 2
    assert len(down) == (RASTER_W * 2 // 2) * (RASTER_H * 2 // 2) // (nb * nb) * (nb * nb)
    sample = down.set_index(["block_x", "block_y"])["value"]
    for (bx, by) in [(0, 0), (100, 37), (511, 511)]:
        assert sample[(bx, by)] == full[by, bx]


def test_mosaic_last_wins(spark, elev_tiles):
    patch = tilesrc.patch_raster_table(spark)
    merged = mosaic_last_wins([elev_tiles, patch])
    sums = tile_sums(merged).toPandas().set_index(["tile_x", "tile_y"])["sum_v"]
    full = _full()
    from geokit_spark.sources.tiles import PATCH_X0, PATCH_X1, PATCH_Y0, PATCH_Y1

    iy, ix = np.indices(full.shape)
    inpatch = (ix >= PATCH_X0) & (ix < PATCH_X1) & (iy >= PATCH_Y0) & (iy < PATCH_Y1)
    expected_full = np.where(inpatch, full + 1000.0, full)
    for (tx, ty) in [(0, 0), (2, 3), (3, 4), (7, 7)]:
        blk = expected_full[
            ty * TILE_SIZE : (ty + 1) * TILE_SIZE,
            tx * TILE_SIZE : (tx + 1) * TILE_SIZE,
        ]
        assert sums[(tx, ty)] == blk.sum()


def test_gradient_modes_match_reference_stencil(spark, elev_tiles):
    """gradient_tiles must reproduce the reference's whole-matrix
    stencil (raster.py:724-740) for every mode, including the libm
    modes (aspect) that the SQL oracle can't cover, with the
    latlonToM meters factor computed at mid latitude."""
    from geokit_spark.constants import PIX_DX, PIX_DY, YMAX, YMIN
    from geokit_spark.operators.kernel import (
        gradient_tiles, latlon_to_m_factors,
    )

    full = _full()
    xf, yf = latlon_to_m_factors(YMIN, YMAX)
    ns = np.zeros(full.shape)
    ns[1:-1, :] = (full[2:, :] - full[:-2, :]) / (2 * PIX_DY * yf)
    ew = np.zeros(full.shape)
    ew[:, 1:-1] = (full[:, :-2] - full[:, 2:]) / (2 * PIX_DX * xf)
    expected = {
        "ns": ns,
        "ew": ew,
        "slope": np.sqrt(ns * ns + ew * ew),
        "aspect": np.arctan2(ns, ew),
    }
    for mode, exp in expected.items():
        got = gradient_tiles(elev_tiles, mode).toPandas()
        for r in got.itertuples():
            block = exp[
                r.tile_y * TILE_SIZE : (r.tile_y + 1) * TILE_SIZE,
                r.tile_x * TILE_SIZE : (r.tile_x + 1) * TILE_SIZE,
            ]
            assert np.allclose(
                np.asarray(r.data).reshape(TILE_SIZE, TILE_SIZE),
                block, rtol=0, atol=1e-12,
            ), (mode, r.tile_x, r.tile_y)


def test_gradient_bad_mode_raises(spark, elev_tiles):
    from geokit_spark.operators.kernel import gradient_tiles

    with pytest.raises(ValueError):
        gradient_tiles(elev_tiles, "sideways")
