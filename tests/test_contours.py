"""Marching-squares contours: kernel unit tests + distributed parity
vs the full-matrix kernel."""

import numpy as np
import pytest

from geokit_spark.constants import RASTER_H, RASTER_W
from geokit_spark.kernels.contours import contour_segments, contour_stats_per_level
from geokit_spark.kernels.raster_fields import elev_value
from geokit_spark.operators.contour_op import contour_stats
from geokit_spark.sources import tiles as tilesrc

LEVELS = [400.0, 800.0, 1200.0]


def test_single_cell_cases():
    # level cuts one corner: exactly one segment
    m = np.array([[0.0, 0.0], [0.0, 1.0]])
    n, ln, segs = contour_segments(m, 0.5)
    assert n == 1
    # diagonal cut near the corner: endpoints on bottom and right edges
    (x0, y0, x1, y1) = segs[0]
    assert {round(x0, 2), round(x1, 2)} == {0.5, 1.0}

    # flat matrix: no contours
    n, ln, _ = contour_segments(np.ones((4, 4)), 0.5)
    assert n == 0

    # saddle case produces two segments
    m = np.array([[1.0, 0.0], [0.0, 1.0]])
    n, _, _ = contour_segments(m, 0.5)
    assert n == 2


def test_contour_length_square_bump():
    # a plateau of 1s in a sea of 0s: the 0.5-contour surrounds it
    m = np.zeros((8, 8))
    m[3:5, 3:5] = 1.0
    n, ln, _ = contour_segments(m, 0.5)
    assert n == 8  # 4 sides + 4 corners
    assert ln == pytest.approx(4 * 1.0 + 4 * np.hypot(0.5, 0.5))


def test_distributed_matches_full_matrix(spark):
    tiles = tilesrc.raster_table(spark, "elev")
    got = (
        contour_stats(tiles, LEVELS)
        .toPandas()
        .sort_values("level")
        .reset_index(drop=True)
    )
    ix, iy = np.meshgrid(np.arange(RASTER_W), np.arange(RASTER_H))
    full = elev_value(ix, iy).astype(np.float64)
    exp = contour_stats_per_level(full, LEVELS)
    for (lv, n, ln), row in zip(exp, got.itertuples()):
        assert row.level == lv
        assert row.n_segments == n
        assert np.isclose(row.total_length, ln)


def test_contour_polylines_wkb(spark):
    import numpy as np

    from geokit_spark.constants import PIX_DX, PIX_DY
    from geokit_spark.kernels.wkb import WKB_MULTILINESTRING
    from geokit_spark.operators.contour_op import contour_polylines
    from geokit_spark.sources import tiles as tilesrc

    out = contour_polylines(
        tilesrc.raster_table(spark, "elev"), [800.0]
    ).toPandas()
    assert len(out) > 100
    # pick the largest closed loop; its WKB chains must reproduce the
    # quantized length and form closed rings
    row = out[out["closed"]].sort_values("n_segs").iloc[-1]
    buf = bytes(row["wkb"])
    assert buf[0] == 1
    assert int.from_bytes(buf[1:5], "little") == WKB_MULTILINESTRING
    n_lines = int.from_bytes(buf[5:9], "little")
    off = 9
    total = 0.0
    n_pts = 0
    for _ in range(n_lines):
        assert buf[off] == 1 and int.from_bytes(
            buf[off + 1 : off + 5], "little"
        ) == 2  # linestring
        npt = int.from_bytes(buf[off + 5 : off + 9], "little")
        off += 9
        pts = np.frombuffer(
            buf, dtype="<f8", count=2 * npt, offset=off
        ).reshape(-1, 2)
        off += 16 * npt
        # closed component -> every chain is a ring
        assert tuple(pts[0]) == tuple(pts[-1])
        n_pts += npt - 1
        # geo-space chain length back to pixel units
        d = np.hypot(
            np.diff(pts[:, 0]) / PIX_DX, np.diff(pts[:, 1]) / PIX_DY
        )
        total += float(d.sum())
    assert off == len(buf)
    # each closed chain of npt points carries npt-1 segments; saddle
    # vertices are revisited, so compare against n_segs (exact), not
    # the distinct-point count
    assert n_pts == row["n_segs"]
    assert total == pytest.approx(row["length"], rel=1e-6)
