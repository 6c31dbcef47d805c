"""Golden tests for the tiling kernels against the reference suite's
public expected values (/root/reference/test/test_03_geom.py:31-107).
The POLY fixture is the reference's own literal WKT
(test/helpers.py:44)."""

import numpy as np
import pytest

from geokit_spark.kernels import tiling
from geokit_spark.kernels.pip import clip_poly_box, poly_area

# reference test/helpers.py:44
POLY = [
    (10.1, 32.0), (10.9, 35.1), (12.0, 36.0), (14.6, 38.1), (13.5, 35.0),
    (12.9, 35.1), (11.1, 33.0), (10.6, 32.2), (10.5, 30.5), (10.1, 32.0),
]


def test_tile_bounds_3857_golden():
    # reference test_03_geom.py:31-40 (geom.tile(4250, 2775, 13))
    xmin, ymin, xmax, ymax = tiling.tile_bounds_3857(4250, 2775, 13)
    assert np.isclose(xmin, 753363.3507786973)
    assert np.isclose(xmax, 758255.3205889486)
    assert np.isclose(ymin, 6457400.14953169)
    assert np.isclose(ymax, 6462292.119341941)


def test_tile_at_golden():
    # reference test_03_geom.py:43-56 (geom.tileAt(6, 50, zoom=7))
    xi, yi = tiling.deg2num(50.0, 6.0, 7)
    xmin, ymin, xmax, ymax = tiling.tile_bounds_3857(xi, yi, 7)
    assert np.isclose(xmin, 626172.13571216)
    assert np.isclose(ymin, 6261721.35712164)
    assert np.isclose(xmax, 939258.20356825)
    assert np.isclose(ymax, 6574807.42497772)


def test_sub_tiles_zoom5_golden():
    # reference test_03_geom.py:76-84
    tiles = list(tiling.sub_tiles(POLY, zoom=5, check_intersect=False))
    assert tiles == [(16, 12, 5), (16, 13, 5), (17, 12, 5), (17, 13, 5)]


def test_sub_tiles_zoom7_intersect_golden():
    # reference test_03_geom.py:86-96
    tiles = list(tiling.sub_tiles(POLY, zoom=7, check_intersect=True))
    assert tiles == [
        (67, 50, 7), (67, 51, 7), (67, 52, 7),
        (68, 49, 7), (68, 50, 7), (68, 51, 7),
        (69, 49, 7),
    ]


def test_tileize_areas_golden():
    # reference test_03_geom.py:99-107 — validates the Sutherland-
    # Hodgman clip + shoelace area against OGR Intersection areas.
    expected = [
        6185440214.480698, 22669806295.02369, 4971343426.690063,
        11085156736.902699, 60694504952.24364, 8127832949.697159,
        4469553269.708176,
    ]
    areas = [poly_area(v) for _, v in tiling.tileize(POLY, zoom=7)]
    assert len(areas) == len(expected)
    assert np.allclose(areas, expected)


def test_deg2num_num2deg_roundtrip():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-179, 179, 200)
    lat = rng.uniform(-84, 84, 200)
    for zoom in (5, 9, 13):
        xi, yi = tiling.deg2num(lat, lon, zoom)
        n = 1 << zoom
        assert ((xi >= 0) & (xi < n)).all()
        assert ((yi >= 0) & (yi < n)).all()
        # tile upper-left corner must be NW of the point
        lat_c, lon_c = tiling.num2deg(xi.astype(float), yi.astype(float), zoom)
        assert (lon_c <= lon + 1e-9).all()
        assert (lat_c >= lat - 1e-9).all()


def test_merc_roundtrip():
    lon = np.linspace(-179, 179, 50)
    lat = np.linspace(-84, 84, 50)
    x, y = tiling.merc_forward(lon, lat)
    lon2, lat2 = tiling.merc_inverse(x, y)
    assert np.allclose(lon, lon2) and np.allclose(lat, lat2)


def test_clip_poly_box_identity_and_empty():
    box_verts = [(0, 0), (4, 0), (4, 4), (0, 4)]
    inside = clip_poly_box(box_verts, (-1, -1, 5, 5))
    assert np.isclose(poly_area(inside), 16.0)
    assert clip_poly_box(box_verts, (10, 10, 12, 12)) == []
    half = clip_poly_box(box_verts, (2, -1, 10, 10))
    assert np.isclose(poly_area(half), 8.0)
