"""PIP / clip / geocode kernel tests (conventions mirror OGR Within
semantics used by the reference's predicate refinement,
/root/reference/geokit/core/vector.py:365-434)."""

import numpy as np

from geokit_spark import fixtures
from geokit_spark.constants import (
    HOT_CX, HOT_CY, HOT_HALF, XMAX, XMIN, YMAX, YMIN,
)
from geokit_spark.kernels.geocode import geocode
from geokit_spark.kernels.pip import (
    centroid, clip_poly_box, points_in_poly, poly_area,
)
from geokit_spark.kernels.raster_fields import (
    clc_value, elev_value, raster_cell_no,
)

SQUARE = [(0, 0), (2, 0), (2, 2), (0, 2)]


def test_pip_square_basic():
    px = np.array([1.0, 3.0, -0.5, 1.999, 0.001])
    py = np.array([1.0, 1.0, 1.0, 1.999, 0.001])
    assert points_in_poly(px, py, SQUARE).tolist() == [
        True, False, False, True, True,
    ]


def test_pip_concave():
    # L-shape: point in the notch must be outside
    lshape = [(0, 0), (4, 0), (4, 1), (1, 1), (1, 4), (0, 4)]
    px = np.array([0.5, 2.0, 2.0, 0.5])
    py = np.array([0.5, 0.5, 2.0, 3.0])
    assert points_in_poly(px, py, lshape).tolist() == [True, True, False, True]


def test_pip_matches_matplotlib_free_reference():
    # brute-force winding comparison on random points vs region polygon
    rng = np.random.default_rng(7)
    px = rng.uniform(XMIN, XMAX, 5000)
    py = rng.uniform(YMIN, YMAX, 5000)
    verts = fixtures.REGION_VERTS
    got = points_in_poly(px, py, verts)

    # independent check: angle-sum winding number
    vx = np.array([v[0] for v in verts] + [verts[0][0]])
    vy = np.array([v[1] for v in verts] + [verts[0][1]])
    ang = np.zeros(len(px))
    for i in range(len(verts)):
        a1 = np.arctan2(vy[i] - py, vx[i] - px)
        a2 = np.arctan2(vy[i + 1] - py, vx[i + 1] - px)
        d = a2 - a1
        d = np.where(d > np.pi, d - 2 * np.pi, d)
        d = np.where(d < -np.pi, d + 2 * np.pi, d)
        ang += d
    expected = np.abs(ang) > np.pi
    assert (got == expected).all()


def test_region_fixture_sane():
    verts = fixtures.REGION_VERTS
    assert len(verts) == 24
    a = poly_area(verts)
    bbox_area = (XMAX - XMIN) * (YMAX - YMIN)
    assert 0.2 * bbox_area < a < bbox_area
    cx, cy = centroid(verts)
    assert XMIN < cx < XMAX and YMIN < cy < YMAX


def test_zones_fixture_sane():
    assert len(fixtures.ZONES) == 115
    for z in fixtures.ZONES[:10]:
        assert poly_area(z["verts"]) > 0
    # convexity not required, but quads must be simple (non-self-intersecting):
    # jitter is bounded by 35% of a cell so consecutive corners stay ordered.
    ids = {z["zone_id"] for z in fixtures.ZONES}
    assert ids == set(range(115))


def test_geocode_deterministic_and_skewed():
    ids = np.arange(100000, dtype=np.int64)
    lon, lat = geocode(ids)
    lon2, lat2 = geocode(ids)
    assert (lon == lon2).all() and (lat == lat2).all()
    hot = (
        (np.abs(lon - HOT_CX) <= HOT_HALF) & (np.abs(lat - HOT_CY) <= HOT_HALF)
    )
    # 20% of docs forced into the hot-spot (plus a few uniform strays)
    assert 0.19 < hot.mean() < 0.22
    assert (lon >= XMIN).all() and (lon <= XMAX).all()
    assert (lat >= YMIN).all() and (lat <= YMAX).all()


def test_raster_cell_no_bounds():
    ix, iy = raster_cell_no(
        np.array([XMIN + 1e-9, XMAX - 1e-9, XMIN - 1.0]),
        np.array([YMAX - 1e-9, YMIN + 1e-9, YMIN - 1.0]),
    )
    assert ix.tolist() == [0, 511, -1]
    assert iy.tolist() == [0, 511, -1]


def test_fields_integer_valued():
    ix, iy = np.meshgrid(np.arange(64), np.arange(64))
    c = clc_value(ix.ravel(), iy.ravel())
    assert c.min() >= 1 and c.max() <= 44
    e = elev_value(ix.ravel(), iy.ravel())
    assert e.min() >= 100
    assert (e == e.astype(np.int64)).all()


def test_points_in_poly_rings_donut():
    """Even-odd over all rings: inside outer but inside a hole ->
    outside the donut; brute-force parity cross-check on the donut
    fixture."""
    import numpy as np

    from geokit_spark import fixtures
    from geokit_spark.kernels.pip import points_in_poly, points_in_poly_rings

    rings = fixtures.REGION_HOLES_RINGS
    rng = np.random.default_rng(7)
    from geokit_spark.constants import XMIN, XSPAN, YMIN, YSPAN

    px = XMIN + rng.random(5000) * XSPAN
    py = YMIN + rng.random(5000) * YSPAN
    got = points_in_poly_rings(px, py, rings)
    expect = points_in_poly(px, py, rings[0])
    for hole in rings[1:]:
        expect ^= points_in_poly(px, py, hole)
    assert (got == expect).all()
    # holes are strictly inside the outer ring and exclude points
    for hole in rings[1:]:
        hx = np.array([v[0] for v in hole])
        hy = np.array([v[1] for v in hole])
        assert points_in_poly(hx, hy, rings[0]).all()
        cx, cy = hx.mean(), hy.mean()
        assert not points_in_poly_rings(
            np.array([cx]), np.array([cy]), rings
        )[0]


def test_as_rings_shapes():
    from geokit_spark.kernels.pip import as_rings

    single = [(0.0, 0.0), (1.0, 0.0), (0.5, 1.0)]
    assert as_rings(single) == [single]
    rings = [single, [(0.2, 0.2), (0.4, 0.2), (0.3, 0.4)]]
    assert as_rings(rings) == rings
