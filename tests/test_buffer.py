"""Polygon buffer kernel (kernels.buffer): Minkowski-sum invariants
independent of the implementation."""

import math

import numpy as np

from geokit_spark import fixtures
from geokit_spark.kernels.buffer import buffer_convex
from geokit_spark.kernels.pip import points_in_poly, poly_area


def _perimeter(verts):
    v = np.asarray(verts, dtype=np.float64)
    d = np.roll(v, -1, axis=0) - v
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def test_buffer_area_matches_minkowski_formula():
    """area(poly ⊕ disc(d)) = A + P*d + pi*d^2 for convex polygons;
    the chordal arc approximation undershoots slightly."""
    for z in fixtures.ZONES[:10]:
        verts = z["verts"]
        d = 0.01
        buf = buffer_convex(verts, d, arc_segments=16)
        exact = poly_area(verts) + _perimeter(verts) * d + math.pi * d * d
        got = poly_area(buf)
        assert got <= exact + 1e-12
        assert got > exact * 0.999


def test_buffer_contains_original_and_near_points():
    z = fixtures.ZONES[40]
    d = 0.02
    buf = buffer_convex(z["verts"], d)
    vx = np.array([v[0] for v in z["verts"]])
    vy = np.array([v[1] for v in z["verts"]])
    assert points_in_poly(vx, vy, buf).all()  # original verts inside
    # points just outside each original vertex (within d*0.9 radially
    # from the vertex) are inside the buffer
    cx, cy = vx.mean(), vy.mean()
    ox = vx + (vx - cx) * 0.0 + 0.9 * d * np.sign(vx - cx)
    assert points_in_poly(ox, vy, buf).sum() >= 3


def test_buffer_winding_invariance():
    z = fixtures.ZONES[7]
    buf_ccw = buffer_convex(z["verts"], 0.01)
    buf_cw = buffer_convex(list(reversed(z["verts"])), 0.01)
    assert np.isclose(poly_area(buf_ccw), poly_area(buf_cw))


def test_negative_buffer_shrinks_and_collapses():
    z = fixtures.ZONES[3]
    small = buffer_convex(z["verts"], -0.005)
    assert small and poly_area(small) < poly_area(z["verts"])
    # all shrunken vertices are inside the original
    sx = np.array([v[0] for v in small])
    sy = np.array([v[1] for v in small])
    assert points_in_poly(sx, sy, z["verts"]).all()
    # a huge inward distance collapses the polygon
    assert buffer_convex(z["verts"], -10.0) == []


def test_zero_buffer_is_identity():
    z = fixtures.ZONES[0]
    assert buffer_convex(z["verts"], 0.0) == [
        (float(x), float(y)) for x, y in z["verts"]
    ]

def test_buffer_safe_handles_self_intersecting_distance():
    """A deep star buffered by a distance far beyond its local feature
    size: the miter path self-intersects; buffer_safe must produce a
    SIMPLE ring that contains the polygon and has at least the
    polygon-plus-perimeter-band area."""
    import math

    from geokit_spark.kernels.buffer import buffer_safe
    from geokit_spark.kernels.pip import points_in_poly, poly_area

    star = []
    for i in range(10):
        ang = 2 * math.pi * i / 10
        r = 1.0 if i % 2 == 0 else 0.25
        star.append((r * math.cos(ang), r * math.sin(ang)))
    d = 0.6  # >> the 0.25 inner radius: miters would cross
    out = buffer_safe(star, d, arc_segments=8)
    # simple ring: no two non-adjacent edges intersect
    import numpy as np

    v = np.asarray(out)
    m = len(v)

    def seg_cross(a, b, c, e):
        d1 = np.cross(b - a, c - a)
        d2 = np.cross(b - a, e - a)
        d3 = np.cross(e - c, a - c)
        d4 = np.cross(e - c, b - c)
        return (d1 * d2 < 0) and (d3 * d4 < 0)

    for i in range(m):
        for j in range(i + 2, m):
            if i == 0 and j == m - 1:
                continue
            assert not seg_cross(
                v[i], v[(i + 1) % m], v[j], v[(j + 1) % m]
            ), (i, j)
    # all original vertices strictly inside the buffer
    xs = np.asarray([p[0] for p in star])
    ys = np.asarray([p[1] for p in star])
    assert points_in_poly(xs, ys, out).all()
    # area lower bound: original + most of the perimeter band
    per = sum(
        math.hypot(
            star[(i + 1) % len(star)][0] - star[i][0],
            star[(i + 1) % len(star)][1] - star[i][1],
        )
        for i in range(len(star))
    )
    assert poly_area(out) > poly_area(star) + 0.8 * per * d


def test_buffer_safe_matches_convex_on_convex():
    """On a convex ring at small distance, buffer_safe (inscribed
    k-gon arcs) and buffer_convex (chorded arcs) agree on area within
    the chord tolerance, and buffer grows monotonically."""
    from geokit_spark.kernels.buffer import buffer_convex, buffer_safe
    from geokit_spark.kernels.pip import poly_area

    box = [(0.0, 0.0), (2.0, 0.0), (2.0, 1.0), (0.0, 1.0)]
    a_safe = poly_area(buffer_safe(box, 0.3, arc_segments=16))
    a_conv = poly_area(buffer_convex(box, 0.3, arc_segments=16))
    assert abs(a_safe - a_conv) / a_conv < 0.01
    assert poly_area(buffer_safe(box, 0.5, arc_segments=8)) > a_safe


def test_indicate_features_safe_buffer_method(spark):
    """buffer_method='safe' routes through the union-composed buffer;
    at a modest distance it covers at least as much as the miter path
    (inscribed arcs vs chorded arcs differ slightly, both legal)."""
    from geokit_spark.operators.indicate import indicate_features
    from geokit_spark.sources import tiles as tilesrc

    t = tilesrc.raster_table(spark, "elev")
    miter = indicate_features(t, "B", buffer_dist=0.01).collect()[0]
    safe = indicate_features(
        t, "B", buffer_dist=0.01, buffer_method="safe"
    ).collect()[0]
    assert safe["n_region_pix"] == miter["n_region_pix"]
    assert abs(safe["n_covered"] - miter["n_covered"]) / miter["n_covered"] < 0.02
    import pytest

    with pytest.raises(ValueError):
        indicate_features(t, "B", buffer_dist=0.01, buffer_method="bevel")
