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