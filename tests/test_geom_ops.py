"""Scalar geometry kernels: Length / Simplify / Intersection /
Difference (reference geom.py surface; see kernels/geom_ops.py)."""

import math

import numpy as np
import pytest

from geokit_spark.kernels.geom_ops import (
    clip_convex, difference_area, intersection_area, ring_perimeter,
    signed_area, simplify_ring,
)

SQ = [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)]


def test_perimeter_and_area():
    assert ring_perimeter(SQ) == 8.0
    assert signed_area(SQ) == 4.0
    assert signed_area(SQ[::-1]) == -4.0
    tri = [(0, 0), (3, 0), (0, 4)]
    assert ring_perimeter(tri) == 12.0  # 3-4-5


def test_clip_convex_cases():
    # identical -> full area
    assert intersection_area(SQ, SQ) == 4.0
    # disjoint -> 0
    assert intersection_area(SQ, [(5, 5), (6, 5), (6, 6), (5, 6)]) == 0.0
    # contained clipper -> clipper area
    inner = [(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5)]
    assert intersection_area(SQ, inner) == pytest.approx(1.0, abs=1e-15)
    # partial overlap: unit offset square -> 1x1
    off = [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0)]
    assert intersection_area(SQ, off) == pytest.approx(1.0, abs=1e-15)
    # clockwise clipper is normalized
    assert intersection_area(SQ, off[::-1]) == pytest.approx(1.0, abs=1e-15)
    assert difference_area(SQ, off) == pytest.approx(3.0, abs=1e-15)
    # non-convex SUBJECT (L-shape) clipped by a square
    L = [(0, 0), (3, 0), (3, 1), (1, 1), (1, 3), (0, 3)]
    c = [(0.5, 0.5), (2.5, 0.5), (2.5, 2.5), (0.5, 2.5)]
    # L ∩ c: bottom strip (0.5..2.5)x(0.5..1) = 1.0 plus left strip
    # (0.5..1)x(1..2.5) = 0.75
    assert intersection_area(L, c) == pytest.approx(1.75, abs=1e-14)


def test_simplify_ring():
    # collinear midpoints drop at any tol
    dens = []
    for i in range(4):
        x0, y0 = SQ[i]
        x1, y1 = SQ[(i + 1) % 4]
        dens.append((x0, y0))
        dens.append(((x0 + x1) / 2, (y0 + y1) / 2))
    assert len(simplify_ring(dens, 1e-12)) == 4
    # tolerance-driven: perturbed octagon keeps bumps above tol only
    ring = [(0, 0), (1, 0.05), (2, 0), (2, 1), (2.4, 1.0), (2, 2),
            (0, 2), (-0.01, 1.0)]
    out_tight = simplify_ring(ring, 1e-4)
    out_loose = simplify_ring(ring, 1.0)
    assert len(out_tight) == 8  # every bump survives tol=1e-4
    assert len(out_loose) < len(out_tight)
    # area monotone sanity: simplified ring stays a ring
    assert len(out_loose) >= 3
    # DP keeps the extreme-distance anchor, order preserved
    circ = [
        (math.cos(t) * (1 + (0.2 if i % 5 == 0 else 0.0)),
         math.sin(t) * (1 + (0.2 if i % 5 == 0 else 0.0)))
        for i, t in enumerate(np.linspace(0, 2 * math.pi, 60, endpoint=False))
    ]
    kept = simplify_ring(circ, 0.15)
    assert 3 <= len(kept) < 60


def test_clip_convex_degenerate():
    assert clip_convex([], SQ) == []
    line = [(0, 0), (1, 0)]
    assert intersection_area(line, SQ) == 0.0
