"""General (non-convex) clipping kernel vs the independent exact
boundary-integral oracle (two different algorithms, both exact
rationals — results must be EQUAL, not just close)."""

from fractions import Fraction

import pytest

from geokit_spark.kernels.clip_general import (
    area_share_general,
    ear_clip_triangles,
    intersection_area_fr,
    intersection_area_general,
)
from geokit_spark.oracle.geooracle import intersection_area_boundary_fr

L_SHAPE = [(0, 0), (4, 0), (4, 1), (1, 1), (1, 4), (0, 4)]  # concave L
U_SHAPE = [(0.5, -1), (3.5, -1), (3.5, 3), (2.5, 3), (2.5, 0.5),
           (1.5, 0.5), (1.5, 3), (0.5, 3)]  # concave U
# strictly contains L (no shared/collinear edges: the boundary-
# integral oracle requires general position, as the fixtures do)
SQUARE = [(-0.5, -0.5), (4.5, -0.5), (4.5, 4.5), (-0.5, 4.5)]
SMALL = [(1.25, 0.25), (1.75, 0.25), (1.75, 0.75), (1.25, 0.75)]
FAR = [(10, 10), (11, 10), (11, 11), (10, 11)]


def test_ear_clip_partitions_area():
    for poly in (L_SHAPE, U_SHAPE, SQUARE):
        tris = ear_clip_triangles(poly)
        total = sum(
            abs(
                (b[0] - a[0]) * (c[1] - a[1])
                - (b[1] - a[1]) * (c[0] - a[0])
            )
            for a, b, c in tris
        ) / 2
        expected = abs(intersection_area_fr(poly, poly))
        assert total == expected  # exact rational equality


@pytest.mark.parametrize(
    "subject,clip",
    [
        (L_SHAPE, U_SHAPE),       # concave x concave
        (U_SHAPE, L_SHAPE),       # symmetry
        (SQUARE, L_SHAPE),        # convex subject, concave clip
        (L_SHAPE, SQUARE),        # concave subject, convex clip
        (SMALL, L_SHAPE),         # containment: SMALL inside L's base
        (L_SHAPE, SMALL),
        (L_SHAPE, FAR),           # disjoint
    ],
)
def test_general_clip_matches_boundary_integral(subject, clip):
    got = intersection_area_fr(subject, clip)
    exp = intersection_area_boundary_fr(subject, clip)
    assert got == exp  # exact rational equality across two algorithms


def test_known_areas():
    # L (area 7) clipped by the unit-ish SMALL square inside it
    assert intersection_area_general(SMALL, L_SHAPE) == 0.25
    assert intersection_area_general(L_SHAPE, FAR) == 0.0
    assert intersection_area_general(L_SHAPE, SQUARE) == 7.0  # L inside square
    assert area_share_general(L_SHAPE, SQUARE) == 1.0
    # L ∩ U by hand: U's two prongs [0.5,1.5]x[-1,3] and [2.5,3.5]x[-1,3]
    # and base [0.5,3.5]x[-1,0.5] intersected with L (=[0,4]x[0,1] u [0,1]x[0,4])
    # prong1 ∩ L: x in [0.5,1] y in [0,4] -> .5*... compute: L = base row
    # [0,4]x[0,1] plus column [0,1]x[1,4].
    # U region: ([0.5,3.5]x[-1,0.5]) u ([0.5,1.5]x[0.5,3]) u ([2.5,3.5]x[0.5,3])
    # Intersections with L:
    #  base∩Lrow: [0.5,3.5]x[0,0.5] = 1.5
    #  prong1∩Lrow: [0.5,1.5]x[0.5,1] = 0.5 ; prong1∩Lcol: [0.5,1]x[1,3] = 1.0
    #  prong2∩Lrow: [2.5,3.5]x[0.5,1] = 0.5
    assert intersection_area_general(L_SHAPE, U_SHAPE) == 3.5


def test_degenerate_subject():
    assert area_share_general([(0, 0), (1, 0)], SQUARE) == 0.0


def test_union_zones_geometry_structure(spark):
    """Full union operator: exact area equals the slab oracle, ring
    signed areas reconcile to the union area, the union area obeys
    max(poly) <= area <= sum(poly), and the WKB multipolygon parses
    back to the same ring structure."""
    import struct as st

    from geokit_spark import fixtures
    from geokit_spark.kernels.union_geom import (
        fr_ring, signed_area2, union_area_fr,
    )
    from geokit_spark.operators.union_op import union_zones_geometry
    from geokit_spark.oracle.geooracle import union_area_slab_fr

    zones = fixtures.ZONES[:40]  # keep the exact-rational cost modest
    row = union_zones_geometry(spark, zones).collect()[0]
    exact = union_area_slab_fr([z["verts"] for z in zones])
    assert row["union_area"] == float(exact)
    assert union_area_fr([z["verts"] for z in zones]) == exact
    areas = [abs(float(signed_area2(fr_ring(z["verts"])))) / 2 for z in zones]
    assert max(areas) <= row["union_area"] <= sum(areas)
    assert row["n_rings"] == row["n_outer"] + row["n_holes"]
    # WKB multipolygon: 1-byte LE + uint32 type 6 + count
    buf = bytes(row["wkb"])
    order, gtype, npolys = st.unpack_from("<BII", buf, 0)
    assert order == 1 and gtype == 6 and npolys == row["n_outer"]


def test_union_log_depth_tree_shape_invariant(spark):
    """The log-depth merge tree (n_groups=32, fan_in=4 -> three merge
    levels) must compute the same geometry as the flat two-level
    reduce — set associativity of the exact-rational union — while no
    task unions more than fan_in partials (merge fn raises otherwise).
    WKB bytes are NOT tree-invariant (ring order / collinear T-joint
    vertices differ), so the comparison is on tree-invariant
    properties: exact area, ring counts, per-ring area multiset."""
    import struct as st

    from geokit_spark import fixtures
    from geokit_spark.operators.union_op import union_zones_geometry

    def ring_areas(wkb: bytes) -> list:
        areas, off = [], 0
        order, gtype, npolys = st.unpack_from("<BII", wkb, off)
        off += 9
        for _ in range(npolys):
            _o, _t, nrings = st.unpack_from("<BII", wkb, off)
            off += 9
            for _ in range(nrings):
                (npts,) = st.unpack_from("<I", wkb, off)
                off += 4
                pts = st.unpack_from(f"<{2 * npts}d", wkb, off)
                off += 16 * npts
                x, y = pts[0::2], pts[1::2]
                s = sum(
                    x[i] * y[i + 1] - x[i + 1] * y[i]
                    for i in range(npts - 1)
                )
                areas.append(round(s / 2.0, 9))
        return sorted(areas)

    zones = fixtures.ZONES[:40]
    flat = union_zones_geometry(spark, zones).collect()[0]
    deep = union_zones_geometry(
        spark, zones, n_groups=32, fan_in=4
    ).collect()[0]
    assert deep["union_area"] == flat["union_area"]
    assert (deep["n_rings"], deep["n_outer"], deep["n_holes"]) == (
        flat["n_rings"], flat["n_outer"], flat["n_holes"]
    )
    assert ring_areas(bytes(deep["wkb"])) == ring_areas(bytes(flat["wkb"]))
