"""Line features as join subjects (reference vector.py:365-434)."""

import numpy as np
from pyspark.sql import functions as F

from geokit_spark import fixtures
from geokit_spark.operators.lines import (
    lines_in_polygon,
    rasterize_lines_band,
)


def test_lines_in_polygon_hand_cases(spark):
    """Unit-square region: a crossing line, a fully-inside line, a
    fully-outside line, and a line crossing through without any
    waypoint inside."""
    square = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    lines = [
        {"line_id": 0, "kind": "a", "pts": [(-0.5, 0.4), (0.5, 0.45)]},
        {"line_id": 1, "kind": "a", "pts": [(0.2, 0.2), (0.8, 0.3)]},
        {"line_id": 2, "kind": "a", "pts": [(2.0, 2.0), (3.0, 2.5)]},
        {"line_id": 3, "kind": "a", "pts": [(-0.5, 0.6), (1.5, 0.7)]},
    ]
    got = (
        lines_in_polygon(spark, lines, square)
        .toPandas()
        .set_index("line_id")
        .sort_index()
    )
    assert got.loc[0, "touches"] and got.loc[0, "n_cross"] == 1
    assert got.loc[1, "touches"] and got.loc[1, "n_cross"] == 0
    assert got.loc[1, "n_verts_in"] == 2
    assert not got.loc[2, "touches"]
    assert got.loc[3, "touches"] and got.loc[3, "n_cross"] == 2
    assert got.loc[3, "n_verts_in"] == 0


def test_lines_in_polygon_donut_region(spark):
    """A line living entirely inside a hole does NOT touch the donut;
    the same line against the outer ring alone does."""
    rings = fixtures.REGION_HOLES_RINGS
    hole = rings[1]
    hx = float(np.mean([v[0] for v in hole]))
    hy = float(np.mean([v[1] for v in hole]))
    d = 0.05 * (max(v[0] for v in hole) - min(v[0] for v in hole))
    lines = [{"line_id": 0, "kind": "a",
              "pts": [(hx - d, hy), (hx + d, hy + d / 3)]}]
    donut = lines_in_polygon(spark, lines, rings).toPandas()
    outer = lines_in_polygon(spark, lines, rings[0]).toPandas()
    assert not donut.loc[0, "touches"]
    assert outer.loc[0, "touches"]


def test_rasterize_lines_band_covers_segments(spark):
    """Every fixture segment's midpoint cell must be burned, and burn
    ids must be valid line ids."""
    from geokit_spark.constants import PIX_DX, PIX_DY, XMIN, YMAX
    from geokit_spark.sources import tiles as tilesrc

    got = rasterize_lines_band(
        tilesrc.raster_table(spark, "elev")
    ).toPandas()
    assert len(got) > 0
    assert set(got["burn"]).issubset(
        {ln["line_id"] for ln in fixtures.LINES}
    )
    burned = set(zip(got["ix"], got["iy"]))
    for ln in fixtures.LINES:
        p = ln["pts"]
        for i in range(len(p) - 1):
            mx = (p[i][0] + p[i + 1][0]) / 2
            my = (p[i][1] + p[i + 1][1]) / 2
            # clamp: waypoints clamped to the bbox edge land exactly on
            # the last cell's border (still burned via the inflated rect)
            ix = min(int(np.floor((mx - XMIN) / PIX_DX)), 511)
            iy = min(int(np.floor((YMAX - my) / PIX_DY)), 511)
            assert (ix, iy) in burned, (ln["line_id"], i)


def test_line_crossings_blocking_is_lossless(spark):
    """The cell-blocked crossing join must equal the all-pairs brute
    force: crossing segments' bboxes overlap, so they always share a
    covered grid cell — no pair can be lost to blocking."""
    import itertools

    from geokit_spark.operators.lines import line_crossing_pairs

    got = (
        line_crossing_pairs(spark)
        .toPandas()
        .set_index(["id_a", "id_b"])["n_cross"]
        .to_dict()
    )

    def orient(p, q, r):
        return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])

    expect = {}
    for la, lb in itertools.combinations(fixtures.LINES, 2):
        n = 0
        for i in range(len(la["pts"]) - 1):
            for j in range(len(lb["pts"]) - 1):
                a, b = la["pts"][i], la["pts"][i + 1]
                c, d = lb["pts"][j], lb["pts"][j + 1]
                o1, o2 = orient(a, b, c), orient(a, b, d)
                o3, o4 = orient(c, d, a), orient(c, d, b)
                if ((o1 > 0) != (o2 > 0)) and ((o3 > 0) != (o4 > 0)):
                    n += 1
        if n:
            expect[(la["line_id"], lb["line_id"])] = n
    assert got == expect
