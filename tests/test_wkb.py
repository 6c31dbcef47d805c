"""WKB encode/parse kernels + WKB-column operator."""

import numpy as np
import pytest

from geokit_spark import fixtures
from geokit_spark.extent import tile_sources
from geokit_spark.kernels.pip import poly_area
from geokit_spark.kernels.wkb import (
    parse_wkb, point_wkb, polygon_wkb, polygon_wkb_area,
)


def test_point_roundtrip():
    kind, (x, y) = parse_wkb(point_wkb(6.083, 50.775))
    assert kind == "point" and (x, y) == (6.083, 50.775)


def test_polygon_roundtrip_and_area():
    verts = fixtures.ZONES[3]["verts"]
    buf = polygon_wkb(verts)
    kind, coords = parse_wkb(buf)
    assert kind == "polygon"
    assert len(coords) == 5 and np.array_equal(coords[0], coords[-1])
    assert np.array_equal(coords[:4], np.asarray(verts))
    assert np.isclose(polygon_wkb_area(buf), poly_area(verts))


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_wkb(b"\x01\x63\x00\x00\x00")  # unsupported type 99
    with pytest.raises(ValueError):
        parse_wkb(b"\x00\x00\x00")  # truncated
    with pytest.raises(ValueError):
        parse_wkb(b"\x00" + b"\x01\x00\x00\x00" + b"\x00" * 16)  # big-endian


def test_parse_short_body_raises_and_ring_count_honest():
    ring = polygon_wkb([(0, 0), (4, 0), (4, 4), (0, 4)])
    # a declared second ring with no body must raise, not silently
    # parse the outer ring alone
    two_rings = ring[:5] + (2).to_bytes(4, "little") + ring[9:]
    with pytest.raises(ValueError, match="truncated"):
        parse_wkb(two_rings)
    # body shorter than the declared point count must raise
    with pytest.raises(ValueError, match="truncated"):
        parse_wkb(ring[:-8])


def test_wkb_areas_spark(spark):
    from geokit_spark.operators.wkbops import wkb_areas

    got = wkb_areas(spark).toPandas().set_index("zone_id")["area"]
    for z in fixtures.ZONES[:10]:
        assert np.isclose(got[z["zone_id"]], poly_area(z["verts"]))
    assert len(got) == 115


def test_tile_sources_template():
    tiles = [(16, 12, 5), (17, 13, 5)]
    got = tile_sources("s3://tiles/{z}/{x}/{y}.png", tiles)
    assert got == ["s3://tiles/5/16/12.png", "s3://tiles/5/17/13.png"]


def test_wkb_multi_ring_roundtrip_and_area():
    """parse_wkb consumes what polygon_wkb_rings produces (holes) and
    the WKB area subtracts hole areas; multipolygon parse covers the
    union sink's output."""
    import numpy as np

    from geokit_spark.kernels.wkb import (
        multipolygon_wkb,
        parse_wkb,
        polygon_wkb_area,
        polygon_wkb_rings,
    )

    outer = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
    hole = [(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0)]
    buf = polygon_wkb_rings([outer, hole])
    kind, rings = parse_wkb(buf)
    assert kind == "polygon" and isinstance(rings, list) and len(rings) == 2
    assert np.allclose(rings[0][:-1], outer)
    assert np.allclose(rings[1][:-1], hole)
    assert polygon_wkb_area(buf) == 16.0 - 1.0

    mbuf = multipolygon_wkb([[outer, hole], [hole]])
    mkind, polys = parse_wkb(mbuf)
    assert mkind == "multipolygon" and len(polys) == 2
    assert len(polys[0]) == 2 and len(polys[1]) == 1


def test_wkb_linestring_roundtrip():
    from geokit_spark.kernels.wkb import (
        linestring_wkb,
        multilinestring_wkb,
        parse_wkb,
    )

    pts = [(0.0, 1.0), (2.5, -3.0), (4.0, 4.0)]
    kind, arr = parse_wkb(linestring_wkb(pts))
    assert kind == "linestring"
    assert np.allclose(arr, pts)
    kind, lines = parse_wkb(multilinestring_wkb([pts, pts[:2]]))
    assert kind == "multilinestring" and len(lines) == 2
    assert np.allclose(lines[1], pts[:2])
