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


def test_parse_rejects_multi_ring_and_short_body():
    # a holed polygon must raise, not silently parse its outer ring
    ring = polygon_wkb([(0, 0), (4, 0), (4, 4), (0, 4)])
    two_rings = ring[:5] + (2).to_bytes(4, "little") + ring[9:]
    with pytest.raises(ValueError, match="multi-ring"):
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
