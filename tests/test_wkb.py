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


def test_wkb_multipoint_roundtrip_and_guards():
    from geokit_spark.kernels.wkb import multipoint_wkb, parse_wkb

    pts = [(0.5, 1.5), (-2.0, 3.25), (6.083, 50.775)]
    buf = multipoint_wkb(pts)
    kind, arr = parse_wkb(buf)
    assert kind == "multipoint" and np.allclose(arr, pts)
    # truncated member header / body must raise, not IndexError
    with pytest.raises(ValueError, match="truncated"):
        parse_wkb(buf[:-8])
    with pytest.raises(ValueError, match="truncated"):
        parse_wkb(buf[:10])


def test_wkb_truncated_multi_headers_raise():
    """ADVICE r4: sub-geometry header reads must bounds-check — a
    truncated buffer raises ValueError, never IndexError."""
    from geokit_spark.kernels.wkb import (
        linestring_wkb,
        multilinestring_wkb,
        multipolygon_wkb,
        parse_wkb,
    )

    ml = multilinestring_wkb([[(0, 0), (1, 1)], [(2, 2), (3, 3)]])
    mp = multipolygon_wkb([[[(0, 0), (4, 0), (4, 4), (0, 4)]]])
    for buf in (ml, mp):
        for cut in (7, 9, 12, len(buf) - 3):
            try:
                parse_wkb(buf[:cut])
            except ValueError:
                pass  # the documented contract
    # headerless member (count says 2, only 1 present)
    short = ml[:5] + (3).to_bytes(4, "little") + ml[9:]
    with pytest.raises(ValueError):
        parse_wkb(short)
    with pytest.raises(ValueError, match="truncated"):
        parse_wkb(linestring_wkb([(0, 0), (1, 1)])[:8])


def test_wkb_vector_info_multipoint_and_transform(spark):
    """vector_info accepts MULTIPOINT via the WKB path; transform_geoms
    round-trips every geometry kind through an SRS pair."""
    from geokit_spark.kernels.wkb import (
        linestring_wkb,
        multipoint_wkb,
        parse_wkb,
    )
    from geokit_spark.operators.wkbops import transform_geoms, wkb_vector_info

    rows = [
        (1, bytearray(multipoint_wkb([(6.0, 50.0), (6.2, 50.4)]))),
        (2, bytearray(point_wkb(5.9, 50.6))),
        (3, bytearray(linestring_wkb([(6.1, 50.1), (6.3, 50.2)]))),
    ]
    df = spark.createDataFrame(rows, "fid int, geom binary")
    info = wkb_vector_info(df)
    assert info["count"] == 3 and info["attributes"] == ["fid"]
    x0, y0, x1, y1 = info["bounds"]
    assert (x0, y0, x1, y1) == (5.9, 50.0, 6.3, 50.6)

    out = transform_geoms(df, 4326, 3857).select("fid", "geom_t").collect()
    kinds = {r["fid"]: parse_wkb(bytes(r["geom_t"]))[0] for r in out}
    assert kinds == {1: "multipoint", 2: "point", 3: "linestring"}
    # and back: 3857 -> 4326 restores coordinates to float tolerance
    back = transform_geoms(
        transform_geoms(df, 4326, 3857), 3857, 4326, col="geom_t", out="g2"
    ).collect()
    for r in back:
        k0, d0 = parse_wkb(bytes(r["geom"]))
        k1, d1 = parse_wkb(bytes(r["g2"]))
        assert k0 == k1
        assert np.allclose(np.asarray(d0), np.asarray(d1), atol=1e-9)


# ---------------------------------------------------------------------------
# hypothesis: build -> parse -> rebuild is byte-identical for every
# geometry kind the codec supports (random coordinates incl. negative,
# huge, tiny and denormal-adjacent floats; random ring/part counts)


from hypothesis import given, settings
from hypothesis import strategies as st

_coord = st.floats(
    min_value=-1e15, max_value=1e15, allow_nan=False, width=64
)
_pt = st.tuples(_coord, _coord)


def _ring():
    # 3+ vertices with first != last: the builders auto-close OPEN
    # rings (an already-closed input takes the other branch and the
    # byte roundtrip legitimately differs), so the property is stated
    # over open rings — the form every engine call site passes
    return st.lists(_pt, min_size=3, max_size=8).filter(
        lambda v: v[0] != v[-1]
    )


@settings(max_examples=200, deadline=None)
@given(_pt)
def test_wkb_point_roundtrip(p):
    from geokit_spark.kernels import wkb as W

    buf = W.point_wkb(*p)
    kind, (x, y) = W.parse_wkb(buf)
    assert kind == "point" and (x, y) == p
    assert W.point_wkb(x, y) == buf


@settings(max_examples=200, deadline=None)
@given(_ring())
def test_wkb_polygon_roundtrip(verts):
    from geokit_spark.kernels import wkb as W

    buf = W.polygon_wkb(verts)
    kind, ring = W.parse_wkb(buf)
    assert kind == "polygon"
    assert [tuple(v) for v in ring[:-1]] == [
        (float(a), float(b)) for a, b in verts
    ]
    assert W.polygon_wkb([tuple(v) for v in ring[:-1]]) == buf


@settings(max_examples=200, deadline=None)
@given(st.lists(_ring(), min_size=1, max_size=4))
def test_wkb_polygon_with_holes_roundtrip(rings):
    from geokit_spark.kernels import wkb as W

    buf = W.polygon_wkb_rings(rings)
    kind, parsed = W.parse_wkb(buf)
    assert kind == "polygon"
    parsed = parsed if isinstance(parsed, list) else [parsed]
    assert W.polygon_wkb_rings(
        [[tuple(v) for v in r[:-1]] for r in parsed]
    ) == buf


@settings(max_examples=200, deadline=None)
@given(st.lists(_pt, min_size=1, max_size=10))
def test_wkb_multipoint_and_linestring_roundtrip(pts):
    from geokit_spark.kernels import wkb as W

    for build, kind_want in (
        (W.multipoint_wkb, "multipoint"),
        (W.linestring_wkb, "linestring"),
    ):
        buf = build(pts)
        kind, coords = W.parse_wkb(buf)
        assert kind == kind_want
        assert build([tuple(v) for v in coords]) == buf


@settings(max_examples=150, deadline=None)
@given(st.lists(st.lists(_pt, min_size=2, max_size=6),
                min_size=1, max_size=4))
def test_wkb_multilinestring_roundtrip(lines):
    from geokit_spark.kernels import wkb as W

    buf = W.multilinestring_wkb(lines)
    kind, parsed = W.parse_wkb(buf)
    assert kind == "multilinestring" and len(parsed) == len(lines)
    assert W.multilinestring_wkb(
        [[tuple(v) for v in ln] for ln in parsed]
    ) == buf


@settings(max_examples=150, deadline=None)
@given(st.lists(st.lists(_ring(), min_size=1, max_size=3),
                min_size=1, max_size=3))
def test_wkb_multipolygon_roundtrip(polys):
    from geokit_spark.kernels import wkb as W

    buf = W.multipolygon_wkb(polys)
    kind, parsed = W.parse_wkb(buf)
    assert kind == "multipolygon" and len(parsed) == len(polys)
    assert W.multipolygon_wkb(
        [[[tuple(v) for v in r[:-1]] for r in p] for p in parsed]
    ) == buf


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=64))
def test_wkb_parse_never_crashes_on_junk(buf):
    """Total-function contract: arbitrary bytes either parse or raise
    ValueError — never IndexError/struct.error/segfault (the Arrow
    kernels feed untrusted column bytes straight in)."""
    import pytest as _pytest

    from geokit_spark.kernels import wkb as W

    try:
        W.parse_wkb(buf)
    except ValueError:
        pass
