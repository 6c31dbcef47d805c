"""TopoJSON serialization (reference createGeoJson topo=True path)."""

import json

from geokit_spark.kernels.topojson import (
    decode_topojson,
    topojson_document,
)


def _sq(x0, y0, x1, y1):
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]


def test_roundtrip_single_polygon():
    feats = [{"rings": [_sq(0, 0, 4, 3)], "properties": {"id": 7}}]
    doc = topojson_document(feats, quantization=1001)
    d = json.loads(doc)
    assert d["type"] == "Topology"
    assert "primary" in d["objects"]
    rings = decode_topojson(doc)
    got = rings[0][0]
    # quantized round-trip: corners exact (they sit on grid extremes)
    assert sorted(got) == sorted([(0, 0), (4, 0), (4, 3), (0, 3)])


def test_shared_edge_deduplicated():
    """Two squares sharing a full edge: the shared boundary must be
    ONE arc, referenced forward by one ring and as ~index (reversed)
    by the other — the defining property of TopoJSON."""
    a = _sq(0, 0, 1, 1)
    b = _sq(1, 0, 2, 1)
    doc = topojson_document(
        [{"rings": [a], "properties": {}}, {"rings": [b], "properties": {}}],
        quantization=101,
    )
    d = json.loads(doc)
    # 3 arcs total: shared edge + the two outer chains
    assert len(d["arcs"]) == 3
    refs = [
        ref
        for g in d["objects"]["primary"]["geometries"]
        for ring in g["arcs"]
        for ref in ring
    ]
    assert any(r < 0 for r in refs)  # one reversed reference
    # both polygons decode back to their own quantized rings
    rings = decode_topojson(doc)
    assert sorted(rings[0][0]) == sorted([(0, 0), (1, 0), (1, 1), (0, 1)])
    assert sorted(rings[1][0]) == sorted([(1, 0), (2, 0), (2, 1), (1, 1)])


def test_no_shared_edges_one_arc_per_ring():
    feats = [
        {"rings": [_sq(0, 0, 1, 1)], "properties": {}},
        {"rings": [_sq(5, 5, 6, 6)], "properties": {}},
    ]
    d = json.loads(topojson_document(feats, quantization=101))
    assert len(d["arcs"]) == 2


def test_zones_topojson_document(spark):
    from geokit_spark.sources.geojson import zones_topojson
    from geokit_spark import fixtures

    doc = zones_topojson(spark)
    d = json.loads(doc)
    geoms = d["objects"]["primary"]["geometries"]
    assert len(geoms) == len(fixtures.ZONES)
    assert geoms[0]["properties"]["site_code"] == "Z0000"
    rings = decode_topojson(doc)
    # quantization error bounded by one grid cell
    z0 = fixtures.ZONES[0]["verts"]
    got = rings[0][0]
    assert len(got) == len(z0)
    from geokit_spark.constants import XSPAN, YSPAN
    tol = max(XSPAN, YSPAN) / 100_000 * 2
    for (gx, gy), (ex, ey) in zip(sorted(got), sorted(z0)):
        assert abs(gx - ex) < tol and abs(gy - ey) < tol
