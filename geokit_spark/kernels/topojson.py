"""TopoJSON serialization — the topo=True path of the reference's
createGeoJson (/root/reference/geokit/core/vector.py:1276-1385, which
delegates to the `topojson` package with object_name="primary").

Implements the TopoJSON 1.0 essentials from the public spec:

* quantization: coordinates snap to a q x q grid; the document carries
  the inverse "transform" (scale + translate) and arcs are
  DELTA-encoded in grid units;
* topology extraction: ring edges shared by more than one feature are
  cut into ARCS at junction points (vertices where edge ownership
  changes); an arc shared by two rings is stored ONCE and referenced
  by index, the reversed use as the bitwise complement ~index per
  spec;
* objects: one GeometryCollection named "primary" (mirroring the
  reference call), one Polygon geometry per feature with its
  properties.

Like the reference, this is a driver-side small-geometry utility (the
reference iterates an in-memory geometry list); large sinks should
write per-feature GeoJSON lines instead (sources/geojson.py).
"""

from __future__ import annotations

import json


def _quantize(rings_list, q: int):
    """All features' rings -> integer grid coords + transform."""
    xs = [p[0] for rings in rings_list for ring in rings for p in ring]
    ys = [p[1] for rings in rings_list for ring in rings for p in ring]
    x0, x1 = min(xs), max(xs)
    y0, y1 = min(ys), max(ys)
    kx = (x1 - x0) / (q - 1) if x1 > x0 else 1.0
    ky = (y1 - y0) / (q - 1) if y1 > y0 else 1.0
    quant = [
        [
            [
                (round((p[0] - x0) / kx), round((p[1] - y0) / ky))
                for p in ring
            ]
            for ring in rings
        ]
        for rings in rings_list
    ]
    # drop consecutive duplicates introduced by snapping
    out = []
    for rings in quant:
        rr = []
        for ring in rings:
            ded = [ring[0]]
            for p in ring[1:]:
                if p != ded[-1]:
                    ded.append(p)
            if len(ded) > 1 and ded[0] == ded[-1]:
                ded = ded[:-1]
            rr.append(ded)
        out.append(rr)
    transform = {"scale": [kx, ky], "translate": [x0, y0]}
    return out, transform


def _junctions(quant_rings):
    """Vertices where edge ownership changes: the arc cut points.

    Ownership of an undirected quantized edge = the set of (feature,
    ring) ids using it. A vertex is a junction iff its two incident
    edges within some ring have different ownership sets, or it is
    used by rings with different neighbor sets (T-junction)."""
    edge_owners: dict[frozenset, set] = {}
    for fi, rings in enumerate(quant_rings):
        for ri, ring in enumerate(rings):
            n = len(ring)
            for i in range(n):
                e = frozenset((ring[i], ring[(i + 1) % n]))
                edge_owners.setdefault(e, set()).add((fi, ri))
    cuts = set()
    for fi, rings in enumerate(quant_rings):
        for ri, ring in enumerate(rings):
            n = len(ring)
            for i in range(n):
                prev_e = frozenset((ring[i - 1], ring[i]))
                next_e = frozenset((ring[i], ring[(i + 1) % n]))
                if edge_owners[prev_e] != edge_owners[next_e]:
                    cuts.add(ring[i])
    return cuts


def _ring_to_arcs(ring, cuts, arc_index: dict, arcs: list):
    """Split a closed ring at cut vertices; each piece becomes an arc
    reference (existing arcs reused, reversed as ~index)."""
    n = len(ring)
    cut_pos = [i for i, p in enumerate(ring) if p in cuts]
    if not cut_pos:
        pieces = [ring + [ring[0]]]  # whole closed ring, one arc
    else:
        # rotate so the ring starts at the first cut
        start = cut_pos[0]
        rot = ring[start:] + ring[:start] + [ring[start]]
        rel = sorted((i - start) % n for i in cut_pos)
        pieces = []
        for a, b in zip(rel, rel[1:] + [n]):
            pieces.append(rot[a : b + 1])
    refs = []
    for piece in pieces:
        key = tuple(piece)
        rkey = tuple(reversed(piece))
        if key in arc_index:
            refs.append(arc_index[key])
        elif rkey in arc_index:
            refs.append(~arc_index[rkey])
        else:
            arc_index[key] = len(arcs)
            refs.append(len(arcs))
            arcs.append(piece)
    return refs


def _delta_encode(arc):
    out = []
    px, py = 0, 0
    for x, y in arc:
        out.append([x - px, y - py])
        px, py = x, y
    return out


def topojson_document(features, quantization: int = 100_000) -> str:
    """features: [{'rings': [[(x, y), ...], ...], 'properties': {...}}]
    (first ring outer, rest holes). Returns the TopoJSON string with
    one GeometryCollection object named 'primary'."""
    if not features:
        raise ValueError("empty feature list")
    quant, transform = _quantize([f["rings"] for f in features],
                                 quantization)
    cuts = _junctions(quant)
    arc_index: dict = {}
    arcs: list = []
    geometries = []
    for f, rings in zip(features, quant):
        ring_refs = [_ring_to_arcs(r, cuts, arc_index, arcs) for r in rings]
        geometries.append(
            {
                "type": "Polygon",
                "arcs": ring_refs,
                "properties": f.get("properties", {}),
            }
        )
    doc = {
        "type": "Topology",
        "transform": transform,
        "objects": {
            "primary": {
                "type": "GeometryCollection",
                "geometries": geometries,
            }
        },
        "arcs": [_delta_encode(a) for a in arcs],
    }
    return json.dumps(doc, separators=(",", ":"))


def decode_topojson(doc: str):
    """Inverse transform for round-trip tests: returns
    [feature -> [ring -> [(x, y) float pairs]]]."""
    d = json.loads(doc)
    kx, ky = d["transform"]["scale"]
    x0, y0 = d["transform"]["translate"]
    arcs_abs = []
    for arc in d["arcs"]:
        pts = []
        cx = cy = 0
        for dx, dy in arc:
            cx += dx
            cy += dy
            pts.append((cx, cy))
        arcs_abs.append(pts)
    out = []
    for g in d["objects"]["primary"]["geometries"]:
        rings = []
        for ring_refs in g["arcs"]:
            pts: list = []
            for ref in ring_refs:
                seg = arcs_abs[ref] if ref >= 0 else arcs_abs[~ref][::-1]
                if pts and pts[-1] == seg[0]:
                    pts.extend(seg[1:])
                else:
                    pts.extend(seg)
            if len(pts) > 1 and pts[0] == pts[-1]:
                pts = pts[:-1]
            rings.append([(x0 + x * kx, y0 + y * ky) for x, y in pts])
        out.append(rings)
    return out
