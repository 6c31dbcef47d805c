"""WKB geometry encoding/decoding (SURVEY §1.7 data model: geometry
scalar = BinaryType WKB column — never a Python object per row).

Pure-struct implementation of the OGC WKB spec for the types the
engine carries (Point, Polygon with one outer ring); little-endian,
2-D. The decode path is vectorized enough for pandas-UDF use (one
frombuffer per geometry, no per-coordinate Python)."""

from __future__ import annotations

import struct

import numpy as np

_LE = 1
WKB_POINT = 1
WKB_POLYGON = 3


def point_wkb(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", _LE, WKB_POINT, x, y)


def polygon_wkb(verts) -> bytes:
    """Single-ring polygon; ring is closed automatically."""
    pts = [(float(x), float(y)) for x, y in verts]
    if pts[0] != pts[-1]:
        pts.append(pts[0])
    head = struct.pack("<BIII", _LE, WKB_POLYGON, 1, len(pts))
    body = np.asarray(pts, dtype="<f8").tobytes()
    return head + body


def _parse_polygon_rings(buf: bytes, off: int):
    """Parse one polygon body (ring count + rings) at offset; returns
    (rings, new_offset) with each ring an (n, 2) float64 array."""
    n_rings = int.from_bytes(buf[off : off + 4], "little")
    off += 4
    rings = []
    for _ in range(n_rings):
        if len(buf) < off + 4:
            raise ValueError("truncated polygon WKB")
        n_pts = int.from_bytes(buf[off : off + 4], "little")
        off += 4
        if len(buf) < off + 16 * n_pts:
            raise ValueError("truncated polygon WKB")
        coords = np.frombuffer(buf, dtype="<f8", count=2 * n_pts, offset=off)
        rings.append(coords.reshape(n_pts, 2))
        off += 16 * n_pts
    return rings, off


def parse_wkb(buf: bytes):
    """-> ("point", (x, y)), ("polygon", ndarray (n, 2) closed ring),
    ("polygon", [outer, hole, ...] ring arrays) for polygons with
    interior rings (the reference constructs these,
    /root/reference/geokit/core/geom.py:261-345), or
    ("multipolygon", [[outer, hole, ...], ...]).
    A LIST payload signals multi-ring; a bare ndarray a single ring.
    Raises ValueError on unsupported types/endianness."""
    if len(buf) < 5:
        raise ValueError("truncated WKB")
    endian, gtype = buf[0], int.from_bytes(buf[1:5], "little")
    if endian != _LE:
        raise ValueError("big-endian WKB not supported")
    if gtype == WKB_POINT:
        if len(buf) < 21:
            raise ValueError("truncated point WKB")
        x, y = struct.unpack_from("<dd", buf, 5)
        return "point", (x, y)
    if gtype == WKB_POLYGON:
        if len(buf) < 9:
            raise ValueError("truncated polygon WKB")
        rings, _ = _parse_polygon_rings(buf, 5)
        if not rings:
            return "polygon", np.zeros((0, 2))
        return "polygon", (rings[0] if len(rings) == 1 else rings)
    if gtype in (WKB_LINESTRING, WKB_MULTILINESTRING, WKB_MULTIPOLYGON,
                 WKB_MULTIPOINT) and len(buf) < 9:
        raise ValueError("truncated WKB (missing element count)")
    if gtype == WKB_LINESTRING:
        n_pts = int.from_bytes(buf[5:9], "little")
        if len(buf) < 9 + 16 * n_pts:
            raise ValueError("truncated linestring WKB")
        coords = np.frombuffer(buf, dtype="<f8", count=2 * n_pts, offset=9)
        return "linestring", coords.reshape(n_pts, 2)
    if gtype == WKB_MULTIPOINT:
        n_pts = int.from_bytes(buf[5:9], "little")
        off = 9
        pts = np.empty((n_pts, 2), dtype=np.float64)
        for i in range(n_pts):
            if len(buf) < off + 21:
                raise ValueError("truncated multipoint WKB")
            if buf[off] != _LE or int.from_bytes(
                buf[off + 1 : off + 5], "little"
            ) != WKB_POINT:
                raise ValueError("malformed multipoint WKB")
            pts[i] = struct.unpack_from("<dd", buf, off + 5)
            off += 21
        return "multipoint", pts
    if gtype == WKB_MULTILINESTRING:
        n_lines = int.from_bytes(buf[5:9], "little")
        off = 9
        lines = []
        for _ in range(n_lines):
            if len(buf) < off + 9:
                raise ValueError("truncated multilinestring WKB")
            if buf[off] != _LE or int.from_bytes(
                buf[off + 1 : off + 5], "little"
            ) != WKB_LINESTRING:
                raise ValueError("malformed multilinestring WKB")
            n_pts = int.from_bytes(buf[off + 5 : off + 9], "little")
            off += 9
            if len(buf) < off + 16 * n_pts:
                raise ValueError("truncated multilinestring WKB")
            coords = np.frombuffer(
                buf, dtype="<f8", count=2 * n_pts, offset=off
            )
            lines.append(coords.reshape(n_pts, 2))
            off += 16 * n_pts
        return "multilinestring", lines
    if gtype == WKB_MULTIPOLYGON:
        n_polys = int.from_bytes(buf[5:9], "little")
        off = 9
        polys = []
        for _ in range(n_polys):
            if len(buf) < off + 9:
                raise ValueError("truncated multipolygon WKB")
            endian_p = buf[off]
            gtype_p = int.from_bytes(buf[off + 1 : off + 5], "little")
            if endian_p != _LE or gtype_p != WKB_POLYGON:
                raise ValueError("malformed multipolygon WKB")
            rings, off = _parse_polygon_rings(buf, off + 5)
            polys.append(rings)
        return "multipolygon", polys
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def _ring_area_abs(coords) -> float:
    if len(coords) < 4:
        return 0.0
    x = coords[:-1, 0]
    y = coords[:-1, 1]
    x2 = np.roll(x, -1)
    y2 = np.roll(y, -1)
    s = 0.0
    for t in x * y2 - x2 * y:  # fixed order: left-assoc accumulation
        s = s + t
    return abs(s / 2.0)


def polygon_wkb_area(buf: bytes) -> float:
    """Shoelace area straight from WKB bytes (explicit left-assoc term
    order over each ring — mirrored by the SQL oracle for quads).
    Polygons with holes: |outer| - sum |holes| (proper ring nesting
    assumed, as written by polygon_wkb_rings)."""
    kind, payload = parse_wkb(buf)
    if kind != "polygon":
        return 0.0
    if isinstance(payload, list):
        return _ring_area_abs(payload[0]) - sum(
            _ring_area_abs(r) for r in payload[1:]
        )
    return _ring_area_abs(payload)


def polygon_wkb_rings(rings) -> bytes:
    """Multi-ring polygon (outer ring first, then holes). Each ring is
    an (n, 2) array-like; rings are closed automatically. Produced by
    operators.components.polygonize; note parse_wkb keeps its strict
    single-ring contract for the area kernels."""
    assert rings
    parts = [struct.pack("<BII", _LE, WKB_POLYGON, len(rings))]
    for ring in rings:
        pts = [(float(x), float(y)) for x, y in ring]
        if pts[0] != pts[-1]:
            pts.append(pts[0])
        parts.append(struct.pack("<I", len(pts)))
        parts.append(np.asarray(pts, dtype="<f8").tobytes())
    return b"".join(parts)


WKB_LINESTRING = 2
WKB_MULTILINESTRING = 5


def linestring_wkb(pts) -> bytes:
    p = [(float(x), float(y)) for x, y in pts]
    head = struct.pack("<BII", _LE, WKB_LINESTRING, len(p))
    return head + np.asarray(p, dtype="<f8").tobytes()


def multilinestring_wkb(lines) -> bytes:
    parts = [struct.pack("<BII", _LE, WKB_MULTILINESTRING, len(lines))]
    parts += [linestring_wkb(line) for line in lines]
    return b"".join(parts)


WKB_MULTIPOLYGON = 6
WKB_MULTIPOINT = 4


def multipoint_wkb(pts) -> bytes:
    """MULTIPOINT from [(x, y), ...] — completes the reference's
    first-class geometry-type enum (each member is a full WKB point,
    per the OGC spec's nested-geometry encoding)."""
    parts = [struct.pack("<BII", _LE, WKB_MULTIPOINT, len(pts))]
    parts += [point_wkb(float(x), float(y)) for x, y in pts]
    return b"".join(parts)


def multipolygon_wkb(polygons) -> bytes:
    """MULTIPOLYGON from [[outer, hole, ...], ...] ring lists (each
    ring an (n, 2) array-like; closed automatically). Produced by
    operators.union_op for the reference's flatten union tree."""
    parts = [struct.pack("<BII", _LE, WKB_MULTIPOLYGON, len(polygons))]
    parts += [polygon_wkb_rings(rings) for rings in polygons]
    return b"".join(parts)
