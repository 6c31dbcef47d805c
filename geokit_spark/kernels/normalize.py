"""Geometry normalization for SRS-bounds edge cases (reference
geom.py: shift :1559-1650, divideMultipolygonIntoEasternAndWesternPart
:1653-1752, applyBuffer :1755-1880, fixOutOfBoundsGeoms :1883-2020).

These run driver-side on the broadcast polygon side before indexing
(the SURVEY §2.2 strategy): a region crossing the antimeridian or
protruding past a pole is normalized ONCE here, then the distributed
joins see ordinary in-bounds rings. Representation: a 'multipolygon'
is a list of open vertex rings (the engine's array-of-rings analog of
ogr MultiPolygon)."""

from __future__ import annotations


from .geom_ops import _open_ring, signed_area


def shift_ring(verts, lon_shift: float = 0.0, lat_shift: float = 0.0):
    """geom.shift: translate every vertex (units of the ring's SRS)."""
    return [
        (float(x) + lon_shift, float(y) + lat_shift)
        for x, y in _open_ring(verts)
    ]


def divide_east_west(rings: list, side: str = "both"):
    """divideMultipolygonIntoEasternAndWesternPart (geom.py:1653-1752):
    split a ring list at the largest longitudinal gap between sub-ring
    envelopes (running-max rule, mirroring the reference exactly).
    side: 'both' -> (left, right); 'left'/'right'; 'main' -> larger
    total area side. 'right' is the set LEFT of the gap in minx order
    (the reference's naming: those are east of the antimeridian after
    the -360 unshift)."""
    if side not in ("both", "left", "right", "main"):
        raise ValueError(f"invalid side {side!r}")
    bounds = []
    for ring in rings:
        v = _open_ring(ring)
        xs = [p[0] for p in v]
        if min(xs) < -180.0 or max(xs) > 180.0:
            raise ValueError(
                "envelope must be within [-180, 180] (run "
                "fix_out_of_bounds first)"
            )
        bounds.append((min(xs), max(xs), v))
    bounds.sort(key=lambda b: b[0])
    max_gap = 0.0
    split_index = 0
    curr_maxs = []
    for i in range(len(bounds) - 1):
        curr_maxs.append(bounds[i][1])
        gap = bounds[i + 1][0] - max(curr_maxs)
        if gap > max_gap:
            max_gap = gap
            split_index = i
    right = [b[2] for i, b in enumerate(bounds) if i <= split_index]
    left = [b[2] for i, b in enumerate(bounds) if i > split_index]
    if side == "left":
        return left
    if side == "right":
        return right
    if side == "main":
        la = sum(abs(signed_area(r)) for r in left)
        ra = sum(abs(signed_area(r)) for r in right)
        return left if la > ra else right
    return left, right


def _fold_ring(verts, center_lon: float, pole: int):
    """fixOutOfBoundsGeoms' pole fold (geom.py:1944-1975): the
    over-pole piece is mirrored at the ±90° line, flipped around the
    geometry's center longitude and shifted 180° (mod 360), clamped
    1e-6 inside the pole. Engine deviation (documented): the reference
    leaves crease vertices at exactly ±90° un-flipped
    (geom.py:1947-1950), which smears the folded piece across the
    map; the engine folds the WHOLE clipped piece so the result is the
    exact mirror image."""
    out = []
    for x, y in verts:
        _x = x + 2.0 * (center_lon - x)
        x_new = (_x + 180.0) % 360.0
        if pole > 0:
            y_new = min(180.0 - y, 90.0 - 1e-6)
        else:
            y_new = max(-180.0 - y, -90.0 + 1e-6)
        out.append((x_new, y_new))
    return out


def fix_out_of_bounds(rings: list, how: str = "shift") -> list:
    """fixOutOfBoundsGeoms (geom.py:1883-2020) over a ring list:
    longitudes past ±180° are clipped off and (how='shift') wrapped to
    the opposite side of the map as separate rings; latitudes past ±90°
    are folded over the pole. how='clip' drops protruding parts."""
    from .geom_ops import clip_convex

    if how not in ("clip", "shift"):
        raise ValueError(f"invalid how {how!r}")
    base = [(-180.0, -270.0), (180.0, -270.0), (180.0, 270.0),
            (-180.0, 270.0)]
    out = []
    for ring in rings:
        v = _open_ring(ring)
        xs = [p[0] for p in v]
        ys = [p[1] for p in v]
        if (min(xs) >= -180.0 and max(xs) <= 180.0
                and min(ys) >= -90.0 and max(ys) <= 90.0):
            out.append(v)
            continue
        pieces = []
        center = clip_convex(v, base)
        if len(center) >= 3:
            pieces.append(center)
        if how == "shift":
            if min(xs) < -180.0:
                left = clip_convex(v, shift_ring(base, -360.0))
                if len(left) >= 3:
                    pieces.append(shift_ring(left, 360.0))
            if max(xs) > 180.0:
                right = clip_convex(v, shift_ring(base, 360.0))
                if len(right) >= 3:
                    pieces.append(shift_ring(right, -360.0))
        fixed = []
        for p in pieces:
            pys = [q[1] for q in p]
            if min(pys) < -90.0 or max(pys) > 90.0:
                pxs = [q[0] for q in p]
                center_lon = (min(pxs) + max(pxs)) / 2.0
                if how == "shift":
                    # in-bounds part + folded over-pole part
                    inb = clip_convex(
                        p, [(-540.0, -90.0), (540.0, -90.0),
                            (540.0, 90.0), (-540.0, 90.0)]
                    )
                    if len(inb) >= 3:
                        fixed.append(inb)
                    # folded pieces land on the opposite meridian in
                    # the reference's 0..360 frame ((x+180) % 360,
                    # geom.py:1958) — re-wrap them into [-180, 180] by
                    # one recursive horizontal pass (engine extension:
                    # the reference leaves them in the 0..360 frame)
                    if max(pys) > 90.0:
                        overs = clip_convex(
                            p, [(-540.0, 90.0), (540.0, 90.0),
                                (540.0, 270.0), (-540.0, 270.0)]
                        )
                        if len(overs) >= 3:
                            fixed.extend(fix_out_of_bounds(
                                [_fold_ring(overs, center_lon, 1)], how
                            ))
                    if min(pys) < -90.0:
                        overs = clip_convex(
                            p, [(-540.0, -270.0), (540.0, -270.0),
                                (540.0, -90.0), (-540.0, -90.0)]
                        )
                        if len(overs) >= 3:
                            fixed.extend(fix_out_of_bounds(
                                [_fold_ring(overs, center_lon, -1)], how
                            ))
                else:
                    inb = clip_convex(
                        p, [(-540.0, -90.0), (540.0, -90.0),
                            (540.0, 90.0), (-540.0, 90.0)]
                    )
                    if len(inb) >= 3:
                        fixed.append(inb)
            else:
                fixed.append(p)
        out.extend(fixed)
    return out


def apply_buffer_safe(verts, dist: float, arc_segments: int = 8) -> list:
    """applyBuffer (geom.py:1755-1880): buffer near the antimeridian
    without edge artifacts — shift the ring to center longitude 0,
    buffer there (kernels.buffer), shift back, wrap protrusions via
    fix_out_of_bounds('shift'). Returns a ring list."""
    from .buffer import buffer_convex

    v = _open_ring(verts)
    xs = [p[0] for p in v]
    center = (min(xs) + max(xs)) / 2.0
    shifted = shift_ring(v, -center)
    buffered = buffer_convex(shifted, dist, arc_segments)
    if not buffered:
        return []
    back = shift_ring(buffered, center)
    return fix_out_of_bounds([back], how="shift")
