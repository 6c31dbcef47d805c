"""General (non-convex) polygon intersection — the documented hard
part of extractAndClipFeatures (reference
/root/reference/geokit/core/vector.py:916-931, areaShare goldens
test/test_05_vector.py:154-165; SURVEY §7.3).

Algorithm: ear-clip the CLIP polygon into triangles, Sutherland-
Hodgman each triangle against the subject, sum areas. S-H requires a
convex CLIPPER only — the subject may be arbitrarily concave (its
degenerate bridge edges cancel in the signed area), and triangles
partition the clip polygon, so the per-triangle intersection areas
add up to |subject ∩ clip| for ANY pair of simple polygons.

All arithmetic is EXACT RATIONAL (fractions.Fraction over the input
doubles): every orientation test and clipped vertex is exact, so the
result is the true area rounded ONCE to float64 — which is what lets
the independent boundary-integral oracle (oracle.geooracle) reproduce
it bit-for-bit with a completely different algorithm. Per-feature
cost is higher than a float pipeline; clipping runs on the feature
side (small, reference semantics) — never per pixel.
"""

from __future__ import annotations

from fractions import Fraction


def _fr_open_ring(verts) -> list[tuple[Fraction, Fraction]]:
    v = [(Fraction(float(x)), Fraction(float(y))) for x, y in verts]
    if len(v) > 1 and v[0] == v[-1]:
        v = v[:-1]
    # consecutive duplicates (e.g. coordinates that collapsed when an
    # offset absorbed a denormal) would break the ear walker
    out = []
    for p in v:
        if not out or p != out[-1]:
            out.append(p)
    if len(out) > 1 and out[0] == out[-1]:
        out.pop()
    return out


def _signed_area2(v) -> Fraction:
    """Twice the signed area (exact)."""
    s = Fraction(0)
    n = len(v)
    for i in range(n):
        x0, y0 = v[i]
        x1, y1 = v[(i + 1) % n]
        s += x0 * y1 - x1 * y0
    return s


def _cross(o, a, b) -> Fraction:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _point_in_tri(p, a, b, c) -> bool:
    """p strictly-or-boundary inside CCW triangle abc (exact)."""
    return _cross(a, b, p) >= 0 and _cross(b, c, p) >= 0 and _cross(c, a, p) >= 0


def ear_clip_triangles(verts) -> list[tuple]:
    """Exact ear-clipping triangulation of a simple polygon. Returns
    [(a, b, c)] CCW Fraction triangles partitioning the polygon;
    degenerate (zero-area / < 3 distinct vertices) input yields []."""
    v = _fr_open_ring(verts)
    if len(v) < 3 or _signed_area2(v) == 0:
        return []
    if _signed_area2(v) < 0:
        v = v[::-1]
    tris = []
    guard = 0
    while len(v) > 3:
        n = len(v)
        guard += 1
        if guard > 2 * n * n:
            raise ValueError("ear clipping failed (non-simple polygon?)")
        for i in range(n):
            a, b, c = v[i - 1], v[i], v[(i + 1) % n]
            if _cross(a, b, c) <= 0:
                continue  # reflex or collinear at b — not an ear
            # no OTHER vertex may lie inside the candidate ear
            ok = True
            for j in range(n):
                p = v[j]
                if p in (a, b, c):
                    continue
                if _point_in_tri(p, a, b, c):
                    ok = False
                    break
            if ok:
                tris.append((a, b, c))
                del v[i]
                break
        else:
            raise ValueError("no ear found (non-simple polygon?)")
    tris.append((v[0], v[1], v[2]))
    return tris


def _sh_clip_triangle(subject, tri) -> list:
    """Sutherland-Hodgman clip of an arbitrary simple subject ring by
    one CCW triangle, all-Fraction."""
    out = subject
    for i in range(3):
        if not out:
            return []
        c0 = tri[i]
        c1 = tri[(i + 1) % 3]
        ex = c1[0] - c0[0]
        ey = c1[1] - c0[1]
        res = []
        m = len(out)
        for j in range(m):
            p0 = out[j]
            p1 = out[(j + 1) % m]
            d0 = ex * (p0[1] - c0[1]) - ey * (p0[0] - c0[0])
            d1 = ex * (p1[1] - c0[1]) - ey * (p1[0] - c0[0])
            if d0 >= 0:
                res.append(p0)
                if d1 < 0:
                    t = d0 / (d0 - d1)
                    res.append(
                        (p0[0] + t * (p1[0] - p0[0]),
                         p0[1] + t * (p1[1] - p0[1]))
                    )
            elif d1 >= 0:
                t = d0 / (d0 - d1)
                res.append(
                    (p0[0] + t * (p1[0] - p0[0]),
                     p0[1] + t * (p1[1] - p0[1]))
                )
        out = res
    return out


def intersection_area_fr(subject_verts, clip_verts) -> Fraction:
    """Exact |subject ∩ clip| for any two simple polygons (degenerate
    inputs have zero area)."""
    subj = _fr_open_ring(subject_verts)
    if len(subj) < 3:
        return Fraction(0)
    if _signed_area2(subj) < 0:
        subj = subj[::-1]
    total = Fraction(0)
    for tri in ear_clip_triangles(clip_verts):
        clipped = _sh_clip_triangle(subj, tri)
        if len(clipped) >= 3:
            a2 = _signed_area2(clipped)
            total += a2 if a2 >= 0 else -a2
    return total / 2


def intersection_area_general(subject_verts, clip_verts) -> float:
    """|subject ∩ clip| as the exact rational rounded once to
    float64."""
    return float(intersection_area_fr(subject_verts, clip_verts))


def area_share_general(subject_verts, clip_verts) -> float:
    """areaShare = |subject ∩ clip| / |subject| with the division done
    in exact rationals, rounded once (reference vector.py:940-941).

    clip_verts may be a single ring or a ring list [outer, hole, ...]
    (clip region WITH HOLES, reference geom.py:261-345): with holes
    pairwise disjoint and inside the outer ring,
    |s ∩ donut| = |s ∩ outer| - sum |s ∩ hole_i| — each term exact."""
    from .pip import as_rings

    subj = _fr_open_ring(subject_verts)
    full2 = _signed_area2(subj)
    if full2 < 0:
        full2 = -full2
    if full2 == 0:
        return 0.0
    rings = as_rings(clip_verts)
    inter = intersection_area_fr(subject_verts, rings[0])
    for hole in rings[1:]:
        inter -= intersection_area_fr(subject_verts, hole)
    return float(inter * 2 / full2)
