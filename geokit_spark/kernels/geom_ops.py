"""Scalar geometry operations (reference geom.py surface the engine
was missing per round-1: Length, Simplify, general Intersection /
Difference — Buffer lives in kernels.buffer).

All kernels are pure-python/numpy over vertex rings; they run inside
Arrow-batched pandas UDFs (mutateVector processors), one geometry per
row — the distributed pattern is the caller's mapInPandas, these are
the per-feature math.

Float discipline: ring_perimeter accumulates LEFT-ASSOCIATIVELY in a
Python loop so the SQL oracle can mirror the exact expression tree
(sqrt is correctly rounded in both engines; np.sum's pairwise order
would diverge)."""

from __future__ import annotations

import math

import numpy as np


def _open_ring(verts) -> list[tuple[float, float]]:
    v = [(float(x), float(y)) for x, y in verts]
    if len(v) > 1 and v[0] == v[-1]:
        v = v[:-1]
    return v


def ring_perimeter(verts) -> float:
    """Ring length (reference geom Length/boundary length): sum of
    sqrt(dx^2 + dy^2) over closing segments, left-associative."""
    v = _open_ring(verts)
    total = 0.0
    for i in range(len(v)):
        x0, y0 = v[i]
        x1, y1 = v[(i + 1) % len(v)]
        dx = x1 - x0
        dy = y1 - y0
        total = total + math.sqrt(dx * dx + dy * dy)
    return total


def signed_area(verts) -> float:
    v = _open_ring(verts)
    s = 0.0
    for i in range(len(v)):
        x0, y0 = v[i]
        x1, y1 = v[(i + 1) % len(v)]
        s += x0 * y1 - x1 * y0
    return s / 2.0


def _dp_chain(pts: np.ndarray, tol: float) -> list[int]:
    """Douglas-Peucker on an open chain; returns kept indices
    (first/last always kept). Iterative stack, exact perpendicular
    distances."""
    keep = {0, len(pts) - 1}
    stack = [(0, len(pts) - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        a = pts[i0]
        b = pts[i1]
        ab = b - a
        seg = pts[i0 + 1 : i1] - a
        denom = float(ab[0] * ab[0] + ab[1] * ab[1])
        if denom == 0.0:
            dist = np.sqrt((seg * seg).sum(axis=1))
        else:
            cross = np.abs(seg[:, 0] * ab[1] - seg[:, 1] * ab[0])
            dist = cross / math.sqrt(denom)
        k = int(np.argmax(dist))
        if float(dist[k]) > tol:
            idx = i0 + 1 + k
            keep.add(idx)
            stack.append((i0, idx))
            stack.append((idx, i1))
    return sorted(keep)


def simplify_ring(verts, tol: float):
    """Douglas-Peucker for a closed ring (reference geom Simplify):
    anchor at vertex 0 and the vertex farthest from it, simplify both
    chains, rejoin. Returns the simplified open ring (>= 3 vertices
    unless the ring is degenerate)."""
    v = np.asarray(_open_ring(verts), dtype=np.float64)
    if len(v) <= 3:
        return [tuple(p) for p in v]
    d0 = ((v - v[0]) ** 2).sum(axis=1)
    far = int(np.argmax(d0))
    chain1 = v[: far + 1]
    chain2 = np.concatenate([v[far:], v[:1]])
    k1 = _dp_chain(chain1, tol)
    k2 = _dp_chain(chain2, tol)
    idx = k1[:-1] + [far + i for i in k2[:-1]]
    out = []
    for i in idx:
        p = tuple(v[i % len(v)])
        if not out or p != out[-1]:
            out.append(p)
    return out


def clip_convex(subject_verts, clip_verts):
    """Sutherland-Hodgman: clip an arbitrary simple SUBJECT ring by a
    CONVEX clip ring (reference geom Intersection for the convex-clip
    case; orientation of the clipper is normalized). Returns the
    clipped open ring ([] when disjoint)."""
    subj = _open_ring(subject_verts)
    clip = _open_ring(clip_verts)
    if signed_area(clip) < 0.0:
        clip = clip[::-1]  # CCW so inside == left of each edge
    out = subj
    n = len(clip)
    for i in range(n):
        if not out:
            return []
        cx0, cy0 = clip[i]
        cx1, cy1 = clip[(i + 1) % n]
        ex, ey = cx1 - cx0, cy1 - cy0
        res = []
        m = len(out)
        for j in range(m):
            x0, y0 = out[j]
            x1, y1 = out[(j + 1) % m]
            d0 = ex * (y0 - cy0) - ey * (x0 - cx0)
            d1 = ex * (y1 - cy0) - ey * (x1 - cx0)
            if d0 >= 0.0:
                res.append((x0, y0))
                if d1 < 0.0:
                    t = d0 / (d0 - d1)
                    res.append((x0 + t * (x1 - x0), y0 + t * (y1 - y0)))
            elif d1 >= 0.0:
                t = d0 / (d0 - d1)
                res.append((x0 + t * (x1 - x0), y0 + t * (y1 - y0)))
        out = res
    return out


def intersection_area(subject_verts, clip_verts) -> float:
    """|subject ∩ clip| for a convex clip ring."""
    c = clip_convex(subject_verts, clip_verts)
    return abs(signed_area(c)) if len(c) >= 3 else 0.0


def difference_area(subject_verts, clip_verts) -> float:
    """|subject \\ clip| = |subject| - |subject ∩ clip| (convex clip)."""
    return abs(signed_area(subject_verts)) - intersection_area(
        subject_verts, clip_verts
    )
