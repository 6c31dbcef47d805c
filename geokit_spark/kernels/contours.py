"""Marching-squares contour extraction (reference contours,
/root/reference/geokit/core/raster.py:2044-2137, delegating to
gdal.ContourGenerateEx). Parity artifact per SURVEY §7: segment
counts / total contour length per level — cell-level outputs, not
stitched polylines.

For each 2x2 pixel-center cell and level L, the marching-squares case
index is the 4-bit pattern of (value >= L); each case contributes 0,
1, or 2 segments whose endpoints are linear interpolations along the
cell edges. Pure numpy over whole blocks — the pandas-UDF body for
the per-tile stage (tiles carry a 1-pixel halo so seams produce the
same segments as the full matrix)."""

from __future__ import annotations

import numpy as np

# segments per marching-squares case (edge index pairs); edges:
# 0=top, 1=right, 2=bottom, 3=left. Ambiguous saddles (5, 10) use the
# standard non-connected resolution.
_CASE_SEGMENTS: dict[int, list[tuple[int, int]]] = {
    0: [], 15: [],
    1: [(3, 2)], 14: [(3, 2)],
    2: [(2, 1)], 13: [(2, 1)],
    3: [(3, 1)], 12: [(3, 1)],
    4: [(0, 1)], 11: [(0, 1)],
    6: [(0, 2)], 9: [(0, 2)],
    7: [(0, 3)], 8: [(0, 3)],
    5: [(3, 0), (2, 1)],
    10: [(0, 1), (3, 2)],
}


def contour_segments(m: np.ndarray, level: float):
    """Segment endpoints for one level over a value matrix m (y-at-top,
    unit pixel spacing, origin at pixel center (0,0)).

    Returns (n_segments, total_length, endpoints array (N, 4)) with
    rows (x0, y0, x1, y1) in pixel-center coordinates."""
    a = m[:-1, :-1]  # top-left
    b = m[:-1, 1:]   # top-right
    c = m[1:, 1:]    # bottom-right
    d = m[1:, :-1]   # bottom-left
    case = (
        (a >= level).astype(np.int8) * 8
        + (b >= level).astype(np.int8) * 4
        + (c >= level).astype(np.int8) * 2
        + (d >= level).astype(np.int8) * 1
    )

    def interp(v0, v1):
        """fraction along edge from v0 to v1 where level crosses."""
        denom = v1 - v0
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (level - v0) / denom
        return np.clip(np.nan_to_num(t, nan=0.5), 0.0, 1.0)

    # edge crossing coordinates relative to the cell's top-left pixel
    # center (cx, cy): top edge between a-b, right b-c, bottom d-c,
    # left a-d
    iy, ix = np.nonzero(case > 0)
    segs = []
    for eidx in range(len(ix)):
        y, x = iy[eidx], ix[eidx]
        cs = int(case[y, x])
        va, vb, vc, vd = m[y, x], m[y, x + 1], m[y + 1, x + 1], m[y + 1, x]
        pts = {
            0: (x + interp(va, vb), float(y)),
            1: (x + 1.0, y + interp(vb, vc)),
            2: (x + interp(vd, vc), y + 1.0),
            3: (float(x), y + interp(va, vd)),
        }
        for e0, e1 in _CASE_SEGMENTS[cs]:
            segs.append((*pts[e0], *pts[e1]))
    if not segs:
        return 0, 0.0, np.zeros((0, 4))
    arr = np.asarray(segs, dtype=np.float64)
    lengths = np.hypot(arr[:, 2] - arr[:, 0], arr[:, 3] - arr[:, 1])
    return len(arr), float(lengths.sum()), arr


def contour_stats_per_level(m: np.ndarray, levels) -> list[tuple[float, int, float]]:
    """[(level, n_segments, total_length)] — the counts/length parity
    artifact."""
    out = []
    for lv in levels:
        n, total, _ = contour_segments(m, float(lv))
        out.append((float(lv), n, total))
    return out


LENGTH_Q = 1 << 20  # length quantization unit (pixels / 2^20)


def contour_stats_per_level_q(m: np.ndarray, levels) -> list[tuple[float, int, int]]:
    """[(level, n_segments, length_q)] with per-segment lengths
    quantized to integer LENGTH_Q units BEFORE summing. Integer sums
    are exact and order-independent, so the distributed per-tile
    partial + final agg reproduces the full-matrix value bit-for-bit
    at any partitioning (the float total_length sum would not)."""
    out = []
    for lv in levels:
        _, _, arr = contour_segments(m, float(lv))
        if len(arr) == 0:
            out.append((float(lv), 0, 0))
            continue
        lengths = np.hypot(arr[:, 2] - arr[:, 0], arr[:, 3] - arr[:, 1])
        q = np.floor(lengths * LENGTH_Q + 0.5).astype(np.int64)
        out.append((float(lv), int(len(arr)), int(q.sum())))
    return out
