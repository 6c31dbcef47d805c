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
    # left a-d. Fully vectorized: one pass per marching-squares case
    # (16 constant iterations) over the cells of that case — the same
    # scalar formulas elementwise, so every coordinate is bit-identical
    # to the per-cell form (only the emission ORDER differs, which all
    # consumers — per-component aggregation, sorted-endpoint chain
    # walks, quantized length sums — are invariant to).
    iy, ix = np.nonzero((case > 0) & (case < 15))
    if len(ix) == 0:
        return 0, 0.0, np.zeros((0, 4))
    cs = case[iy, ix]
    va = m[iy, ix]
    vb = m[iy, ix + 1]
    vc = m[iy + 1, ix + 1]
    vd = m[iy + 1, ix]
    xf = ix.astype(np.float64)
    yf = iy.astype(np.float64)
    # edge points per cell: 0=top, 1=right, 2=bottom, 3=left
    ex = np.empty((4, len(ix)))
    ey = np.empty((4, len(ix)))
    ex[0], ey[0] = xf + interp(va, vb), yf
    ex[1], ey[1] = xf + 1.0, yf + interp(vb, vc)
    ex[2], ey[2] = xf + interp(vd, vc), yf + 1.0
    ex[3], ey[3] = xf, yf + interp(va, vd)
    chunks = []
    for case_id, seg_list in _CASE_SEGMENTS.items():
        if not seg_list:
            continue
        sel = np.nonzero(cs == case_id)[0]
        if len(sel) == 0:
            continue
        for e0, e1 in seg_list:
            chunks.append(
                np.column_stack(
                    (ex[e0][sel], ey[e0][sel], ex[e1][sel], ey[e1][sel])
                )
            )
    if not chunks:
        return 0, 0.0, np.zeros((0, 4))
    arr = np.concatenate(chunks, axis=0)
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
