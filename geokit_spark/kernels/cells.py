"""Cell classification for the two-phase spatial join.

For a polygon and the GRID_N x GRID_N analysis grid, classify every
cell as OUT (0), IN (1), or BOUNDARY (2). Points in IN/OUT cells need
no exact test; only BOUNDARY-cell points go through the ray-casting
refinement UDF. This is the engineered analog of the reference's bbox
prefilter + exact refine (vector.py:144-160, 365-434) — but stronger:
at 100 TB the vast majority of points fall in interior cells and never
touch Python.

Correctness argument: a cell is BOUNDARY if any polygon edge's bbox
overlaps the (slightly inflated) cell rect. If no edge bbox overlaps,
no edge crosses the cell, so polygon membership is constant over the
cell and the cell-center PIP decides for every point in it.
"""

from __future__ import annotations

import numpy as np

from ..constants import GRID_N, XMIN, XSPAN, YMIN, YSPAN
from .pip import points_in_poly

OUT, IN, BOUNDARY = 0, 1, 2

_EPS = 1e-9  # inflation swallowing float rounding at cell borders


def classify_cells(verts, grid_n: int = GRID_N) -> np.ndarray:
    """Returns int8 array (grid_n, grid_n) indexed [cx, cy]."""
    vx = np.asarray([v[0] for v in verts], dtype=np.float64)
    vy = np.asarray([v[1] for v in verts], dtype=np.float64)
    if vx[0] == vx[-1] and vy[0] == vy[-1]:
        vx, vy = vx[:-1], vy[:-1]
    ex0 = np.minimum(vx, np.roll(vx, -1)) - _EPS
    ex1 = np.maximum(vx, np.roll(vx, -1)) + _EPS
    ey0 = np.minimum(vy, np.roll(vy, -1)) - _EPS
    ey1 = np.maximum(vy, np.roll(vy, -1)) + _EPS

    dx = XSPAN / grid_n
    dy = YSPAN / grid_n
    cls = np.zeros((grid_n, grid_n), dtype=np.int8)

    # boundary marking: for each edge, mark overlapped cell range
    for x0, x1, y0, y1 in zip(ex0, ex1, ey0, ey1):
        cx0 = max(0, int(np.floor((x0 - XMIN) / dx)))
        cx1 = min(grid_n - 1, int(np.floor((x1 - XMIN) / dx)))
        cy0 = max(0, int(np.floor((y0 - YMIN) / dy)))
        cy1 = min(grid_n - 1, int(np.floor((y1 - YMIN) / dy)))
        cls[cx0 : cx1 + 1, cy0 : cy1 + 1] = BOUNDARY

    # interior/exterior via center PIP for non-boundary cells
    free = cls != BOUNDARY
    cxs, cys = np.nonzero(free)
    if len(cxs):
        px = XMIN + (cxs + 0.5) * dx
        py = YMIN + (cys + 0.5) * dy
        inside = points_in_poly(px, py, list(zip(vx, vy)))
        cls[cxs[inside], cys[inside]] = IN
    return cls


def classify_covering_cells(verts, grid_n: int = GRID_N) -> list[tuple[int, int]]:
    """For one polygon: [(cell_id, class)] over its envelope's covering
    cells, class in {IN, BOUNDARY} (OUT cells are dropped — they can
    never contain a member point, the bbox prefilter alone would have
    sent them to the exact test). Same conservative edge-bbox argument
    as classify_cells. Vectorized over the covering-cell grid."""
    from .. import fixtures

    vx = np.asarray([v[0] for v in verts], dtype=np.float64)
    vy = np.asarray([v[1] for v in verts], dtype=np.float64)
    if vx[0] == vx[-1] and vy[0] == vy[-1]:
        vx, vy = vx[:-1], vy[:-1]
    ex0 = np.minimum(vx, np.roll(vx, -1)) - _EPS
    ex1 = np.maximum(vx, np.roll(vx, -1)) + _EPS
    ey0 = np.minimum(vy, np.roll(vy, -1)) - _EPS
    ey1 = np.maximum(vy, np.roll(vy, -1)) + _EPS

    dx = XSPAN / grid_n
    dy = YSPAN / grid_n
    cover = fixtures.covering_cells(verts, grid_n=grid_n)
    if not cover:
        return []
    cxs = np.array([c[0] for c in cover], dtype=np.int64)
    cys = np.array([c[1] for c in cover], dtype=np.int64)
    x0 = XMIN + cxs * dx
    y0 = YMIN + cys * dy
    # (cells, edges) bbox-overlap test
    bnd = (
        (ex0[None, :] <= (x0 + dx)[:, None])
        & (x0[:, None] <= ex1[None, :])
        & (ey0[None, :] <= (y0 + dy)[:, None])
        & (y0[:, None] <= ey1[None, :])
    ).any(axis=1)
    ids = cxs * grid_n + cys
    out = [(int(i), BOUNDARY) for i in ids[bnd]]
    free = ~bnd
    if free.any():
        inside = points_in_poly(x0[free] + dx / 2, y0[free] + dy / 2, verts)
        out.extend((int(i), IN) for i in ids[free][inside])
    return out


def cells_of_class(cls: np.ndarray, which: int) -> list[int]:
    """Flattened cell ids (cx * grid_n + cy) of a class."""
    n = cls.shape[0]
    cxs, cys = np.nonzero(cls == which)
    return (cxs.astype(np.int64) * n + cys.astype(np.int64)).tolist()
