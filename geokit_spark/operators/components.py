"""Cross-tile connected components — the core of polygonize / sieve
(reference geom.polygonizeMatrix geom.py:525-702, raster.sieve
raster.py:2426-2557; SURVEY §7 'hard parts': verified on counts/areas,
cell-level output is the primary artifact).

Distributed shape:

  tiles ──mapInPandas──► per-tile local labeling (vectorized min-label
        propagation over same-value 4-neighbors) emitting
        (a) per-label summaries (value, n_pixels) and
        (b) tile-edge strips (side, offset, label, value)
  edge strips (tiny: 4 * T per tile) ──collect──► driver union-find
        merges labels across adjacent tile seams
  final: per-value component counts / sizes; sieve = drop components
        below min_size (merge-into-largest-neighbor is noted as the
        GDAL behavior difference — components here become noData).

At 100 TB the driver union-find grows with the number of SEAM
components, not pixels; for deeper scale the same merge runs as an
iterative label-propagation join until fixpoint (noted, not needed at
this raster size).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import TILE_SIZE


def label_block(m: np.ndarray) -> np.ndarray:
    """4-connectivity component labels for one value matrix.
    Vectorized min-label propagation: every pixel starts as its own
    label; repeatedly take the min over same-value neighbors."""
    t = m.shape[0]
    labels = np.arange(m.size, dtype=np.int64).reshape(m.shape)
    while True:
        new = labels.copy()
        same = m[1:, :] == m[:-1, :]
        np.minimum(new[1:, :], np.where(same, labels[:-1, :], new[1:, :]), out=new[1:, :])
        np.minimum(new[:-1, :], np.where(same, labels[1:, :], new[:-1, :]), out=new[:-1, :])
        same = m[:, 1:] == m[:, :-1]
        np.minimum(new[:, 1:], np.where(same, labels[:, :-1], new[:, 1:]), out=new[:, 1:])
        np.minimum(new[:, :-1], np.where(same, labels[:, 1:], new[:, :-1]), out=new[:, :-1])
        if np.array_equal(new, labels):
            return labels
        labels = new


class _UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        root = x
        while self.parent.setdefault(root, root) != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def _tile_labels(tiles: DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Run the distributed labeling; returns (summaries, edges) pandas
    frames with globally-unique labels (tile_id * T^2 + local)."""
    t = TILE_SIZE

    def fn(batches):
        for pdf in batches:
            srows, erows = [], []
            for r in pdf.itertuples():
                m = np.asarray(r.data, dtype=np.float64).reshape(t, t)
                lab = label_block(m)
                base = (int(r.tile_x) * 1000 + int(r.tile_y)) * t * t
                glab = lab + base
                vals, first_idx, counts = np.unique(
                    glab, return_index=True, return_counts=True
                )
                mv = m.ravel()[first_idx]
                for g, v, c in zip(vals, mv, counts):
                    srows.append(
                        {"kind": "s", "tile_x": r.tile_x, "tile_y": r.tile_y,
                         "side": "", "off": 0, "label": int(g), "value": float(v),
                         "n": int(c)}
                    )
                for side, lv, vv in (
                    ("l", glab[:, 0], m[:, 0]), ("r", glab[:, -1], m[:, -1]),
                    ("t", glab[0, :], m[0, :]), ("b", glab[-1, :], m[-1, :]),
                ):
                    for off in range(t):
                        erows.append(
                            {"kind": "e", "tile_x": r.tile_x, "tile_y": r.tile_y,
                             "side": side, "off": off, "label": int(lv[off]),
                             "value": float(vv[off]), "n": 0}
                        )
            yield pd.DataFrame(srows + erows)

    out = tiles.mapInPandas(
        fn,
        schema="kind string, tile_x int, tile_y int, side string, off int, "
        "label long, value double, n long",
    ).toPandas()
    return out[out.kind == "s"], out[out.kind == "e"]


def connected_components(tiles: DataFrame) -> pd.DataFrame:
    """(value, n_components, n_pixels, max_component) across the whole
    raster. Distributed labeling + driver seam merge."""
    summaries, edges = _tile_labels(tiles)
    uf = _UnionFind()
    for g in summaries["label"]:
        uf.find(int(g))
    # seam merges: right edge of (x,y) meets left edge of (x+1,y);
    # bottom edge of (x,y) meets top edge of (x,y+1)
    idx = {
        (r.tile_x, r.tile_y, r.side, r.off): (int(r.label), r.value)
        for r in edges.itertuples()
    }
    for r in edges.itertuples():
        if r.side == "r":
            other = idx.get((r.tile_x + 1, r.tile_y, "l", r.off))
        elif r.side == "b":
            other = idx.get((r.tile_x, r.tile_y + 1, "t", r.off))
        else:
            continue
        if other is not None and other[1] == r.value:
            uf.union(int(r.label), other[0])

    roots = summaries["label"].map(lambda g: uf.find(int(g)))
    comp = (
        summaries.assign(root=roots)
        .groupby(["root", "value"], as_index=False)["n"]
        .sum()
    )
    return (
        comp.groupby("value", as_index=False)
        .agg(
            n_components=("root", "count"),
            n_pixels=("n", "sum"),
            max_component=("n", "max"),
        )
        .sort_values("value")
        .reset_index(drop=True)
    )


def sieve_small_components(tiles: DataFrame, min_size: int) -> pd.DataFrame:
    """Sieve summary: per value, pixels surviving the min_size filter
    (components smaller than min_size -> dropped; GDAL merges them into
    the largest neighbor — documented deviation, counts/areas are the
    parity artifact per SURVEY §7)."""
    summaries, edges = _tile_labels(tiles)
    uf = _UnionFind()
    for g in summaries["label"]:
        uf.find(int(g))
    idx = {
        (r.tile_x, r.tile_y, r.side, r.off): (int(r.label), r.value)
        for r in edges.itertuples()
    }
    for r in edges.itertuples():
        if r.side == "r":
            other = idx.get((r.tile_x + 1, r.tile_y, "l", r.off))
        elif r.side == "b":
            other = idx.get((r.tile_x, r.tile_y + 1, "t", r.off))
        else:
            continue
        if other is not None and other[1] == r.value:
            uf.union(int(r.label), other[0])
    roots = summaries["label"].map(lambda g: uf.find(int(g)))
    comp = (
        summaries.assign(root=roots)
        .groupby(["root", "value"], as_index=False)["n"]
        .sum()
    )
    kept = comp[comp["n"] >= min_size]
    return (
        kept.groupby("value", as_index=False)
        .agg(n_components=("root", "count"), n_pixels=("n", "sum"))
        .sort_values("value")
        .reset_index(drop=True)
    )
