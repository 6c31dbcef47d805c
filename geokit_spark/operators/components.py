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


def _tile_labels(
    tiles: DataFrame, with_adjacency: bool = False
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Run the distributed labeling; returns (summaries, edges,
    adjacency) pandas frames with globally-unique labels
    (tile_id * T^2 + local). adjacency holds within-tile neighboring
    label pairs (for sieve's largest-neighbor merge); cross-tile
    adjacency comes from the edge strips."""
    t = TILE_SIZE

    def fn(batches):
        for pdf in batches:
            srows, erows, arows = [], [], []
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
                         "n": int(c), "label_b": 0}
                    )
                for side, lv, vv in (
                    ("l", glab[:, 0], m[:, 0]), ("r", glab[:, -1], m[:, -1]),
                    ("t", glab[0, :], m[0, :]), ("b", glab[-1, :], m[-1, :]),
                ):
                    for off in range(t):
                        erows.append(
                            {"kind": "e", "tile_x": r.tile_x, "tile_y": r.tile_y,
                             "side": side, "off": off, "label": int(lv[off]),
                             "value": float(vv[off]), "n": 0, "label_b": 0}
                        )
                if with_adjacency:
                    # component-level neighbor pairs (deduped in-tile)
                    pairs = set()
                    a, b = glab[:, :-1], glab[:, 1:]
                    diff = a != b
                    pairs.update(zip(a[diff].tolist(), b[diff].tolist()))
                    a, b = glab[:-1, :], glab[1:, :]
                    diff = a != b
                    pairs.update(zip(a[diff].tolist(), b[diff].tolist()))
                    for la, lb in pairs:
                        arows.append(
                            {"kind": "a", "tile_x": r.tile_x, "tile_y": r.tile_y,
                             "side": "", "off": 0, "label": int(la),
                             "value": 0.0, "n": 0, "label_b": int(lb)}
                        )
            yield pd.DataFrame(srows + erows + arows)

    out = tiles.mapInPandas(
        fn,
        schema="kind string, tile_x int, tile_y int, side string, off int, "
        "label long, value double, n long, label_b long",
    ).toPandas()
    return (
        out[out.kind == "s"],
        out[out.kind == "e"],
        out[out.kind == "a"],
    )


def _seam_union(summaries: pd.DataFrame, edges: pd.DataFrame) -> _UnionFind:
    """Union-find over global labels with cross-tile seam merges:
    right edge of (x,y) meets left edge of (x+1,y); bottom meets top."""
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
    return uf


def _components(summaries: pd.DataFrame, uf: _UnionFind) -> pd.DataFrame:
    roots = summaries["label"].map(lambda g: uf.find(int(g)))
    return (
        summaries.assign(root=roots)
        .groupby(["root", "value"], as_index=False)["n"]
        .sum()
    )


def connected_components(tiles: DataFrame) -> pd.DataFrame:
    """(value, n_components, n_pixels, max_component) across the whole
    raster. Distributed labeling + driver seam merge."""
    summaries, edges, _ = _tile_labels(tiles)
    comp = _components(summaries, _seam_union(summaries, edges))
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
    """Sieve summary (drop mode): per value, pixels surviving the
    min_size filter. See sieve_merge for the GDAL largest-neighbor
    merge semantics."""
    summaries, edges, _ = _tile_labels(tiles)
    comp = _components(summaries, _seam_union(summaries, edges))
    kept = comp[comp["n"] >= min_size]
    return (
        kept.groupby("value", as_index=False)
        .agg(n_components=("root", "count"), n_pixels=("n", "sum"))
        .sort_values("value")
        .reset_index(drop=True)
    )


def sieve_merge(tiles: DataFrame, min_size: int) -> pd.DataFrame:
    """GDAL-style sieve (reference raster.sieve, raster.py:2426-2557):
    components smaller than min_size are merged into their LARGEST
    neighboring component (its value absorbs their pixels), processed
    smallest-first so chains of tiny components collapse into the
    dominant neighbor. Returns per-value pixel totals after merging —
    total pixel count is invariant.

    Adjacency is component-level: within-tile neighbor pairs from the
    labeling stage + cross-seam pairs from the edge strips; all
    root-mapped before merging."""
    summaries, edges, adj = _tile_labels(tiles, with_adjacency=True)
    uf = _seam_union(summaries, edges)
    comp = _components(summaries, uf)
    size = {int(r.root): int(r.n) for r in comp.itertuples()}
    value = {int(r.root): float(r.value) for r in comp.itertuples()}

    # adjacency between roots (within-tile pairs + seam pairs of
    # differing value — same-value seam pairs were unioned already)
    nbrs: dict[int, set[int]] = {r: set() for r in size}

    def add_pair(a: int, b: int):
        ra, rb = uf.find(a), uf.find(b)
        if ra != rb:
            nbrs[ra].add(rb)
            nbrs[rb].add(ra)

    for r in adj.itertuples():
        add_pair(int(r.label), int(r.label_b))
    idx = {
        (r.tile_x, r.tile_y, r.side, r.off): int(r.label)
        for r in edges.itertuples()
    }
    for r in edges.itertuples():
        if r.side == "r":
            other = idx.get((r.tile_x + 1, r.tile_y, "l", r.off))
        elif r.side == "b":
            other = idx.get((r.tile_x, r.tile_y + 1, "t", r.off))
        else:
            continue
        if other is not None:
            add_pair(int(r.label), other)

    # merge smallest-first into the largest current neighbor
    merged_into: dict[int, int] = {}

    def resolve(r: int) -> int:
        while r in merged_into:
            r = merged_into[r]
        return r

    for root in sorted(size, key=lambda r: size[r]):
        if size[root] >= min_size:
            continue
        cand = {resolve(nb) for nb in nbrs.get(root, ())} - {root}
        if not cand:
            continue
        target = max(cand, key=lambda r: size[r])
        size[target] += size[root]
        nbrs.setdefault(target, set()).update(
            resolve(nb) for nb in nbrs.get(root, ()) if resolve(nb) != target
        )
        merged_into[root] = target
        size[root] = 0

    out: dict[float, int] = {}
    for root, n in size.items():
        if n > 0:
            v = value[resolve(root)]
            out[v] = out.get(v, 0) + n
    return (
        pd.DataFrame(
            sorted(out.items()), columns=["value", "n_pixels"]
        ).reset_index(drop=True)
    )
