"""Cross-tile connected components — the core of polygonize / sieve
(reference geom.polygonizeMatrix geom.py:525-702, raster.sieve
raster.py:2426-2557; SURVEY §7 'hard parts': verified on counts/areas,
cell-level output is the primary artifact).

Distributed shape:

  tiles ──mapInPandas──► per-tile local labeling (vectorized min-label
        propagation over same-value 4- or 8-neighbors) emitting
        (a) per-label summaries (value, n_pixels) and
        (b) tile-edge strips (side, offset, label, value)
  seam pairs: DataFrame self-join of edge strips on global seam
        coordinates (vectorized; 8-conn adds the ±1 offsets, which
        also covers corner-to-corner tile diagonals)
  seam merge: ITERATIVE min-label contraction join until fixpoint
        (edges rewritten through each round's mapping → O(log) rounds)
        — fully distributed; the per-value summary aggregation is a
        plain groupBy. Nothing proportional to pixel count ever
        reaches the driver.

Label packing: label = (tile_x << 36) | (tile_y << 12) | local with
local < TILE_SIZE² ≤ 2^12 — collision-free for any raster up to
2^26 × 2^24 tiles (the round-1 (tile_x*1000+tile_y) base collided at
tile_y ≥ 1000); coordinates are validated in the labeling stage.

sieve has two executions of one merge contract: a driver-side loop
over the collected COMPONENT-granularity graph (never pixels), and —
for component counts where even that collect is too much — a fully
distributed fixpoint that processes order-minimal-within-distance-2
pending components in parallel rounds (bit-identical by construction
and by pytest; see _sieve_merge_distributed). sieve_merge auto-routes
on component count.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import TILE_SIZE

# per-component cap on polygonize ring assembly (one applyInPandas task
# holds O(component perimeter) edges and walks them in a Python loop;
# 20M edges ~ tens of seconds / ~1 GB in one task — past that the
# operator fails actionably instead of silently concentrating a
# continental coastline in one straggler). Env-tunable.
_POLYGONIZE_MAX_EDGES = int(
    os.environ.get("GEOKIT_POLYGONIZE_MAX_EDGES", str(20_000_000))
)

_LOCAL_BITS = 12
_TY_BITS = 24
_TY_SHIFT = _LOCAL_BITS
_TX_SHIFT = _LOCAL_BITS + _TY_BITS
_MAX_TX = 1 << (62 - _TX_SHIFT)
_MAX_TY = 1 << _TY_BITS

assert TILE_SIZE * TILE_SIZE <= (1 << _LOCAL_BITS)

_LABEL_SCHEMA = (
    "kind string, tile_x int, tile_y int, side string, off int, "
    "label long, value double, n long, label_b long"
)


def label_block(m: np.ndarray, connectivity: int = 4) -> np.ndarray:
    """Component labels for one value matrix (4- or 8-connectivity).
    Vectorized min-label propagation: every pixel starts as its own
    label; repeatedly take the min over same-value neighbors."""
    labels = np.arange(m.size, dtype=np.int64).reshape(m.shape)
    while True:
        new = labels.copy()
        same = m[1:, :] == m[:-1, :]
        np.minimum(new[1:, :], np.where(same, labels[:-1, :], new[1:, :]), out=new[1:, :])
        np.minimum(new[:-1, :], np.where(same, labels[1:, :], new[:-1, :]), out=new[:-1, :])
        same = m[:, 1:] == m[:, :-1]
        np.minimum(new[:, 1:], np.where(same, labels[:, :-1], new[:, 1:]), out=new[:, 1:])
        np.minimum(new[:, :-1], np.where(same, labels[:, 1:], new[:, :-1]), out=new[:, :-1])
        if connectivity == 8:
            same = m[1:, 1:] == m[:-1, :-1]
            np.minimum(new[1:, 1:], np.where(same, labels[:-1, :-1], new[1:, 1:]), out=new[1:, 1:])
            np.minimum(new[:-1, :-1], np.where(same, labels[1:, 1:], new[:-1, :-1]), out=new[:-1, :-1])
            same = m[1:, :-1] == m[:-1, 1:]
            np.minimum(new[1:, :-1], np.where(same, labels[:-1, 1:], new[1:, :-1]), out=new[1:, :-1])
            np.minimum(new[:-1, 1:], np.where(same, labels[1:, :-1], new[:-1, 1:]), out=new[:-1, 1:])
        if np.array_equal(new, labels):
            return labels
        labels = new


def _label_frames_df(
    tiles: DataFrame, connectivity: int = 4, with_adjacency: bool = False,
    with_boundary: bool = False,
) -> DataFrame:
    """Distributed labeling pass. One mapInPandas over tiles emitting
    unified rows: kind 's' per-component summaries, 'e' edge-strip
    entries, 'a' within-tile component adjacency pairs (for sieve),
    and (with_boundary) 'b' within-tile directed boundary edges for
    polygonize — endpoints packed as (x << 32 | y) into the n/label_b
    columns so the schema stays unified and the tiles are LABELED ONCE
    (review fix: polygonize used to re-scan and re-label every tile in
    a second pass). All frame construction is vectorized (no per-pixel
    Python loops). The result is localCheckpoint-ed so summaries and
    edges can be consumed by separate downstream plans without
    re-labeling."""
    t = TILE_SIZE

    def fn(batches):
        for pdf in batches:
            frames = []
            for r in pdf.itertuples():
                tx, ty = int(r.tile_x), int(r.tile_y)
                if not (0 <= tx < _MAX_TX and 0 <= ty < _MAX_TY):
                    raise ValueError(
                        f"tile coords ({tx},{ty}) outside the label-packing "
                        f"range [0,{_MAX_TX})x[0,{_MAX_TY})"
                    )
                m = np.asarray(r.data, dtype=np.float64).reshape(t, t)
                lab = label_block(m, connectivity)
                base = (np.int64(tx) << _TX_SHIFT) | (np.int64(ty) << _TY_SHIFT)
                glab = lab + base
                vals, first_idx, counts = np.unique(
                    glab, return_index=True, return_counts=True
                )
                # canonical pixel id (gy<<32|gx of the label's first
                # pixel): an implementation-independent component
                # identity — the deterministic tie-break key shared
                # with the sieve oracle (internal labels differ
                # between tiling schemes)
                gy = ty * t + first_idx // t
                gx = tx * t + first_idx % t
                pix = (gy.astype(np.int64) << 32) | gx.astype(np.int64)
                frames.append(
                    pd.DataFrame(
                        {
                            "kind": "s", "tile_x": tx, "tile_y": ty,
                            "side": "", "off": 0, "label": vals,
                            "value": m.ravel()[first_idx],
                            "n": counts.astype(np.int64), "label_b": pix,
                        }
                    )
                )
                offs = np.arange(t, dtype=np.int32)
                for side, lv, vv in (
                    ("l", glab[:, 0], m[:, 0]), ("r", glab[:, -1], m[:, -1]),
                    ("t", glab[0, :], m[0, :]), ("b", glab[-1, :], m[-1, :]),
                ):
                    frames.append(
                        pd.DataFrame(
                            {
                                "kind": "e", "tile_x": tx, "tile_y": ty,
                                "side": side, "off": offs, "label": lv,
                                "value": vv, "n": 0, "label_b": 0,
                            }
                        )
                    )
                if with_boundary:
                    gx0, gy0 = tx * t, ty * t
                    edge_rows = []
                    yy, xx = np.nonzero(m[:, 1:] != m[:, :-1])
                    lx, ly = gx0 + xx, gy0 + yy
                    # left cell RIGHT edge / right cell LEFT edge
                    edge_rows.append((glab[yy, xx], lx + 1, ly, lx + 1, ly + 1))
                    edge_rows.append((glab[yy, xx + 1], lx + 1, ly + 1, lx + 1, ly))
                    yy, xx = np.nonzero(m[1:, :] != m[:-1, :])
                    lx, ly = gx0 + xx, gy0 + yy
                    # upper cell BOTTOM edge / lower cell TOP edge
                    edge_rows.append((glab[yy, xx], lx + 1, ly + 1, lx, ly + 1))
                    edge_rows.append((glab[yy + 1, xx], lx, ly + 1, lx + 1, ly + 1))
                    for lb, x1, y1, x2, y2 in edge_rows:
                        if len(lb) == 0:
                            continue
                        frames.append(
                            pd.DataFrame(
                                {
                                    "kind": "b", "tile_x": tx, "tile_y": ty,
                                    "side": "", "off": 0,
                                    "label": lb.astype(np.int64),
                                    "value": 0.0,
                                    "n": (x1.astype(np.int64) << 32)
                                    | y1.astype(np.int64),
                                    "label_b": (x2.astype(np.int64) << 32)
                                    | y2.astype(np.int64),
                                }
                            )
                        )
                if with_adjacency:
                    pairs = set()
                    for a, b in (
                        (glab[:, :-1], glab[:, 1:]),
                        (glab[:-1, :], glab[1:, :]),
                    ):
                        diff = a != b
                        pairs.update(zip(a[diff].tolist(), b[diff].tolist()))
                    if connectivity == 8:
                        for a, b in (
                            (glab[:-1, :-1], glab[1:, 1:]),
                            (glab[:-1, 1:], glab[1:, :-1]),
                        ):
                            diff = a != b
                            pairs.update(zip(a[diff].tolist(), b[diff].tolist()))
                    if pairs:
                        arr = np.asarray(sorted(pairs), dtype=np.int64)
                        frames.append(
                            pd.DataFrame(
                                {
                                    "kind": "a", "tile_x": tx, "tile_y": ty,
                                    "side": "", "off": 0, "label": arr[:, 0],
                                    "value": 0.0, "n": 0, "label_b": arr[:, 1],
                                }
                            )
                        )
            yield pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
                columns=["kind", "tile_x", "tile_y", "side", "off",
                         "label", "value", "n", "label_b"]
            )

    return tiles.mapInPandas(fn, schema=_LABEL_SCHEMA).localCheckpoint()


def _seam_pairs_df(
    edges: DataFrame, connectivity: int = 4, same_value_only: bool = True
) -> DataFrame:
    """Cross-tile seam pairs (a, b) of touching components, via
    equijoins on GLOBAL seam coordinates. Vertical seams: r-strip
    of tile col x meets l-strip of col x+1 at global rows
    tile_y*T + off; 8-conn explodes the right side to rows ±1, which
    also covers corner-to-corner tile diagonals (different tile_y).
    same_value_only=False keeps cross-value pairs too and returns
    (a, b, va, vb) — the seam half of the sieve's adjacency graph."""
    t = TILE_SIZE
    d_offsets = [0, -1, 1] if connectivity == 8 else [0]

    def one_axis(side_a: str, side_b: str) -> DataFrame:
        # side 'r'/'l' strips run along global rows; 't'/'b' along cols
        a = edges.filter(F.col("side") == side_a).select(
            (F.col("tile_x") + (1 if side_a == "r" else 0)).alias("seam"),
            (
                (F.col("tile_y") if side_a in ("r", "l") else F.col("tile_x"))
                * F.lit(t) + F.col("off")
            ).alias("g"),
            F.col("label").alias("a"),
            F.col("value").alias("va"),
        ) if side_a == "r" else edges.filter(F.col("side") == side_a).select(
            (F.col("tile_y") + 1).alias("seam"),
            (F.col("tile_x") * F.lit(t) + F.col("off")).alias("g"),
            F.col("label").alias("a"),
            F.col("value").alias("va"),
        )
        b = edges.filter(F.col("side") == side_b).select(
            (F.col("tile_x") if side_b == "l" else F.col("tile_y")).alias("seam"),
            (
                (F.col("tile_y") if side_b == "l" else F.col("tile_x"))
                * F.lit(t) + F.col("off")
            ).alias("g"),
            F.col("label").alias("b"),
            F.col("value").alias("vb"),
        )
        a = a.withColumn("dg", F.explode(F.array(*[F.lit(d) for d in d_offsets])))
        j = a.join(
            b,
            (a["seam"] == b["seam"]) & (b["g"] == a["g"] + a["dg"]),
            "inner",
        )
        if same_value_only:
            return j.filter(F.col("va") == F.col("vb")).select("a", "b")
        return j.select("a", "b", "va", "vb")

    vert = one_axis("r", "l")
    horz = one_axis("b", "t")
    return vert.unionByName(horz)


def _resolve_roots(pairs: DataFrame, max_iters: int = 64) -> DataFrame:
    """(label, root): canonical representative per connected component
    of the seam-pair graph. Each round: (1) min-label contraction —
    every current root takes min(self, min neighbor) — and (2) a
    POINTER-JUMPING composition (root := root-of-root), which is what
    makes convergence O(log component diameter); contraction alone is
    O(diameter) — one hop per round on a path graph — a silent-wrong-
    answer trap at max_iters (review finding). Raises if the edge set
    has not drained when the round budget runs out."""
    def compress(m: DataFrame) -> DataFrame:
        """root := root-of-root until fixpoint (chains halve per pass;
        the edge set can drain before the label mapping is flat)."""
        for _ in range(max_iters):
            rr = m.select(
                F.col("label").alias("rl"), F.col("root").alias("rr")
            )
            m2 = (
                m.join(rr, m["root"] == rr["rl"], "left")
                .select("label", F.coalesce("rr", "root").alias("root"))
                .localCheckpoint()
            )
            changed = (
                m2.alias("n")
                .join(m.alias("o"), "label")
                .filter(F.col("n.root") != F.col("o.root"))
                .isEmpty()
            )
            m = m2
            if changed:  # isEmpty() True == no row changed
                return m
        raise RuntimeError("root compression did not converge")

    m = (
        pairs.select(F.col("a").alias("label"))
        .unionByName(pairs.select(F.col("b").alias("label")))
        .distinct()
        .withColumn("root", F.col("label"))
    )
    e = pairs.filter(F.col("a") != F.col("b")).distinct().localCheckpoint()
    for _ in range(max_iters):
        if e.isEmpty():
            return compress(m)
        sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        nm = (
            sym.groupBy("a")
            .agg(F.min("b").alias("mb"))
            .select(
                F.col("a").alias("old"),
                F.least(F.col("a"), F.col("mb")).alias("new"),
            )
            .filter(F.col("old") != F.col("new"))
            .localCheckpoint()
        )
        m = (
            m.join(nm, m["root"] == nm["old"], "left")
            .select("label", F.coalesce("new", "root").alias("root"))
        )
        # pointer jump: compose the mapping with itself (root-of-root)
        rr = m.select(F.col("label").alias("rl"), F.col("root").alias("rr"))
        m = (
            m.join(rr, m["root"] == rr["rl"], "left")
            .select("label", F.coalesce("rr", "root").alias("root"))
            .localCheckpoint()
        )
        # rewrite edges through the FULL jumped mapping, not the
        # per-round delta, so chains collapse geometrically
        ma = m.select(F.col("label").alias("la"), F.col("root").alias("ra"))
        mb = m.select(F.col("label").alias("lb"), F.col("root").alias("rb"))
        e = (
            e.join(ma, e["a"] == ma["la"], "left")
            .join(mb, e["b"] == mb["lb"], "left")
            .select(
                F.coalesce("ra", "a").alias("a"),
                F.coalesce("rb", "b").alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint()
        )
    if not e.isEmpty():
        raise RuntimeError(
            f"_resolve_roots did not converge in {max_iters} rounds"
        )
    return compress(m)


def component_table(tiles: DataFrame, connectivity: int = 4) -> DataFrame:
    """(root, value, n) per global connected component — fully
    distributed (labeling → seam join → iterative merge → groupBy)."""
    lab = _label_frames_df(tiles, connectivity)
    summ = lab.filter(F.col("kind") == "s").select("label", "value", "n")
    edges = lab.filter(F.col("kind") == "e")
    roots = _resolve_roots(_seam_pairs_df(edges, connectivity))
    merged = summ.join(roots, "label", "left").select(
        F.coalesce("root", "label").alias("root"), "value", "n"
    )
    return merged.groupBy("root", "value").agg(F.sum("n").alias("n"))


def connected_components(tiles: DataFrame, connectivity: int = 4) -> DataFrame:
    """(value, n_components, n_pixels, max_component) across the whole
    raster, as a Spark DataFrame."""
    comp = component_table(tiles, connectivity)
    return (
        comp.groupBy("value")
        .agg(
            F.count("*").alias("n_components"),
            F.sum("n").alias("n_pixels"),
            F.max("n").alias("max_component"),
        )
        .orderBy("value")
    )


def sieve_small_components(
    tiles: DataFrame, min_size: int, connectivity: int = 4
) -> pd.DataFrame:
    """Sieve summary (drop mode): per value, pixels surviving the
    min_size filter. See sieve_merge for the GDAL largest-neighbor
    merge semantics."""
    comp = component_table(tiles, connectivity).toPandas()
    kept = comp[comp["n"] >= min_size]
    return (
        kept.groupby("value", as_index=False)
        .agg(n_components=("root", "count"), n_pixels=("n", "sum"))
        .sort_values("value")
        .reset_index(drop=True)
    )


def _component_graph_df(
    tiles: DataFrame, connectivity: int = 4
) -> tuple[DataFrame, DataFrame]:
    """COMPONENT-granularity graph of a labeled raster, reduced
    entirely in Spark and returned as DataFrames (nothing collected).

    Returns (comp, adj):
      comp: (root, value, n, pix) — one row per global connected
            component (same-value seam merges resolved by the
            distributed _resolve_roots), pix = min canonical pixel id.
      adj:  (ra, rb) with ra < rb — one row per unordered pair of
            TOUCHING components (within-tile adjacency + cross-value
            seam pairs, both mapped through the root mapping and
            deduplicated in Spark)."""
    lab = _label_frames_df(tiles, connectivity, with_adjacency=True)
    edges = lab.filter(F.col("kind") == "e")
    all_seam = _seam_pairs_df(
        edges, connectivity, same_value_only=False
    ).localCheckpoint()
    same = all_seam.filter(F.col("va") == F.col("vb")).select("a", "b")
    roots = _resolve_roots(same)

    summ = lab.filter(F.col("kind") == "s").select(
        "label", "value", "n", F.col("label_b").alias("pix")
    )
    comp = (
        summ.join(roots, "label", "left")
        .select(
            F.coalesce("root", "label").alias("root"), "value", "n", "pix"
        )
        .groupBy("root", "value")
        .agg(F.sum("n").alias("n"), F.min("pix").alias("pix"))
    )

    adj_raw = (
        lab.filter(F.col("kind") == "a")
        .select(F.col("label").alias("a"), F.col("label_b").alias("b"))
        .unionByName(all_seam.select("a", "b"))
    )
    ra = roots.select(F.col("label").alias("a"), F.col("root").alias("ma"))
    rb = roots.select(F.col("label").alias("b"), F.col("root").alias("mb"))
    adj = (
        adj_raw.join(ra, "a", "left")
        .join(rb, "b", "left")
        .select(
            F.coalesce("ma", "a").alias("ca"),
            F.coalesce("mb", "b").alias("cb"),
        )
        .filter(F.col("ca") != F.col("cb"))
        .select(
            F.least("ca", "cb").alias("ra"),
            F.greatest("ca", "cb").alias("rb"),
        )
        .distinct()
    )
    return comp, adj


def _component_graph(
    tiles: DataFrame, connectivity: int = 4
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Collected component graph for the driver-side merge loop.

    Driver row count is O(components + component adjacency) —
    independent of pixel count and of tile-border length (the previous
    sieve collected the raw label frame, whose 'e' strips are one row
    per border pixel: a driver OOM at continental rasters). For
    component counts where even THAT is too much (a continental 100 m
    categorical raster has tens of millions of components), use
    sieve_merge(distributed=True), which never collects the graph."""
    comp, adj = _component_graph_df(tiles, connectivity)
    return comp.toPandas(), adj.toPandas()


# Above this many components the driver-side merge loop (dict/set
# over the collected component graph) stops being a sane default — a
# continental 100 m categorical raster has tens of millions — and
# sieve_merge auto-routes to the distributed fixpoint instead.
_SIEVE_DRIVER_MAX = 2_000_000


def sieve_merge(
    tiles: DataFrame,
    min_size: int,
    connectivity: int = 4,
    distributed: bool | None = None,
    max_rounds: int = 256,
) -> pd.DataFrame:
    """GDAL-style sieve (reference raster.sieve, raster.py:2426-2557):
    components smaller than min_size are merged into their LARGEST
    neighboring component (its value absorbs their pixels), processed
    smallest-first so chains of tiny components collapse into the
    dominant neighbor. Returns per-value pixel totals after merging —
    total pixel count is invariant.

    Documented deviations from GDAL (COVERAGE.md): GDAL merges in scan
    order, this merges smallest-first; GDAL's default connectedness is
    8 — pass connectivity=8 for that behavior (the driver query pins
    connectivity=4).

    Two executions of the SAME merge contract (pytest-pinned
    bit-identical on adversarial graphs, tests/test_components.py):

    distributed=False — collect the COMPONENT-granularity graph
      (labeling, seam joins, root resolution and adjacency dedup all
      happen in Spark; the driver never sees a row per pixel) and run
      the sequential smallest-first loop on the driver. O(components)
      driver memory.
    distributed=True — never collect: each round, merge in parallel
      every pending component that is ORDER-MINIMAL among pending
      components within graph distance 2 (see
      _sieve_merge_distributed for why that is exactly the sequential
      semantics). O(per-value totals) driver memory.
    distributed=None (default) — count components and pick:
      driver loop up to _SIEVE_DRIVER_MAX, distributed beyond."""
    comp_df, adj_df = _component_graph_df(tiles, connectivity)
    routed = distributed is None
    if routed:
        # cache BEFORE the routing count: the count fully executes the
        # labeling/seam-join/root-resolution lineage, and without the
        # cache the chosen path would re-execute that whole plan from
        # scratch (a measured 2x on the default route)
        comp_df = comp_df.persist()
        distributed = comp_df.count() > _SIEVE_DRIVER_MAX
    try:
        if distributed:
            return _sieve_merge_distributed(
                comp_df, adj_df, min_size, max_rounds=max_rounds
            )
        return _sieve_merge_driver(
            comp_df.toPandas(), adj_df.toPandas(), min_size
        )
    finally:
        if routed:
            comp_df.unpersist()


def _sieve_merge_driver(
    comp: pd.DataFrame, adj: pd.DataFrame, min_size: int
) -> pd.DataFrame:
    """The sequential smallest-first merge loop over a collected
    component graph — the semantic reference the distributed fixpoint
    is pytest-pinned against."""
    size = {int(r.root): int(r.n) for r in comp.itertuples()}
    value = {int(r.root): float(r.value) for r in comp.itertuples()}
    # canonical component id: min (gy<<32|gx) pixel — the tie-break
    # key shared with the independent sieve oracle
    pix_id = {int(r.root): int(r.pix) for r in comp.itertuples()}

    nbrs: dict[int, set[int]] = {r: set() for r in size}
    for r in adj.itertuples():
        nbrs[int(r.ra)].add(int(r.rb))
        nbrs[int(r.rb)].add(int(r.ra))

    # merge smallest-first into the largest current neighbor
    merged_into: dict[int, int] = {}

    def resolve(r: int) -> int:
        while r in merged_into:
            r = merged_into[r]
        return r

    # deterministic order contract (shared with the sieve oracle):
    # process smallest-first with the canonical pixel id as tie-break;
    # merge into the largest neighbor, smallest canonical id winning
    # size ties
    for root in sorted(size, key=lambda r: (size[r], pix_id[r])):
        if size[root] >= min_size:
            continue
        cand = {resolve(nb) for nb in nbrs.get(root, ())} - {root}
        if not cand:
            continue
        target = max(cand, key=lambda r: (size[r], -pix_id[r]))
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


def _materialize(df: DataFrame) -> DataFrame:
    """Round-boundary materialization for the iterative fixpoint.

    localCheckpoint truncates LINEAGE but copies the origin plan's
    ESTIMATED sizeInBytes into the new leaf. Join-size estimation
    multiplies child sizes, and the fixpoint reuses the carried frame
    several times per round, so those estimates compound geometrically
    round over round — after ~15 rounds Catalyst spends hours
    multiplying million-digit BigIntegers just PLANNING the next
    checkpoint (measured: one driver thread pegged in
    BigInteger.multiplyToomCook3). Persisting the checkpointed frame
    and materializing the cache makes downstream plans substitute an
    InMemoryRelation whose stats are the MEASURED cache size, so plan
    products restart from real small numbers at every round boundary.
    Callers unpersist the previous round's frame once its replacement
    is materialized."""
    out = df.localCheckpoint().persist()
    out.count()
    return out


def _release_checkpoint(df) -> None:
    """Best-effort release of a localCheckpoint()'s backing RDD blocks
    (df.unpersist() only clears CacheManager entries; the checkpoint
    RDD itself stays pinned MEMORY_AND_DISK until nondeterministic
    ContextCleaner GC — on the >2M-component sieve path up to 256
    rounds of per-round checkpoints would otherwise accumulate, and
    evicted localCheckpoint blocks are unrecoverable under memory
    pressure)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # fallback: ContextCleaner GC when the RDD is unreferenced


def _sieve_merge_distributed(
    comp0: DataFrame, adj0: DataFrame, min_size: int, max_rounds: int = 256
) -> pd.DataFrame:
    """Distributed execution of sieve_merge's sequential contract.

    The sequential pass visits components once, ordered by the INITIAL
    (size, pix) key, skips any that have grown to >= min_size by their
    turn, and merges the rest into their largest CURRENT neighbor
    (ties -> smallest pix). Sizes only ever grow and a merge of r only
    touches r's distance-1 neighborhood (its target's size; rewired
    edges land between r's neighbors and the target). Each round
    processes, in parallel, three provably order-exchangeable sets:

    DONE set — pending components currently >= min_size, or with no
      neighbors. Nothing can merge INTO a component except via an
      adjacent pending one, and >= min_size is monotone, so their
      sequential turn is a no-op whenever it happens: mark done.

    ORDER-FREE set (the hub fast path) — pending components that are
      `pinned`: every neighbor settled (non-pending — so the
      component can never grow, and its neighbor set can never
      change: rewires only add settled-settled edges) AND the largest
      neighbor leads the second-largest by MORE than the total
      remaining pending mass W (no other neighbor can overtake it
      even absorbing every pending pixel: skip test and target are
      decided forever, immune to every other merge whenever the
      sequential turn comes). A pinned merger's own effect — growing
      its settled target x — is harmless to every pinned pending
      (immune, same argument) and to later-ordered pendings
      (sequential shows them the grown x anyway); the only hazard is
      an EARLIER-ordered non-pinned pending adjacent to x whose
      argmax could flip toward the prematurely-grown x. So release a
      pinned merger iff its order key precedes every non-pinned
      pending adjacent to its target. This releases the dominant
      real-world shape — thousands of specks on one large
      background — in one round (a pure distance-2 rule degenerates
      to one merge per round there: every speck is distance 2 from
      every other through the background), and a chain touching the
      background only holds back the specks ordered after it.

    DISTANCE-2 set (the progress guarantee) — pending components
      whose (n0, pix) key is minimal among pending components within
      graph distance 2. Such components are pairwise >= 3 apart (two
      within distance 2 see each other, so only one is locally
      minimal), no earlier-ordered pending can affect their
      distance-1 reads, and their effects cannot reach each other —
      the generic exchange argument that also covers pending-into-
      pending chain merges the order-free rule excludes.

    Bit-identical to the driver loop by these exchange arguments and
    by pytest on adversarial graphs (hub specks, order-increasing
    chains, shared-neighbor stars, two-hub straddlers, 1e5+
    components). Everything is component-granularity Spark joins; the
    global minimum pending component is always handled, so pending
    strictly shrinks. Rounds ~ O(longest chain of mutually-touching
    small components) after the hub round. Raises (actionable) if
    max_rounds is exhausted."""
    comp = _materialize(
        comp0.select(
            "root", "value", "n", F.col("n").alias("n0"), "pix",
            (F.col("n") < F.lit(min_size)).alias("pending"),
        )
    )
    adj = _materialize(
        adj0.select(F.col("ra").alias("a"), F.col("rb").alias("b"))
        .unionByName(
            adj0.select(F.col("rb").alias("a"), F.col("ra").alias("b"))
        )
    )
    for _ in range(max_rounds):
        pend = comp.filter("pending")
        stats = pend.agg(
            F.count("*").alias("c"), F.sum("n").alias("w")
        ).collect()[0]
        if stats["c"] == 0:
            break
        w_total = int(stats["w"])

        # --- per-pending neighbor aggregates (one pass over adj) ----
        nbq = (
            adj.withColumnRenamed("a", "src")
            .join(
                pend.select(
                    F.col("root").alias("src"), F.col("n").alias("sn")
                ),
                "src",
            )
            .join(
                comp.select(
                    F.col("root").alias("b"),
                    F.col("n").alias("tn"),
                    F.col("pix").alias("tpix"),
                    F.col("pending").alias("tpend"),
                ),
                "b",
            )
            .localCheckpoint()
        )
        per_src = nbq.groupBy("src").agg(
            F.min("sn").alias("sn"),
            F.max(
                F.struct(
                    F.col("tn"), (-F.col("tpix")).alias("neg_pix"),
                    F.col("b"), F.col("tpend"),
                )
            ).alias("t1"),
            F.max(F.col("tpend").cast("int")).alias("any_pend_nbr"),
        )
        n2 = (
            nbq.join(
                per_src.select("src", F.col("t1.b").alias("tb")), "src"
            )
            .filter(F.col("b") != F.col("tb"))
            .groupBy("src")
            .agg(F.max("tn").alias("n2"))
        )
        pin = (
            per_src.join(n2, "src", "left")
            .withColumn(
                "pinned",
                (F.col("sn") >= F.lit(min_size))  # never merges
                | (
                    (F.col("any_pend_nbr") == 0)
                    & (
                        F.col("t1.tn")
                        > F.coalesce(F.col("n2"), F.lit(-1))
                        + F.lit(w_total)
                    )
                ),
            )
            .localCheckpoint()
        )
        # per hub: smallest order key among NON-pinned adjacent
        # pendings — pinned mergers ordered before it are safe to
        # release into the hub (NULL = every adjacent pending pinned)
        okey = pend.select(
            F.col("root").alias("src"), F.struct("n0", "pix").alias("okey")
        )
        kbad = (
            nbq.select(F.col("b").alias("hub"), "src")
            .join(pin.select("src", "pinned"), "src")
            .filter(~F.col("pinned"))
            .join(okey, "src")
            .groupBy("hub")
            .agg(F.min("okey").alias("kbad"))
        )
        s_of = (
            pin.filter(
                F.col("pinned")
                & (F.col("sn") < F.lit(min_size))
                & (~F.col("t1.tpend"))
            )
            .join(okey, "src")
            .join(kbad, F.col("t1.b") == F.col("hub"), "left")
            .filter(F.col("kbad").isNull() | (F.col("okey") < F.col("kbad")))
            .select("src")
        )

        # --- distance-2 order-minimal set (progress guarantee) ------
        pkeys = pend.select("root", F.struct("n0", "pix").alias("key"))
        pmin1 = (
            adj.join(pkeys.withColumnRenamed("root", "b"), "b")
            .groupBy("a").agg(F.min("key").alias("k"))
        )
        pmin2 = (
            adj.join(pmin1.withColumnRenamed("a", "b"), "b")
            .groupBy("a").agg(F.min("k").alias("k"))
        )
        kmin = (
            pmin1.unionByName(pmin2)
            .groupBy("a").agg(F.min("k").alias("kmin"))
            .withColumnRenamed("a", "root")
        )
        s_d2 = (
            pkeys.join(kmin, "root", "left")
            .filter(F.col("kmin").isNull() | (F.col("key") <= F.col("kmin")))
            .join(
                per_src.withColumnRenamed("src", "root")
                .select("root", "sn"),
                "root",
            )
            .filter(F.col("sn") < F.lit(min_size))
            .select(F.col("root").alias("src"))
        )

        mergers = s_of.unionByName(s_d2).distinct().localCheckpoint()
        targets = (
            per_src.join(mergers, "src")
            .select("src", F.col("t1.b").alias("dst"))
            .localCheckpoint()
        )

        # done in place: grown past min_size, or isolated (no adj row)
        grown = pend.filter(F.col("n") >= F.lit(min_size)).select("root")
        isolated = pend.select("root").join(
            adj.select(F.col("a").alias("root")).distinct(), "root",
            "left_anti",
        )
        done = grown.unionByName(isolated).distinct()

        moved = (
            targets.join(
                comp.select(F.col("root").alias("src"), F.col("n").alias("mn")),
                "src",
            )
            .groupBy("dst").agg(F.sum("mn").alias("mn"))
            .withColumnRenamed("dst", "root")
        )
        prev_comp, prev_adj = comp, adj
        comp = _materialize(
            comp.join(
                targets.select(F.col("src").alias("root"))
                .withColumn("gone", F.lit(True)),
                "root", "left",
            )
            .filter(F.col("gone").isNull()).drop("gone")
            .join(moved, "root", "left")
            .withColumn("n", F.col("n") + F.coalesce("mn", F.lit(0)))
            .drop("mn")
            .join(done.withColumn("fin", F.lit(True)), "root", "left")
            .withColumn(
                "pending",
                F.when(F.col("fin"), F.lit(False)).otherwise(F.col("pending")),
            )
            .drop("fin")
        )
        ma = targets.select(F.col("src").alias("a"), F.col("dst").alias("na"))
        mb = targets.select(F.col("src").alias("b"), F.col("dst").alias("nb"))
        adj = _materialize(
            prev_adj.join(ma, "a", "left")
            .select(F.coalesce("na", "a").alias("a"), "b")
            .join(mb, "b", "left")
            .select("a", F.coalesce("nb", "b").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        for frame in (prev_comp, prev_adj):
            frame.unpersist()
            _release_checkpoint(frame)
        for frame in (nbq, pin, mergers, targets):
            _release_checkpoint(frame)
    else:
        for frame in (comp, adj):
            frame.unpersist()
            _release_checkpoint(frame)
        raise RuntimeError(
            f"sieve_merge(distributed=True) did not drain its pending set "
            f"in {max_rounds} rounds — the raster has an unusually long "
            f"chain of mutually-touching small components. Raise "
            f"max_rounds, or run sieve_merge(distributed=False) (driver "
            f"loop, O(components) driver memory)."
        )
    out = (
        comp.groupBy("value")
        .agg(F.sum("n").alias("n_pixels"))
        .orderBy("value")
        .toPandas()
    )
    for frame in (comp, adj):
        frame.unpersist()
        _release_checkpoint(frame)
    return out


# ---------------------------------------------------------------------------
# polygonize: component cell sets -> polygon geometries
# (reference geom.polygonizeMatrix / polygonizeMask, geom.py:525-702)




def _border_boundary_edges(lab: DataFrame) -> DataFrame:
    """Boundary edges on TILE BORDERS: a strip cell's outward edge is a
    boundary edge unless the facing cell in the adjacent tile has the
    same value (those components were merged by the seam join). Pure
    JVM: strip-vs-strip left anti-join on the global seam coordinate +
    value, then column arithmetic for the edge geometry."""
    t = TILE_SIZE
    e = lab.filter(F.col("kind") == "e")

    def facing(side: str):
        """(match_key) rows of the strip FACING `side` strips."""
        other = {"l": "r", "r": "l", "t": "b", "b": "t"}[side]
        o = e.filter(F.col("side") == other)
        if side in ("l", "r"):
            seam = F.col("tile_x") + (1 if other == "r" else 0)
            g = F.col("tile_y") * t + F.col("off")
        else:
            seam = F.col("tile_y") + (1 if other == "b" else 0)
            g = F.col("tile_x") * t + F.col("off")
        return o.select(
            seam.alias("mseam"), g.alias("mg"), F.col("value").alias("mv")
        )

    out = []
    for side in ("l", "r", "t", "b"):
        s = e.filter(F.col("side") == side)
        if side in ("l", "r"):
            seam = F.col("tile_x") + (1 if side == "r" else 0)
            g = F.col("tile_y") * t + F.col("off")
        else:
            seam = F.col("tile_y") + (1 if side == "b" else 0)
            g = F.col("tile_x") * t + F.col("off")
        s = s.withColumn("seam", seam).withColumn("g", g)
        m = facing(side)
        unmatched = s.join(
            m,
            (s["seam"] == m["mseam"]) & (s["g"] == m["mg"])
            & (s["value"] == m["mv"]),
            "left_anti",
        )
        gx = (
            F.col("tile_x") * t
            + (F.col("off") if side in ("t", "b") else
               F.lit(0) if side == "l" else F.lit(t - 1))
        ).cast("long")
        gy = (
            F.col("tile_y") * t
            + (F.col("off") if side in ("l", "r") else
               F.lit(0) if side == "t" else F.lit(t - 1))
        ).cast("long")
        if side == "l":    # (x, y+1) -> (x, y)
            sel = [gx, gy + 1, gx, gy]
        elif side == "r":  # (x+1, y) -> (x+1, y+1)
            sel = [gx + 1, gy, gx + 1, gy + 1]
        elif side == "t":  # (x, y) -> (x+1, y)
            sel = [gx, gy, gx + 1, gy]
        else:              # (x+1, y+1) -> (x, y+1)
            sel = [gx + 1, gy + 1, gx, gy + 1]
        out.append(
            unmatched.select(
                F.col("label"),
                sel[0].alias("x1"), sel[1].alias("y1"),
                sel[2].alias("x2"), sel[3].alias("y2"),
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def _trace_rings(edges: pd.DataFrame):
    """Assemble directed unit edges into closed rings. At ambiguous
    (pinch) vertices — four boundary edges meeting where two holes (or
    a hole and the outside) touch diagonally — the walker takes the
    most-LEFT turn relative to its incoming direction: with interior
    kept on the walker's right, the left turn stays on the boundary of
    the SAME complement region, so pinched holes come out as separate
    simple rings (matching the Euler-characteristic hole count).
    Returns (rings, nh, nv): rings as lists of (x, y) pixel-corner
    tuples (unclosed), nh/nv = horizontal/vertical unit-edge counts."""
    x1 = edges["x1"].to_numpy(np.int64)
    y1 = edges["y1"].to_numpy(np.int64)
    x2 = edges["x2"].to_numpy(np.int64)
    y2 = edges["y2"].to_numpy(np.int64)
    nh = int((y1 == y2).sum())
    nv = int((x1 == x2).sum())
    order = np.lexsort((x1, y1))
    starts: dict[int, list[int]] = {}
    for i in order.tolist():
        starts.setdefault((int(x1[i]) << 32) | int(y1[i]), []).append(i)
    used = np.zeros(len(edges), dtype=bool)
    rings = []
    for s0 in order.tolist():
        if used[s0]:
            continue
        ring = [(int(x1[s0]), int(y1[s0]))]
        used[s0] = True
        cur = s0
        start_key = (int(x1[s0]) << 32) | int(y1[s0])
        while True:
            vx, vy = int(x2[cur]), int(y2[cur])
            key = (vx << 32) | vy
            if key == start_key:
                break
            ring.append((vx, vy))
            dx, dy = vx - int(x1[cur]), vy - int(y1[cur])
            cands = [i for i in starts.get(key, ()) if not used[i]]
            if not cands:
                raise ValueError("open boundary chain (corrupt edges)")
            if len(cands) == 1:
                nxt = cands[0]
            else:
                # turn priority: left, straight, right (y-down coords)
                prio = {(dy, -dx): 0, (dx, dy): 1, (-dy, dx): 2}
                nxt = min(
                    cands,
                    key=lambda i: prio.get(
                        (int(x2[i]) - int(x1[i]), int(y2[i]) - int(y1[i])), 3
                    ),
                )
            used[nxt] = True
            cur = nxt
        rings.append(ring)
    return rings, nh, nv


def polygonize(tiles: DataFrame, pixel_geo=None) -> DataFrame:
    """polygonizeMatrix producing POLYGON GEOMETRIES (reference
    geom.py:525-702; GDALPolygonize default 4-connectedness): one row
    per connected component with its WKB polygon (outer ring + holes),
    exact pixel-space invariants and geo-space area/perimeter.

    pixel_geo: optional (x0, y0, dx, dy) mapping pixel corner (px, py)
    -> geo (x0 + px*dx, y0 - py*dy); defaults to the fixture raster
    grid (constants XMIN/YMAX/PIX_DX/PIX_DY).

    Distributed shape: boundary edges are emitted per tile (interior
    diffs, vectorized) and per seam (strip anti-join, pure JVM) —
    O(total perimeter) rows, never O(pixels); ring assembly is one
    applyInPandas task per component (bounded by that component's own
    perimeter). Output columns:
      root, value, n (pixels), n_rings, nh, nv (unit edge counts),
      area_px (signed shoelace sum == n, the built-in tracer check),
      area, perimeter (geo units), wkb (multi-ring polygon).
    """
    from ..constants import PIX_DX, PIX_DY, XMIN, YMAX
    from ..kernels.wkb import polygon_wkb_rings

    if pixel_geo is None:
        pixel_geo = (XMIN, YMAX, PIX_DX, PIX_DY)
    gx0, gy0, gdx, gdy = (float(v) for v in pixel_geo)

    connectivity = 4  # GDAL polygonize semantics
    lab = _label_frames_df(tiles, connectivity, with_boundary=True)
    roots = _resolve_roots(_seam_pairs_df(lab.filter(F.col("kind") == "e"),
                                          connectivity))
    summ = lab.filter(F.col("kind") == "s").select("label", "value", "n")
    comp = (
        summ.join(roots, "label", "left")
        .select(F.coalesce("root", "label").alias("root"), "value", "n")
        .groupBy("root", "value")
        .agg(F.sum("n").alias("n"))
    )
    # within-tile boundary edges come from the SAME labeling pass
    # (kind 'b', endpoints packed x<<32|y in n/label_b)
    mask32 = F.lit(0xFFFFFFFF)
    interior_edges = lab.filter(F.col("kind") == "b").select(
        "label",
        F.shiftright("n", 32).alias("x1"),
        F.col("n").bitwiseAND(mask32).alias("y1"),
        F.shiftright("label_b", 32).alias("x2"),
        F.col("label_b").bitwiseAND(mask32).alias("y2"),
    )
    edges = interior_edges.unionByName(_border_boundary_edges(lab))
    edges = (
        edges.join(roots, "label", "left")
        .select(
            F.coalesce("root", "label").alias("root"),
            "x1", "y1", "x2", "y2",
        )
    )

    def trace(pdf: pd.DataFrame) -> pd.DataFrame:
        root = int(pdf["root"].iloc[0])
        if len(pdf) > _POLYGONIZE_MAX_EDGES:
            # r8 scale guard (VERDICT r7): this task holds O(component
            # perimeter) edges and walks them in one Python loop — a
            # continental background component would concentrate the
            # whole coastline here. Fail actionably instead of letting
            # one task absorb billions of edges.
            raise ValueError(
                f"polygonize: component {root} has {len(pdf)} boundary "
                f"edges (> GEOKIT_POLYGONIZE_MAX_EDGES="
                f"{_POLYGONIZE_MAX_EDGES}). Ring assembly is one task "
                "per component and scales with its perimeter; for "
                "continental-scale background components use the "
                "cell-level outputs instead (connected_components / "
                "sieve expose per-component pixel sets without ring "
                "assembly), filter the background value out of the "
                "mask before polygonizing, or raise the env cap if one "
                "task may legitimately hold this many edges."
            )
        rings, nh, nv = _trace_rings(pdf)
        signed = []
        geo_rings = []
        for ring in rings:
            arr = np.asarray(ring, dtype=np.float64)
            x, y = arr[:, 0], arr[:, 1]
            s2 = np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)
            signed.append(s2 / 2.0)
            geo_rings.append(
                np.column_stack((gx0 + arr[:, 0] * gdx,
                                 gy0 - arr[:, 1] * gdy))
            )
        area_px = float(sum(signed))
        # outer ring first (largest |signed| area)
        order = sorted(range(len(rings)), key=lambda i: -abs(signed[i]))
        wkb = polygon_wkb_rings([geo_rings[i] for i in order])
        area = abs(area_px) * (gdx * gdy)
        perim = nh * gdx + nv * gdy
        return pd.DataFrame(
            {
                "root": [root], "n_rings": [len(rings)],
                "nh": [nh], "nv": [nv], "area_px": [area_px],
                "area": [area], "perimeter": [perim],
                "wkb": [wkb],
            }
        )

    traced = edges.groupBy("root").applyInPandas(
        trace,
        schema=(
            "root long, n_rings int, nh long, nv long, area_px double, "
            "area double, perimeter double, wkb binary"
        ),
    )
    return comp.join(traced, "root", "inner").select(
        "root", "value", "n", "n_rings", "nh", "nv",
        "area_px", "area", "perimeter", "wkb",
    )
