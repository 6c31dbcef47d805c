"""Distributed contour statistics (reference contours,
raster.py:2044-2137; SURVEY §7: parity on counts/lengths).

Each marching-squares cell spans a 2x2 pixel block, so a tile owns the
cells whose top-left pixel lies inside it and needs a 1-pixel halo on
its right/bottom edges. Halo exchange: every tile is also sent to its
left/top/top-left neighbors; the per-tile pandas stage assembles the
(T+1)^2 block and runs the numpy marching-squares kernel. Final agg:
exact segment counts (+ float lengths) per level."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import TILE_SIZE
from ..kernels.contours import LENGTH_Q, contour_stats_per_level_q
from ..sources.tiles import NTX, NTY


def contour_stats(tiles: DataFrame, levels: list[float]) -> DataFrame:
    """(level, n_segments, total_length) across the raster.

    Lengths are summed as per-segment integer LENGTH_Q quanta, so the
    final totals are exact and independent of partitioning — that is
    what lets the driver hash-compare this against the full-matrix
    golden (oracle.geooracle.contours_sql)."""
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (0, -1)
            for dy in (0, -1)
        ]
    )
    exploded = (
        tiles.withColumn("o", F.explode(offsets))
        .withColumn("tgt_x", F.col("tile_x") + F.col("o.dx"))
        .withColumn("tgt_y", F.col("tile_y") + F.col("o.dy"))
        .filter(
            (F.col("tgt_x") >= 0) & (F.col("tgt_x") < NTX)
            & (F.col("tgt_y") >= 0) & (F.col("tgt_y") < NTY)
        )
        .select("tgt_x", "tgt_y", "tile_x", "tile_y", "data")
    )
    T = TILE_SIZE
    lv = [float(x) for x in levels]

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tgt_x"].iloc[0])
        ty = int(pdf["tgt_y"].iloc[0])
        # (T+1)^2 block: own tile + right/bottom halo strips
        size_x = T + (1 if tx < NTX - 1 else 0)
        size_y = T + (1 if ty < NTY - 1 else 0)
        block = np.full((size_y, size_x), np.nan)
        for r in pdf.itertuples():
            m = np.asarray(r.data, dtype=np.float64).reshape(T, T)
            ox = (r.tile_x - tx) * T
            oy = (r.tile_y - ty) * T
            xs = slice(ox, min(ox + T, size_x))
            ys = slice(oy, min(oy + T, size_y))
            block[ys, xs] = m[: ys.stop - ys.start, : xs.stop - xs.start]
        rows = [
            {"level": level, "n_segments": n, "length_q": q}
            for level, n, q in contour_stats_per_level_q(block, lv)
        ]
        return pd.DataFrame(rows)

    per = exploded.groupBy("tgt_x", "tgt_y").applyInPandas(
        per_tile, schema="level double, n_segments long, length_q long"
    )
    return per.groupBy("level").agg(
        F.sum("n_segments").alias("n_segments"),
        (F.sum("length_q").cast("double") / F.lit(float(LENGTH_Q))).alias(
            "total_length"
        ),
    )


def _link_components(segs: np.ndarray):
    """Union-find over segments sharing exact endpoint coordinates.
    Returns (comp_id array, endpoint degree dict)."""
    key_of: dict[tuple, int] = {}
    parent = list(range(len(segs)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i, j):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)

    deg: dict[tuple, int] = {}
    owner: dict[tuple, int] = {}
    for i, (x0, y0, x1, y1) in enumerate(segs):
        for pt in ((x0, y0), (x1, y1)):
            deg[pt] = deg.get(pt, 0) + 1
            if pt in owner:
                union(i, owner[pt])
            else:
                owner[pt] = i
    comp = np.fromiter((find(i) for i in range(len(segs))), dtype=np.int64)
    return comp, deg


def _walk_chains(segs: list, deg: dict) -> list:
    """Deterministic chain walk (smallest-endpoint-first) for WKB
    output; at even-degree>2 saddle vertices the walker takes the
    smallest unused continuation."""
    adj: dict[tuple, list[int]] = {}
    for i, (x0, y0, x1, y1) in enumerate(segs):
        adj.setdefault((x0, y0), []).append(i)
        adj.setdefault((x1, y1), []).append(i)
    used = [False] * len(segs)
    chains = []

    def other(i, pt):
        x0, y0, x1, y1 = segs[i]
        return (x1, y1) if (x0, y0) == pt else (x0, y0)

    starts = sorted([p for p, d in deg.items() if d % 2 == 1]) + sorted(
        adj.keys()
    )
    for start in starts:
        cands = [i for i in adj[start] if not used[i]]
        while cands:
            i = min(cands)
            chain = [start]
            cur = start
            while True:
                used[i] = True
                cur = other(i, cur)
                chain.append(cur)
                nxt = [j for j in adj[cur] if not used[j]]
                if not nxt:
                    break
                i = min(nxt)
            chains.append(chain)
            cands = [i for i in adj[start] if not used[i]]
    return chains


def contour_polylines(tiles: DataFrame, levels: list[float]) -> DataFrame:
    """Contour POLYLINES (reference contours geometry output,
    raster.py:2044-2137): marching-squares segments harvested per tile
    (same halo exchange as contour_stats) in GLOBAL pixel coords, then
    linked into connected components per level. One row per polyline
    component: (level, n_segs, n_points, closed, length, wkb
    multilinestring in geo coords). 'closed' = no odd-degree endpoint;
    lengths stay exact LENGTH_Q integer quanta.

    Distributed shape (the round-2 plan linked each LEVEL in one task
    — millions of segments in one executor at continental scale):
      1. per-tile stage: marching squares + LOCAL chain linking
         (union-find over exact shared endpoints) — each tile's chains
         contract to one graph node; emits per-segment rows tagged
         with the local chain id, plus the chain's endpoints that lie
         ON a tile seam line (x%T==0 or y%T==0 — cell-edge crossings
         there are exact integers computed from the same halo pixels
         on both sides, so they match bit-for-bit).
      2. seam stitch: self-join of seam endpoints on (level, x, y) →
         chain pairs → the components engine's _resolve_roots
         (iterative min-label contraction + pointer jumping).
      3. final assembly: segments grouped by GLOBAL chain root — one
         task per polyline component, bounded by that component's own
         perimeter (the polygonize trace bound), never by the level's
         total segment count."""
    from ..constants import PIX_DX, PIX_DY, XMIN, YMAX
    from ..kernels.contours import contour_segments
    from ..kernels.wkb import multilinestring_wkb
    from .components import _resolve_roots

    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (0, -1)
            for dy in (0, -1)
        ]
    )
    exploded = (
        tiles.withColumn("o", F.explode(offsets))
        .withColumn("tgt_x", F.col("tile_x") + F.col("o.dx"))
        .withColumn("tgt_y", F.col("tile_y") + F.col("o.dy"))
        .filter(
            (F.col("tgt_x") >= 0) & (F.col("tgt_x") < NTX)
            & (F.col("tgt_y") >= 0) & (F.col("tgt_y") < NTY)
        )
        .select("tgt_x", "tgt_y", "tile_x", "tile_y", "data")
    )
    T = TILE_SIZE
    lv = [float(x) for x in levels]
    if len(lv) >= (1 << 9) or NTX >= (1 << 18) or NTY >= (1 << 18):
        raise ValueError("contour chain-id packing range exceeded")

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        tx = int(pdf["tgt_x"].iloc[0])
        ty = int(pdf["tgt_y"].iloc[0])
        size_x = T + (1 if tx < NTX - 1 else 0)
        size_y = T + (1 if ty < NTY - 1 else 0)
        block = np.full((size_y, size_x), np.nan)
        for r in pdf.itertuples():
            m = np.asarray(r.data, dtype=np.float64).reshape(T, T)
            ox = (r.tile_x - tx) * T
            oy = (r.tile_y - ty) * T
            xs = slice(ox, min(ox + T, size_x))
            ys = slice(oy, min(oy + T, size_y))
            block[ys, xs] = m[: ys.stop - ys.start, : xs.stop - xs.start]
        frames = []
        base_tile = (np.int64(tx) << 36) | (np.int64(ty) << 18)
        for li, level in enumerate(lv):
            _, _, arr = contour_segments(block, level)
            if len(arr) == 0:
                continue
            arr = arr + np.array([tx * T, ty * T, tx * T, ty * T],
                                 dtype=np.float64)
            # local chain linking: chains within this tile contract to
            # one node of the global stitch graph
            comp, _deg = _link_components(arr)
            if len(comp) and int(comp.max()) >= (1 << 18):
                # local ids share bits 0-17 with ty's shift; at large
                # TILE_SIZE a tile can exceed 2^18 chains and would
                # silently merge unrelated polylines — fail loud.
                raise ValueError(
                    "per-tile contour chain id exceeds the 18-bit "
                    f"packing budget ({int(comp.max())} >= 2^18); "
                    "reduce TILE_SIZE"
                )
            cid = (np.int64(li) << 54) | base_tile | comp.astype(np.int64)
            frames.append(
                pd.DataFrame(
                    {
                        "kind": "g", "level": level, "comp": cid,
                        "ax": arr[:, 0], "ay": arr[:, 1],
                        "bx": arr[:, 2], "by": arr[:, 3],
                    }
                )
            )
            # chain endpoints on a seam line participate in stitching
            for px, py in ((arr[:, 0], arr[:, 1]), (arr[:, 2], arr[:, 3])):
                on_seam = (np.mod(px, T) == 0.0) | (np.mod(py, T) == 0.0)
                if on_seam.any():
                    frames.append(
                        pd.DataFrame(
                            {
                                "kind": "p", "level": level,
                                "comp": cid[on_seam],
                                "ax": px[on_seam], "ay": py[on_seam],
                                "bx": 0.0, "by": 0.0,
                            }
                        )
                    )
        cols = ["kind", "level", "comp", "ax", "ay", "bx", "by"]
        if not frames:
            return pd.DataFrame(columns=cols).astype(
                {"level": "float64", "comp": "int64", "ax": "float64",
                 "ay": "float64", "bx": "float64", "by": "float64"}
            )
        return pd.concat(frames, ignore_index=True)[cols]

    tagged = exploded.groupBy("tgt_x", "tgt_y").applyInPandas(
        per_tile,
        schema=(
            "kind string, level double, comp long, ax double, ay double, "
            "bx double, by double"
        ),
    ).localCheckpoint()

    pts = (
        tagged.filter(F.col("kind") == "p")
        .select("level", "comp", "ax", "ay")
        .distinct()
    )
    a = pts.select("level", "ax", "ay", F.col("comp").alias("a"))
    b = pts.select("level", "ax", "ay", F.col("comp").alias("b"))
    pairs = (
        a.join(b, ["level", "ax", "ay"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    roots = _resolve_roots(pairs)
    segs_df = (
        tagged.filter(F.col("kind") == "g")
        .join(roots, tagged["comp"] == roots["label"], "left")
        .select(
            F.coalesce("root", "comp").alias("root"),
            "level",
            F.col("ax").alias("x0"), F.col("ay").alias("y0"),
            F.col("bx").alias("x1"), F.col("by").alias("y1"),
        )
    )

    def link(pdf: pd.DataFrame) -> pd.DataFrame:
        level = float(pdf["level"].iloc[0])
        arr = pdf[["x0", "y0", "x1", "y1"]].to_numpy(np.float64)
        segs = [tuple(row) for row in arr]
        comp, deg = _link_components(arr)
        lengths = np.hypot(arr[:, 2] - arr[:, 0], arr[:, 3] - arr[:, 1])
        lq = np.floor(lengths * LENGTH_Q + 0.5).astype(np.int64)
        rows = []
        for root in np.unique(comp):
            m = comp == root
            sub = [segs[i] for i in np.nonzero(m)[0]]
            sub_deg: dict = {}
            for (x0, y0, x1, y1) in sub:
                for pt in ((x0, y0), (x1, y1)):
                    sub_deg[pt] = sub_deg.get(pt, 0) + 1
            closed = all(d % 2 == 0 for d in sub_deg.values())
            chains = _walk_chains(sub, sub_deg)
            geo = [
                [
                    (XMIN + (x + 0.5) * PIX_DX, YMAX - (y + 0.5) * PIX_DY)
                    for x, y in ch
                ]
                for ch in chains
            ]
            rows.append(
                {
                    "level": level,
                    "n_segs": int(m.sum()),
                    "n_points": len(sub_deg),
                    "closed": bool(closed),
                    "length": float(lq[m].sum()) / float(LENGTH_Q),
                    "wkb": multilinestring_wkb(geo),
                }
            )
        return pd.DataFrame(rows)

    return segs_df.groupBy("root").applyInPandas(
        link,
        schema=(
            "level double, n_segs long, n_points long, closed boolean, "
            "length double, wkb binary"
        ),
    )


def contour_polygons(tiles: DataFrame, levels: list[float]) -> DataFrame:
    """The reference contours' DEFAULT mode (polygonize=True,
    raster.py:2044-2100): polygon BANDS between the contour edges.
    Band id = number of edges <= pixel value (a pure JVM transform),
    then the verified distributed polygonize engine does the rest —
    component merge across tile seams, boundary tracing, multi-ring
    WKB. One row per band component with the polygonize output
    surface."""
    from .components import polygonize

    def band(x):
        col = F.lit(0)
        for lv in levels:
            col = col + F.when(x >= F.lit(float(lv)), 1).otherwise(0)
        return col.cast("double")

    banded = tiles.select(
        "tile_x", "tile_y", F.transform("data", band).alias("data")
    )
    return polygonize(banded)
