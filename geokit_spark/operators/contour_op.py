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
    multilinestring in geo coords). 'closed' = no odd-degree endpoint.
    The linking task is per level (segments of one level in one task —
    the same single-geometry bound as the reference's GDAL generator);
    lengths stay exact LENGTH_Q integer quanta."""
    from ..constants import PIX_DX, PIX_DY, XMIN, YMAX
    from ..kernels.contours import contour_segments
    from ..kernels.wkb import multilinestring_wkb

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
        for level in lv:
            _, _, arr = contour_segments(block, level)
            if len(arr) == 0:
                continue
            frames.append(
                pd.DataFrame(
                    {
                        "level": level,
                        "x0": arr[:, 0] + tx * T, "y0": arr[:, 1] + ty * T,
                        "x1": arr[:, 2] + tx * T, "y1": arr[:, 3] + ty * T,
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                columns=["level", "x0", "y0", "x1", "y1"]
            ).astype({"level": "float64"})
        return pd.concat(frames, ignore_index=True)

    segs_df = exploded.groupBy("tgt_x", "tgt_y").applyInPandas(
        per_tile, schema="level double, x0 double, y0 double, x1 double, y1 double"
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

    return segs_df.groupBy("level").applyInPandas(
        link,
        schema=(
            "level double, n_segs long, n_points long, closed boolean, "
            "length double, wkb binary"
        ),
    )
