"""indicateValues: value-set DSL classification + zonal membership
(the reference's flagship GLAES pipeline, regionmask.py:768-1289).

The DSL is re-implemented with the reference's exact grammar
(regionmask.py:1006-1062): comma-separated elements, each a scalar
("12") or a range "[low-high)" with inclusive [ ] / exclusive ( )
brackets and optional open ends ("[20-]").

Pipeline: classify tiles (numpy boolean ops, compiled once and
broadcast) -> zonal partial/final fraction per zone = the fractional
membership the reference computes via warp-average resampling
(regionmask.py:1074-1092) — here an exact partial/final agg.
"""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .zonal import zonal_partials

_VALUE_RE = re.compile(
    r"(?P<range>(?P<open>[\[\(])(?P<low>[-+]?(\d*\.\d+|\d+\.?))?-"
    r"(?P<high>[-+]?(\d*\.\d+|\d+\.?))?(?P<close>[\]\)]))"
    r"|(?P<value>[-+]?(\d*\.\d+|\d+\.?))"
)


def parse_value_dsl(value: str):
    """DSL string -> list of (low, high, low_incl, high_incl) with None
    for open ends; scalars become (v, v, True, True)."""
    out = []
    for element in value.split(","):
        element = element.replace(" ", "")
        if element == "":
            continue
        m = _VALUE_RE.match(element)
        if m is None or (m["value"] is None and m["range"] is None):
            raise ValueError(f'element "{element}" does not match the DSL')
        if m["value"] is not None:
            v = float(m["value"])
            out.append((v, v, True, True))
        else:
            low = float(m["low"]) if m["low"] is not None else None
            high = float(m["high"]) if m["high"] is not None else None
            out.append((low, high, m["open"] == "[", m["close"] == "]"))
    return out


def compile_classifier(value: str):
    """DSL -> numpy boolean classifier (compiled once per query,
    shipped to executors inside the pandas UDF closure)."""
    terms = parse_value_dsl(value)

    def classify(data: np.ndarray) -> np.ndarray:
        out = np.zeros(data.shape, dtype=bool)
        for low, high, li, hi in terms:
            sel = np.ones(data.shape, dtype=bool)
            if low is not None:
                sel &= (data >= low) if li else (data > low)
            if high is not None:
                sel &= (data <= high) if hi else (data < high)
            out |= sel
        return out

    return classify


def sql_classifier_expr(value: str, col: str) -> str:
    """Same DSL as a SQL boolean expression (for the DuckDB oracle)."""
    terms = parse_value_dsl(value)
    parts = []
    for low, high, li, hi in terms:
        conds = []
        if low is not None:
            conds.append(f"{col} {'>=' if li else '>'} {low!r}")
        if high is not None:
            conds.append(f"{col} {'<=' if hi else '<'} {high!r}")
        parts.append("(" + " AND ".join(conds or ["TRUE"]) + ")")
    return " OR ".join(parts)


def indicate_features(
    tiles: DataFrame, designate: str, region_verts=None,
    buffer_dist: float = 0.0, zones=None, buffer_method: str = "miter",
) -> DataFrame:
    """indicateFeatures (regionmask.py:1293-1583): filter the zones by
    an attribute `where` (designate class), optionally BUFFER each
    selected geometry (the reference's buffer-geom method,
    regionmask.py:1409-1440), rasterize them onto the region grid,
    apply the region mask — output the covered fraction:
    (n_region_pix, n_covered, frac).

    Physical shape: one mapInPandas over tiles testing pixel centers
    against (a) the broadcast region polygon and (b) the filtered
    (buffered) zone polygons; exact integer partials -> final
    single-row agg. Buffering happens driver-side on the broadcast
    polygon side (kernels.buffer), never per pixel."""
    import pandas as pd

    from .. import fixtures
    from ..kernels.buffer import buffer_convex, buffer_safe
    from ..kernels.pip import points_in_poly, points_in_poly_rings
    from ..kernels.raster_fields import pixel_center
    from ..sources.tiles import tile_pixel_indices
    from .zonal import _tile_bbox

    if buffer_method not in ("miter", "safe"):
        raise ValueError(f"unknown buffer_method {buffer_method!r}")
    # 'miter' = buffer_convex (exact for distances below the local
    # feature size — the driver-oracled default); 'safe' = buffer_safe
    # (union-composed, valid at ANY distance including globally
    # self-intersecting offsets)
    buf = buffer_convex if buffer_method == "miter" else buffer_safe
    region = region_verts if region_verts is not None else fixtures.REGION_VERTS
    zsel = []
    for z in (zones or fixtures.ZONES):
        if z["designate"] != designate:
            continue
        verts = z["verts"]
        if buffer_dist != 0.0:
            verts = buf(verts, buffer_dist)
            if not verts:
                continue
        zsel.append((verts, fixtures.poly_bbox(verts)))

    def fn(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                tx, ty = int(r.tile_x), int(r.tile_y)
                bx0, by0, bx1, by1 = _tile_bbox(tx, ty)
                gx, gy = tile_pixel_indices(tx, ty)
                px, py = pixel_center(gx, gy)
                # the region may carry interior rings (donut):
                # even-odd parity over all rings
                in_region = points_in_poly_rings(px, py, region)
                if not in_region.any():
                    continue
                covered = np.zeros(len(px), dtype=bool)
                for verts, (zx0, zy0, zx1, zy1) in zsel:
                    if zx1 < bx0 or zx0 > bx1 or zy1 < by0 or zy0 > by1:
                        continue
                    covered |= points_in_poly(px, py, verts)
                rows.append(
                    {
                        "n_region": int(in_region.sum()),
                        "n_covered": int((in_region & covered).sum()),
                    }
                )
            yield pd.DataFrame(rows, columns=["n_region", "n_covered"])

    p = tiles.mapInPandas(fn, schema="n_region long, n_covered long")
    return p.agg(
        F.sum("n_region").alias("n_region_pix"),
        F.sum("n_covered").alias("n_covered"),
    ).select(
        "n_region_pix",
        "n_covered",
        (F.col("n_covered").cast("double") / F.col("n_region_pix").cast("double")).alias(
            "frac"
        ),
    )


def indicate_values(tiles: DataFrame, value: str, zones=None) -> DataFrame:
    """Per-zone fractional membership of DSL-matching pixels:
    (zone_id, n_pix, n_match, frac)."""
    classify = compile_classifier(value)

    def transform(data: np.ndarray) -> np.ndarray:
        return classify(data).astype(np.float64)

    p = zonal_partials(tiles, zones=zones, transform=transform)
    agg = p.groupBy("zone_id").agg(
        F.sum("n").alias("n_pix"), F.sum("s").alias("_match")
    )
    return agg.select(
        "zone_id",
        "n_pix",
        F.col("_match").cast("long").alias("n_match"),
        (F.col("_match") / F.col("n_pix").cast("double")).alias("frac"),
    )


def classify_tiles(tiles: DataFrame, value: str) -> DataFrame:
    """DSL classification as a 0/1 indicator tile table (the classify
    stage of the reference pipeline, regionmask.py:1006-1062)."""
    import pandas as pd

    classify = compile_classifier(value)

    def fn(batches):
        for pdf in batches:
            out = pdf[["tile_x", "tile_y"]].copy()
            out["data"] = pdf["data"].map(
                lambda a: classify(np.asarray(a, dtype=np.float64)).astype(
                    np.float64
                )
            )
            yield out

    return tiles.mapInPandas(
        fn, schema="tile_x int, tile_y int, data array<double>"
    )


def disc_dilate_kernel(radius: int):
    """(T,T,k,k) window -> (T,T) max over the Euclidean disc — the
    raster analog of the reference's indicateValues buffer path
    (polygonize -> Buffer -> re-rasterize, regionmask.py:1106-1188):
    a pixel indicates if ANY matching pixel lies within `radius`."""
    k = 2 * radius + 1
    dy, dx = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    mask = (dx * dx + dy * dy) <= radius * radius

    def red(w: np.ndarray) -> np.ndarray:
        return w[:, :, mask].max(axis=2)

    return red


def indicate_values_buffered(
    tiles: DataFrame, value: str, radius_px: int, zones=None
) -> DataFrame:
    """indicateValues with the buffer option: classify -> dilate the
    indicator by radius_px (disc) via the halo-exchange kernel ->
    per-zone fraction (zone_id, n_pix, n_match, frac)."""
    from .kernel import kernel_filter_tiles

    ind = classify_tiles(tiles, value)
    dil = kernel_filter_tiles(
        ind, kernel=disc_dilate_kernel(radius_px), size=radius_px,
        edge_value=0.0,
    )
    p = zonal_partials(dil, zones=zones)
    agg = p.groupBy("zone_id").agg(
        F.sum("n").alias("n_pix"), F.sum("s").alias("_match")
    )
    return agg.select(
        "zone_id",
        "n_pix",
        F.col("_match").cast("long").alias("n_match"),
        (F.col("_match") / F.col("n_pix").cast("double")).alias("frac"),
    )
