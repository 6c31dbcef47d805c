"""polygonize: ring tracing hand cases + distributed WKB output
(reference geom.polygonizeMatrix geom.py:525-702)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geokit_spark.constants import PIX_DX, PIX_DY, TILE_SIZE, XMIN, YMAX
from geokit_spark.operators.components import _trace_rings, polygonize
from geokit_spark.sources import tiles as tilesrc


def _edges_for(filled):
    rows = []
    for (x, y) in filled:
        if (x, y - 1) not in filled:
            rows.append((x, y, x + 1, y))
        if (x + 1, y) not in filled:
            rows.append((x + 1, y, x + 1, y + 1))
        if (x, y + 1) not in filled:
            rows.append((x + 1, y + 1, x, y + 1))
        if (x - 1, y) not in filled:
            rows.append((x, y + 1, x, y))
    a = np.asarray(rows)
    return pd.DataFrame(
        {"x1": a[:, 0], "y1": a[:, 1], "x2": a[:, 2], "y2": a[:, 3]}
    )


def _signed(ring):
    a = np.asarray(ring, dtype=np.float64)
    x, y = a[:, 0], a[:, 1]
    return (np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) / 2.0


@pytest.mark.parametrize(
    "filled,n_rings",
    [
        ({(0, 0)}, 1),  # single cell
        ({(x, y) for x in range(3) for y in range(3)} - {(1, 1)}, 2),  # donut
        (  # two holes pinched at a corner -> separate rings
            {(x, y) for x in range(4) for y in range(4)} - {(1, 1), (2, 2)},
            3,
        ),
        (  # hole pinch-touching the outer boundary stays a hole
            {(x, y) for x in range(3) for y in range(3)} - {(1, 1), (0, 0)},
            2,
        ),
    ],
)
def test_trace_rings_hand_cases(filled, n_rings):
    rings, nh, nv = _trace_rings(_edges_for(filled))
    assert len(rings) == n_rings
    # signed areas: outer positive, holes negative, sum == cell count
    assert sum(_signed(r) for r in rings) == len(filled)


def test_polygonize_distributed_seams(spark):
    """A plus-shaped component spanning 4 tile seams must come out as
    ONE polygon with the exact cell count and one ring."""
    t = TILE_SIZE
    # 2x2 tile grid; background 0; plus-shape of value 7 centered on
    # the internal corner (t, t) with arms crossing all four seams
    w = 2 * t
    m = np.zeros((w, w))
    m[t - 10 : t + 10, t - 30 : t + 30] = 7.0  # horizontal bar
    m[t - 30 : t + 30, t - 10 : t + 10] = 7.0  # vertical bar
    rows = [
        (tx, ty, m[ty * t : (ty + 1) * t, tx * t : (tx + 1) * t]
         .ravel().tolist())
        for tx in range(2) for ty in range(2)
    ]
    tiles = spark.createDataFrame(
        rows, "tile_x int, tile_y int, data array<double>"
    )
    out = polygonize(tiles).toPandas()
    plus = out[out["value"] == 7.0]
    assert len(plus) == 1
    r = plus.iloc[0]
    n_expect = int((m == 7.0).sum())
    assert r["n"] == n_expect
    assert r["area_px"] == n_expect
    assert r["n_rings"] == 1
    # perimeter of the plus: 12 segments of 20 px each, split evenly
    assert r["nh"] == 120 and r["nv"] == 120
    # background component: one ring around the plus = 1 hole
    bg = out[out["value"] == 0.0]
    assert len(bg) == 1 and bg.iloc[0]["n_rings"] == 2


def test_polygonize_wkb_geometry(spark):
    """WKB output: outer ring first, geo coordinates on the raster
    grid, shoelace area equals n * pixel_area."""
    from geokit_spark.kernels.wkb import WKB_POLYGON

    tiles = tilesrc.raster_table(spark, "elev").select(
        "tile_x", "tile_y",
        F.transform(
            "data", lambda x: F.floor(x / F.lit(400.0)).cast("double")
        ).alias("data"),
    )
    out = polygonize(tiles).toPandas()
    assert (out["area_px"] == out["n"]).all()
    r = out.loc[out["n_rings"].idxmax()]
    buf = bytes(r["wkb"])
    assert buf[0] == 1 and int.from_bytes(buf[1:5], "little") == WKB_POLYGON
    n_rings = int.from_bytes(buf[5:9], "little")
    assert n_rings == r["n_rings"]
    # parse rings, check the first is the largest and coords are geo
    off = 9
    areas = []
    for _ in range(n_rings):
        npts = int.from_bytes(buf[off : off + 4], "little")
        off += 4
        pts = np.frombuffer(buf, dtype="<f8", count=2 * npts, offset=off)
        off += 16 * npts
        ring = pts.reshape(-1, 2)
        assert XMIN - 1 < ring[:, 0].min() and ring[:, 1].max() < YMAX + 1
        areas.append(abs(_signed(ring[:-1])))
    assert areas[0] == max(areas)
    # geo area: outer - holes == n * pixel area (float shoelace over
    # geo coords accumulates ~1e-9 rel error across thousands of
    # rings; the engine's `area` column uses the EXACT pixel-space sum)
    geo_area = areas[0] - sum(areas[1:])
    assert geo_area == pytest.approx(float(r["n"]) * PIX_DX * PIX_DY,
                                     rel=1e-6)
    assert r["area"] == float(r["n"]) * (PIX_DX * PIX_DY)


def test_trace_rings_million_edge_component():
    """r8 scale pin (VERDICT r7 #3): a single component whose boundary
    is >= 1e6 unit edges must assemble through the bounded path in one
    pass — a 1 x 500k pixel bar has 2W+2 directed edges, one ring."""
    W = 500_000
    i = np.arange(W, dtype=np.int64)
    x1 = np.concatenate([i, [W], i + 1, [0]])
    y1 = np.concatenate([np.zeros(W, np.int64), [0], np.ones(W, np.int64), [1]])
    x2 = np.concatenate([i + 1, [W], i, [0]])
    y2 = np.concatenate([np.zeros(W, np.int64), [1], np.ones(W, np.int64), [0]])
    edges = pd.DataFrame({"x1": x1, "y1": y1, "x2": x2, "y2": y2})
    assert len(edges) >= 1_000_000
    rings, nh, nv = _trace_rings(edges)
    assert len(rings) == 1
    assert len(rings[0]) == 2 * W + 2
    assert nh == 2 * W and nv == 2
    assert _signed(rings[0]) == W  # shoelace == pixel count


def test_polygonize_component_edge_guard(spark, monkeypatch):
    """The per-component ring-assembly cap fails ACTIONABLY: one
    applyInPandas task holds O(component perimeter) edges, so a
    continental background component must raise the documented
    GEOKIT_POLYGONIZE_MAX_EDGES error instead of concentrating the
    whole coastline in one straggler task."""
    import geokit_spark.operators.components as comps

    monkeypatch.setattr(comps, "_POLYGONIZE_MAX_EDGES", 3)
    t = TILE_SIZE
    m = np.zeros((t, t))
    m[:4, :4] = 7.0  # 16 boundary edges > cap 3
    tiles = spark.createDataFrame(
        [(0, 0, m.ravel().tolist())],
        "tile_x int, tile_y int, data array<double>",
    )
    with pytest.raises(Exception, match="GEOKIT_POLYGONIZE_MAX_EDGES"):
        polygonize(tiles).collect()
