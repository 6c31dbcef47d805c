"""Connected components: distributed labeling + seam merge vs a
single-node full-matrix oracle (same min-propagation algorithm run
globally)."""

import numpy as np
import pytest

from geokit_spark.constants import RASTER_H, RASTER_W
from geokit_spark.kernels.raster_fields import clc_value
from geokit_spark.operators.components import (
    connected_components, label_block, sieve_small_components,
)
from geokit_spark.sources import tiles as tilesrc


def test_label_block_simple():
    m = np.array(
        [[1, 1, 2], [2, 1, 2], [2, 2, 2]], dtype=float
    )
    lab = label_block(m)
    # component of the three 1s is connected; the 2s form one L-comp
    assert lab[0, 0] == lab[0, 1] == lab[1, 1]
    assert lab[0, 2] == lab[1, 2] == lab[2, 2] == lab[2, 0] == lab[1, 0]
    assert lab[0, 0] != lab[0, 2]


def test_label_block_diagonal_not_connected():
    m = np.array([[1, 2], [2, 1]], dtype=float)
    lab = label_block(m)
    assert lab[0, 0] != lab[1, 1]  # 4-connectivity only
    assert lab[0, 1] != lab[1, 0]


def _full_cc_oracle():
    ix, iy = np.meshgrid(np.arange(RASTER_W), np.arange(RASTER_H))
    full = clc_value(ix, iy).astype(np.float64)
    lab = label_block(full)
    roots, counts = np.unique(lab, return_counts=True)
    vals = full.ravel()[roots]
    import pandas as pd

    df = pd.DataFrame({"value": vals, "n": counts})
    return (
        df.groupby("value", as_index=False)
        .agg(n_components=("n", "count"), n_pixels=("n", "sum"),
             max_component=("n", "max"))
        .sort_values("value")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def clc_tiles(spark):
    return tilesrc.raster_table(spark, "clc").cache()


def test_connected_components_matches_full_matrix(spark, clc_tiles):
    got = connected_components(clc_tiles).toPandas()
    exp = _full_cc_oracle()
    assert got["value"].tolist() == exp["value"].tolist()
    assert got["n_components"].tolist() == exp["n_components"].tolist()
    assert got["n_pixels"].tolist() == exp["n_pixels"].tolist()
    assert got["max_component"].tolist() == exp["max_component"].tolist()


def test_label_block_8conn_connects_diagonal():
    m = np.array([[1, 2], [2, 1]], dtype=float)
    lab = label_block(m, connectivity=8)
    assert lab[0, 0] == lab[1, 1]
    assert lab[0, 1] == lab[1, 0]
    assert lab[0, 0] != lab[0, 1]


def _full_cc_oracle_8():
    ix, iy = np.meshgrid(np.arange(RASTER_W), np.arange(RASTER_H))
    full = clc_value(ix, iy).astype(np.float64)
    lab = label_block(full, connectivity=8)
    roots, counts = np.unique(lab, return_counts=True)
    vals = full.ravel()[roots]
    import pandas as pd

    df = pd.DataFrame({"value": vals, "n": counts})
    return (
        df.groupby("value", as_index=False)
        .agg(n_components=("n", "count"), n_pixels=("n", "sum"),
             max_component=("n", "max"))
        .sort_values("value")
        .reset_index(drop=True)
    )


def test_connected_components_8conn_matches_full_matrix(spark, clc_tiles):
    got = connected_components(clc_tiles, connectivity=8).toPandas()
    exp = _full_cc_oracle_8()
    assert got["value"].tolist() == exp["value"].tolist()
    assert got["n_components"].tolist() == exp["n_components"].tolist()
    assert got["n_pixels"].tolist() == exp["n_pixels"].tolist()
    assert got["max_component"].tolist() == exp["max_component"].tolist()


def test_label_packing_beyond_1000_tiles(spark):
    """Regression for the round-1 (tile_x*1000 + tile_y) label-base
    collision: tiles at coordinates beyond 1000 must (a) merge across
    their own seams and (b) never merge with far-away tiles that share
    local label values."""
    import pandas as pd

    from geokit_spark.constants import TILE_SIZE

    t = TILE_SIZE
    flat = np.full(t * t, 7.0)
    rows = [
        {"tile_x": 0, "tile_y": 1500, "data": flat, "nodata": -9999.0},
        {"tile_x": 0, "tile_y": 1501, "data": flat, "nodata": -9999.0},
        {"tile_x": 2500, "tile_y": 3, "data": flat, "nodata": -9999.0},
        {"tile_x": 2501, "tile_y": 3, "data": flat, "nodata": -9999.0},
    ]
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    got = connected_components(tiles).toPandas()
    # two disjoint 2-tile components of value 7
    assert got["value"].tolist() == [7.0]
    assert got["n_components"].iloc[0] == 2
    assert got["n_pixels"].iloc[0] == 4 * t * t
    assert got["max_component"].iloc[0] == 2 * t * t


def test_sieve_merge_8conn_hand_case(spark):
    """Diagonal-only neighbor: with connectivity=8 a small island must
    be absorbed into its diagonal neighbor's component; with 4 it
    cannot reach it."""
    import pandas as pd

    from geokit_spark.constants import TILE_SIZE
    from geokit_spark.operators.components import sieve_merge

    t = TILE_SIZE
    m = np.full((t, t), 5.0)
    m[0, 0] = 9.0
    m[1, 1] = 9.0  # 2-px diagonal pair of 9s inside a sea of 5s
    pdf = pd.DataFrame(
        [{"tile_x": 0, "tile_y": 0, "data": m.ravel(), "nodata": -9999.0}]
    )
    tiles = spark.createDataFrame(pdf)
    out8 = sieve_merge(tiles, min_size=3, connectivity=8).set_index("value")[
        "n_pixels"
    ]
    assert 9.0 not in out8.index and out8[5.0] == t * t
    out4 = sieve_merge(tiles, min_size=2, connectivity=4).set_index("value")[
        "n_pixels"
    ]
    # under 4-conn the two 9s are separate size-1 components -> merged
    assert 9.0 not in out4.index and out4[5.0] == t * t


def test_sieve_merge_preserves_pixels(spark, clc_tiles):
    from geokit_spark.constants import RASTER_H, RASTER_W
    from geokit_spark.operators.components import sieve_merge

    merged = sieve_merge(clc_tiles, min_size=100)
    assert merged["n_pixels"].sum() == RASTER_W * RASTER_H  # invariant
    full = connected_components(clc_tiles).toPandas()
    base = full.set_index("value")["n_pixels"]
    m = merged.set_index("value")["n_pixels"]
    # values with only-small components lose pixels; big ones gain
    assert (m.reindex(base.index).fillna(0) != base).any()


def test_sieve_merge_hand_case(spark):
    """3-tile-free hand case via a tiny custom tile table: a 1-pixel
    island inside a sea must be absorbed into the sea's value."""
    import pandas as pd

    from geokit_spark.constants import TILE_SIZE
    from geokit_spark.operators.components import sieve_merge

    t = TILE_SIZE
    m = np.full((t, t), 5.0)
    m[10, 10] = 9.0  # island of size 1
    pdf = pd.DataFrame(
        [{"tile_x": 0, "tile_y": 0, "data": m.ravel(), "nodata": -9999.0}]
    )
    tiles = spark.createDataFrame(pdf)
    out = sieve_merge(tiles, min_size=2).set_index("value")["n_pixels"]
    assert 9.0 not in out.index
    assert out[5.0] == t * t


def test_sieve_drops_small(spark, clc_tiles):
    full = connected_components(clc_tiles).toPandas()
    sieved = sieve_small_components(clc_tiles, min_size=100)
    m = full.merge(sieved, on="value", how="left", suffixes=("", "_s"))
    assert (m["n_components_s"].fillna(0) <= m["n_components"]).all()
    assert (m["n_pixels_s"].fillna(0) <= m["n_pixels"]).all()
    # a huge threshold keeps only the biggest components
    tiny = sieve_small_components(clc_tiles, min_size=10**9)
    assert len(tiny) == 0


def test_resolve_roots_long_chain(spark):
    """A 300-node path graph must collapse to ONE component well
    within the round budget (pointer jumping; plain contraction is
    O(diameter) and used to exit silently at 64 rounds)."""
    from geokit_spark.operators.components import _resolve_roots

    n = 300
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    roots = _resolve_roots(pairs).toPandas()
    assert len(roots) == n
    assert (roots["root"] == 0).all()


def test_sieve_component_graph_is_component_granularity(spark):
    """The sieve's driver-side input must be O(components), never
    O(pixels) or O(tile-border pixels): on a 10x10-tile grid (100
    tiles, 409,600 pixels, ~80k border-strip pixels) split into 4
    quadrant components, the collected graph must be 4 component rows
    + at most a handful of adjacency rows."""
    import pandas as pd

    from geokit_spark.constants import TILE_SIZE
    from geokit_spark.operators.components import (
        _component_graph,
        sieve_merge,
    )

    t = TILE_SIZE
    n = 10  # 10x10 tiles > the 8x8 fixture grid
    rows = []
    for tx in range(n):
        for ty in range(n):
            # quadrant value: 4 large components spanning many tiles
            v = float((tx >= n // 2) * 2 + (ty >= n // 2))
            rows.append(
                {
                    "tile_x": tx,
                    "tile_y": ty,
                    "data": np.full(t * t, v),
                    "nodata": -9999.0,
                }
            )
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    comp, adj = _component_graph(tiles, connectivity=4)
    assert len(comp) == 4  # one row per component
    # adjacency of 4 quadrants: 4 unordered pairs (no diagonal at 4-conn)
    assert len(adj) == 4
    total_driver_rows = len(comp) + len(adj)
    assert total_driver_rows < 20  # vs ~80k border pixels / 409,600 pixels
    # and the sieve itself still works on top of it
    out = sieve_merge(tiles, min_size=5)
    assert out["n_pixels"].sum() == n * n * t * t


# ---------------------------------------------------------------------------
# distributed sieve merge: bit-identical to the sequential driver loop


def _graph_to_dfs(spark, comp, adj):
    comp_df = spark.createDataFrame(
        comp, "root long, value double, n long, pix long"
    )
    adj_df = spark.createDataFrame(adj, "ra long, rb long")
    return comp_df, adj_df


def _adversarial_graph(rng, n_specks=60):
    """Component graph with every shape the round rules must handle:
    two big hubs, specks on hubs, straddlers on both, order-increasing
    chains hanging off a hub, a star of small components, and random
    speck-speck edges (pending-pending adjacency)."""
    import pandas as pd

    comp_rows = []
    adj_rows = []
    nid = [0]

    def node(n, value, pix=None):
        r = nid[0]
        nid[0] += 1
        comp_rows.append(
            (r, float(value), int(n),
             int(pix) if pix is not None else 10_000 + r)
        )
        return r

    h1 = node(5000, 1.0, pix=1)
    h2 = node(4000, 2.0, pix=2)
    specks = []
    for i in range(n_specks):
        s = node(int(rng.integers(1, 5)), float(rng.integers(10, 14)))
        specks.append(s)
        adj_rows.append((min(s, h1), max(s, h1)))
        if rng.random() < 0.3:  # straddler on both hubs
            adj_rows.append((min(s, h2), max(s, h2)))
    # random speck-speck edges
    for _ in range(n_specks // 3):
        a, b = rng.choice(specks, 2, replace=False)
        if a != b:
            adj_rows.append((min(a, b), max(a, b)))
    # order-increasing chain off h2 (pix increases along the chain)
    prev = h2
    for i in range(6):
        c = node(1, 20.0 + i, pix=50_000 + i)
        adj_rows.append((min(prev, c), max(prev, c)))
        prev = c
    # star: small center with 5 small leaves
    center = node(2, 30.0)
    for i in range(5):
        leaf = node(1, 31.0)
        adj_rows.append((min(center, leaf), max(center, leaf)))
    adj_rows.append((min(center, h1), max(center, h1)))
    comp = pd.DataFrame(comp_rows, columns=["root", "value", "n", "pix"])
    adj = pd.DataFrame(sorted(set(adj_rows)), columns=["ra", "rb"])
    return comp, adj


def test_sieve_distributed_matches_driver_adversarial(spark):
    from geokit_spark.operators.components import (
        _sieve_merge_distributed, _sieve_merge_driver,
    )

    for seed in range(4):
        rng = np.random.default_rng(seed)
        comp, adj = _adversarial_graph(rng)
        exp = _sieve_merge_driver(comp, adj, min_size=5)
        comp_df, adj_df = _graph_to_dfs(spark, comp, adj)
        got = _sieve_merge_distributed(comp_df, adj_df, min_size=5)
        assert got["value"].tolist() == exp["value"].tolist(), seed
        assert got["n_pixels"].tolist() == exp["n_pixels"].tolist(), seed


def test_sieve_distributed_raster_1e5_components(spark):
    """>=1e5-component raster through the DISTRIBUTED path (never
    collects the component graph), bit-identical to the driver loop:
    speck fields on one background (the hub fast path must release
    them in O(1) rounds — a pure distance-2 rule would need 1e5
    rounds here) plus alternating-value strips (chains that serialize
    through the distance-2 rule and hold back later-ordered specks
    via the hub's kbad gate)."""
    import pandas as pd

    from geokit_spark.constants import TILE_SIZE
    from geokit_spark.operators.components import sieve_merge

    t = TILE_SIZE
    nx, ny = 11, 10
    rows = []
    for tx in range(nx):
        for ty in range(ny):
            m = np.full((t, t), 5.0)
            # isolated specks at even interior positions: 31*31 per tile
            yy, xx = np.mgrid[2:t - 1:2, 2:t - 1:2]
            m[yy, xx] = 10.0 + (tx * ny + ty) % 4
            if ty == ny - 1 and tx < 3:
                # alternating-value strip: a chain of singleton
                # components each touching the background hub
                m[t // 2, 20:26] = np.where(
                    np.arange(6) % 2 == 0, 20.0, 21.0
                )
            rows.append(
                {"tile_x": tx, "tile_y": ty, "data": m.ravel(),
                 "nodata": -9999.0}
            )
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    exp = sieve_merge(tiles, min_size=3, distributed=False)
    # sanity: the fixture really has >= 1e5 components
    from geokit_spark.operators.components import component_table

    n_comp = component_table(tiles).count()
    assert n_comp >= 100_000
    got = sieve_merge(tiles, min_size=3, distributed=True, max_rounds=64)
    assert got["value"].tolist() == exp["value"].tolist()
    assert got["n_pixels"].tolist() == exp["n_pixels"].tolist()
    assert int(got["n_pixels"].sum()) == nx * ny * t * t
