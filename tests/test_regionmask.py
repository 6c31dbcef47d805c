"""RegionMask wrapper: every method must equal the direct operator
call (the wrapper adds no execution path of its own)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geokit_spark import fixtures
from geokit_spark.regionmask import RegionMask
from geokit_spark.sources import tiles as tilesrc


@pytest.fixture(scope="module")
def elev_tiles(spark):
    return tilesrc.raster_table(spark, "elev").cache()


@pytest.fixture(scope="module")
def clc_tiles(spark):
    return tilesrc.raster_table(spark, "clc").cache()


@pytest.fixture(scope="module")
def rm(spark):
    return RegionMask.fixture_region(spark)


def test_mask_stats_matches_operator(spark, rm, elev_tiles):
    from geokit_spark.operators.zonal import region_mask_stats

    a = rm.mask_stats(elev_tiles).collect()[0]
    b = region_mask_stats(elev_tiles).collect()[0]
    assert a["n_pix"] == b["n_pix"] and a["area"] == b["area"]


def test_raster_stats_single_region(spark, rm, elev_tiles):
    row = rm.raster_stats(elev_tiles).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_pix"] > 0 and r["min_v"] >= 100.0
    assert r["min_v"] <= r["mean_v"] <= r["max_v"]


def test_indicate_values(spark, rm, clc_tiles):
    out = rm.indicate_values(clc_tiles, "[10-20]").collect()
    assert len(out) == 1
    assert 0.0 < out[0]["frac"] < 1.0


def test_filter_points_matches_join(spark, rm):
    from geokit_spark.functions.geo import with_geocode
    from geokit_spark.operators.spatial_join import docs_in_region

    docs = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    a = rm.filter_points(with_geocode(docs)).count()
    b = docs_in_region(spark, docs).count()
    assert a == b


def test_srs_aware_construction(spark):
    """Vertices given in EPSG:3857 produce the same region as 4326."""
    from geokit_spark.kernels.srs import merc_forward

    v = fixtures.REGION_VERTS
    mx, my = merc_forward([p[0] for p in v], [p[1] for p in v])
    rm_m = RegionMask(spark, list(zip(mx.tolist(), my.tolist())), srs=3857)
    rm_d = RegionMask.fixture_region(spark)
    assert np.allclose(
        np.asarray(rm_m.verts), np.asarray(rm_d.verts), atol=1e-9
    )


def test_wkb_and_buffer_and_tiles(spark, rm):
    from geokit_spark.kernels.wkb import polygon_wkb

    rm2 = RegionMask.from_wkb(spark, polygon_wkb(rm.verts))
    assert rm2.verts == rm.verts
    grown = rm.buffer(0.01)
    assert grown.area_4326() > rm.area_4326()
    t = rm.sub_tiles(9)
    assert len(t) >= 1 and all(len(x) == 3 for x in t)


def test_region_mask_with_holes(spark):
    """RegionMask accepts ring lists: the mask/zonal/filter family
    honors holes (donut semantics), outer-only ops raise loudly, and
    the WKB construction path round-trips interior rings."""
    import numpy as np
    import pytest

    from geokit_spark import fixtures
    from geokit_spark.kernels.geom_ops import signed_area
    from geokit_spark.kernels.wkb import polygon_wkb_rings
    from geokit_spark.regionmask import RegionMask

    rings = fixtures.REGION_HOLES_RINGS
    rm = RegionMask(spark, rings)
    rm_outer = RegionMask(spark, rings[0])
    # area subtracts holes
    assert rm.area_4326() < rm_outer.area_4326()
    assert np.isclose(
        rm.area_4326(),
        abs(signed_area(rings[0]))
        - sum(abs(signed_area(r)) for r in rings[1:]),
    )
    # filter_points honors holes (strictly fewer matches)
    pts = spark.createDataFrame(
        [(i, p["lon"], p["lat"]) for i, p in enumerate(fixtures.POINTS)],
        "id int, lon double, lat double",
    )
    assert rm.filter_points(pts).count() <= rm_outer.filter_points(pts).count()
    # buffer is rings-aware: growing grows the outer ring and shrinks
    # the holes (kept as holes), net area grows
    grown = rm.buffer(0.01)
    assert len(grown.rings) == len(rm.rings)
    assert grown.area_4326() > rm.area_4326()
    assert abs(signed_area(grown.rings[1])) < abs(signed_area(rings[1]))
    # a grow distance past half the hole width collapses the holes
    # (they vanish rather than inverting)
    swallowed = rm.buffer(0.2)
    assert len(swallowed.rings) == 1
    # tileize is rings-aware: net piece areas (outer - hole clips) sum
    # to the donut's 3857 area; sub_tiles excludes hole-interior tiles
    from geokit_spark.kernels.pip import poly_area
    from geokit_spark.kernels.srs import xy_transform

    pieces = list(rm.tileize(11))
    net = sum(
        poly_area(p[0]) - sum(poly_area(h) for h in p[1:])
        for _, p in pieces
    )
    ring_area_3857 = []
    for r in rings:
        mx, my = xy_transform(
            [v[0] for v in r], [v[1] for v in r], 4326, 3857
        )
        ring_area_3857.append(poly_area(list(zip(mx, my))))
    want = ring_area_3857[0] - sum(ring_area_3857[1:])
    assert abs(net - want) / want < 1e-9
    donut_tiles = set(rm.sub_tiles(14))
    outer_tiles = set(rm_outer.sub_tiles(14))
    assert donut_tiles < outer_tiles  # strict: hole-interior tiles drop
    # indicate_features honors region holes (covered fraction computed
    # against the donut mask: fewer region pixels than outer-only)
    from geokit_spark.sources import tiles as tilesrc

    donut_row = rm.indicate_features(
        tilesrc.raster_table(spark, "elev"), "B"
    ).collect()[0]
    outer_row = rm_outer.indicate_features(
        tilesrc.raster_table(spark, "elev"), "B"
    ).collect()[0]
    assert donut_row["n_region_pix"] < outer_row["n_region_pix"]
    # WKB donut construction
    rm2 = RegionMask.from_wkb(spark, polygon_wkb_rings(rings))
    assert len(rm2.rings) == 3
    assert rm2.area_4326() == rm.area_4326()
