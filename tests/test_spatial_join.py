"""Spark-side spatial join tests: engine results must equal the
brute-force numpy oracle (same kernels, no cell shortcut)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from geokit_spark import fixtures
from geokit_spark.kernels.geocode import geocode
from geokit_spark.kernels.pip import points_in_poly
from geokit_spark.operators import spatial_join


def _brute_force_region(ids):
    lon, lat = geocode(ids)
    return set(ids[points_in_poly(lon, lat, fixtures.REGION_VERTS)].tolist())


def test_docs_in_region_matches_brute_force(spark, docs):
    got = spatial_join.docs_in_region(spark, docs).select("doc_id").toPandas()
    ids = docs.select("doc_id").toPandas()["doc_id"].to_numpy(np.int64)
    expected = _brute_force_region(ids)
    assert set(got["doc_id"]) == expected
    assert len(got) == len(expected)  # no duplicate rows from the union


def test_docs_join_zones_matches_brute_force(spark, docs):
    got = (
        spatial_join.docs_join_zones(spark, docs)
        .select("doc_id", "zone_id")
        .toPandas()
    )
    ids = docs.select("doc_id").toPandas()["doc_id"].to_numpy(np.int64)
    lon, lat = geocode(ids)
    expected = set()
    for z in fixtures.ZONES:
        inside = points_in_poly(lon, lat, z["verts"])
        for d in ids[inside]:
            expected.add((int(d), z["zone_id"]))
    assert set(map(tuple, got.values.tolist())) == expected


def test_general_api_second_polygon(spark, docs):
    """The polygon side is a parameter: the same operator over
    REGION2_VERTS must match brute force (de-fixtured general API)."""
    got = (
        spatial_join.docs_in_polygon(spark, docs, fixtures.REGION2_VERTS)
        .select("doc_id")
        .toPandas()
    )
    ids = docs.select("doc_id").toPandas()["doc_id"].to_numpy(np.int64)
    lon, lat = geocode(ids)
    expected = set(ids[points_in_poly(lon, lat, fixtures.REGION2_VERTS)].tolist())
    assert set(got["doc_id"]) == expected
    assert len(got) == len(expected)


def test_general_api_custom_polygon_set(spark, docs):
    """points_join_polygons over an ad-hoc polygon dict (triangle +
    pentagon) must match brute force — no fixture involvement."""
    from geokit_spark.constants import XMIN, XSPAN, YMIN, YSPAN
    import math

    tri = [
        (XMIN + 0.1 * XSPAN, YMIN + 0.1 * YSPAN),
        (XMIN + 0.6 * XSPAN, YMIN + 0.2 * YSPAN),
        (XMIN + 0.2 * XSPAN, YMIN + 0.7 * YSPAN),
    ]
    pent = [
        (
            XMIN + 0.7 * XSPAN + 0.25 * XSPAN * math.cos(2 * math.pi * k / 5),
            YMIN + 0.6 * YSPAN + 0.25 * YSPAN * math.sin(2 * math.pi * k / 5),
        )
        for k in range(5)
    ]
    polys = {7: tri, 11: pent}
    from geokit_spark.functions.geo import with_geocode

    got = (
        spatial_join.points_join_polygons(spark, with_geocode(docs), polys)
        .select("doc_id", "zone_id")
        .toPandas()
    )
    ids = docs.select("doc_id").toPandas()["doc_id"].to_numpy(np.int64)
    lon, lat = geocode(ids)
    expected = set()
    for pid, verts in polys.items():
        inside = points_in_poly(lon, lat, verts)
        for d in ids[inside]:
            expected.add((int(d), pid))
    assert set(map(tuple, got.values.tolist())) == expected


def test_zone_join_is_broadcast(spark, docs):
    plan = spatial_join.docs_join_zones(spark, docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert set(pdf.columns) == {"zone_id", "n_docs"}
    assert (pdf["n_docs"] > 0).all()


def test_points_in_polygon_donut_vs_brute_force(spark, docs):
    """Two-phase join with a ring-list region == brute-force even-odd
    parity over all rings (and strictly fewer rows than outer-only)."""
    import numpy as np

    from geokit_spark import fixtures
    from geokit_spark.functions.geo import with_geocode
    from geokit_spark.kernels.geocode import geocode
    from geokit_spark.kernels.pip import points_in_poly_rings

    rings = fixtures.REGION_HOLES_RINGS
    got = (
        spatial_join.points_in_polygon(
            spark, with_geocode(docs.select("doc_id")), rings
        )
        .select("doc_id")
        .toPandas()["doc_id"]
        .to_numpy()
    )
    ids = docs.select("doc_id").toPandas()["doc_id"].to_numpy(np.int64)
    lon, lat = geocode(ids)
    expect = ids[points_in_poly_rings(lon, lat, rings)]
    assert set(got.tolist()) == set(expect.tolist())
    outer_only = spatial_join.points_in_polygon(
        spark, with_geocode(docs.select("doc_id")), rings[0]
    ).count()
    assert len(got) < outer_only


def test_points_join_polygons_with_donut_zone(spark, docs):
    """A {id: ring-list} entry in the polys dict (zone with a hole)
    routes through the Arrow refine and matches brute-force parity;
    single-ring zones in the same dict are unaffected."""
    rings = fixtures.REGION_HOLES_RINGS
    polys = {
        1: rings,                       # donut zone
        2: fixtures.ZONES[0]["verts"],  # plain quad
    }
    from geokit_spark.functions.geo import with_geocode
    from geokit_spark.kernels.pip import points_in_poly_rings

    got = (
        spatial_join.points_join_polygons(
            spark, with_geocode(docs.select("doc_id")), polys
        )
        .select("doc_id", "zone_id")
        .toPandas()
    )
    ids = docs.select("doc_id").toPandas()["doc_id"].to_numpy(np.int64)
    lon, lat = geocode(ids)
    for zid, poly in polys.items():
        expect = set(ids[points_in_poly_rings(lon, lat, poly)].tolist())
        have = set(got[got.zone_id == zid]["doc_id"].tolist())
        assert have == expect, zid


def test_zones_holes_jvm_fast_path_plan_and_parity(spark):
    """Donut zones within the codegen budget run with NO Python stage
    (the round-4 silent degradation is closed), and the rings-JVM
    result equals the Arrow-UDF fallback row-for-row."""
    from pyspark.sql import functions as F

    from geokit_spark import fixtures
    from geokit_spark.functions.geo import with_geocode
    from geokit_spark.operators.spatial_join import (
        _points_join_polygons_udf,
        points_join_polygons,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pts = with_geocode(docs.select("doc_id"))
    fast = points_join_polygons(
        spark, pts, fixtures.ZONES_HOLES_DICT
    ).select("doc_id", "zone_id")
    got = fast.toPandas()
    # AQE finalizes THIS Dataset's physical plan only after execution
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInArrow" not in plan
    # '*(n)' prefixes mark whole-stage-codegen spans in the final plan
    assert "*(" in plan and "BroadcastHashJoin" in plan
    ref = (
        _points_join_polygons_udf(
            spark, pts, fixtures.ZONES_HOLES_DICT, refine=False
        )
        .select("doc_id", "zone_id")
        .toPandas()
    )
    key = lambda df: sorted(map(tuple, df.to_numpy().tolist()))  # noqa: E731
    assert key(got) == key(ref)
    assert len(got) > 0
    # the donut zone must reject points over its hole: probe with the
    # hole's centroid (inside hole -> OUT) and a point in the annulus
    outer, hole = fixtures.ZONES_HOLES_DICT[13]
    hx = sum(x for x, _ in hole) / len(hole)
    hy = sum(y for _, y in hole) / len(hole)
    # annulus probe: midpoint between outer vertex 0 and hole vertex 0
    ax = (outer[0][0] + hole[0][0]) / 2
    ay = (outer[0][1] + hole[0][1]) / 2
    probes = spark.createDataFrame(
        [(1, hx, hy), (2, ax, ay)], "doc_id long, lon double, lat double"
    )
    hits = points_join_polygons(spark, probes, fixtures.ZONES_HOLES_DICT)
    matched = {
        r["doc_id"] for r in hits.filter(F.col("zone_id") == 13).collect()
    }
    assert matched == {2}


def test_zones_holes_oversized_rings_fall_back_to_udf(spark):
    """Ring sets past the codegen budget (rings x verts > 12) route to
    the Arrow-UDF boundary band and still produce donut semantics."""
    from geokit_spark import fixtures
    from geokit_spark.functions.geo import with_geocode
    from geokit_spark.operators.spatial_join import points_join_polygons

    # 8-vertex outer + 8-vertex hole: 2 x 8 = 16 terms > 12
    outer = fixtures.REGION_HOLES_RINGS[0]
    hole = fixtures.REGION_HOLES_RINGS[1]
    assert len(outer) > 4
    polys = {1: [outer, hole]}
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pts = with_geocode(docs.select("doc_id"))
    joined = points_join_polygons(spark, pts, polys)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" in plan or "ArrowEvalPython" in plan
    # cross-check against the single-region rings semi-join (same rings)
    from geokit_spark.operators.spatial_join import points_in_polygon

    semi = points_in_polygon(spark, pts, [outer, hole])
    assert sorted(r["doc_id"] for r in joined.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in semi.select("doc_id").collect())
