"""Predicates, mutateVector, multimodal, bisect, kmeans, GeoJSON."""

import json

import numpy as np
from pyspark.sql import functions as F

from geokit_spark import fixtures
from geokit_spark.functions.geo import with_geocode
from geokit_spark.kernels.geocode import geocode
from geokit_spark.operators.location import bisect, split_kmeans
from geokit_spark.operators.multimodal import fake_decode_meta, multimodal_meta
from geokit_spark.operators.mutate import scale_zones
from geokit_spark.operators.predicates import box_predicates
from geokit_spark.sources.geojson import feature_collection, zones_geojson_features


def test_box_predicates_reference_semantics(spark):
    # filter = ron's box (1,1)-(3,3); harry touches at corner (1,1),
    # hermoine touches at corner (3,3), ron overlaps itself
    got = box_predicates(spark, 1.0, 1.0, 3.0, 3.0).toPandas().set_index("name")
    assert got.loc["harry", "touches"] and not got.loc["harry", "overlaps"]
    assert got.loc["ron", "touches"] and got.loc["ron", "overlaps"]
    assert got.loc["hermoine", "touches"] and not got.loc["hermoine", "overlaps"]
    assert got.loc["ron", "centroid_within"]
    assert not got.loc["harry", "centroid_within"]


def test_scale_zones_area_ratio(spark):
    from geokit_spark.kernels.pip import poly_area

    got = scale_zones(spark, 1.1).toPandas().set_index("zone_id")["new_area"]
    for z in fixtures.ZONES[:10]:
        base = poly_area(z["verts"])
        assert np.isclose(got[z["zone_id"]], base * 1.1**2)


def test_multimodal_meta_deterministic(spark, docs):
    got = multimodal_meta(docs).toPandas()
    n = docs.count()
    assert len(got) == n
    w, h, fr = fake_decode_meta(got["n_bytes"].to_numpy())
    assert (got["width"] == w).all() and (got["height"] == h).all()
    assert (got["n_frames"] == fr).all()
    # text is pure ascii in the fixture: n_bytes == n_chars of text
    chars = docs.select("doc_id", F.length("text").alias("n")).toPandas()
    m = got.merge(chars, on="doc_id")
    assert (m["n_bytes"] == m["n"]).all()


def test_bisect_halves(spark, docs):
    pts = with_geocode(docs.select("doc_id"))
    got = bisect(pts, "lon").toPandas()
    n = len(got)
    assert (got["side"] == 0).sum() == n // 2
    # side-0 max lon <= side-1 min lon
    ids = docs.select("doc_id").toPandas()["doc_id"].to_numpy(np.int64)
    lon, _ = geocode(ids)
    lon_by_id = dict(zip(ids.tolist(), lon.tolist()))
    lo = got[got.side == 0]["doc_id"].map(lon_by_id)
    hi = got[got.side == 1]["doc_id"].map(lon_by_id)
    assert lo.max() <= hi.min()


def test_bisect_has_no_single_partition_exchange(spark, docs):
    """The distributed rank must never funnel the dataset through one
    partition (round-1 anti-pattern: global no-partition Window)."""
    pts = with_geocode(docs.select("doc_id"))
    plan = (
        bisect(pts, "lon", _checkpoint=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan, plan[:2000]
    assert "rangepartitioning" in plan.lower(), plan[:2000]


def test_split_kmeans_clusters(spark, docs):
    pts = with_geocode(docs.select("doc_id"))
    got = split_kmeans(pts, k=2, iters=4).toPandas()
    assert set(got["cluster"].unique()) <= {0, 1}
    assert got["cluster"].nunique() == 2
    assert len(got) == docs.count()


def test_geojson_roundtrip(spark):
    feats = zones_geojson_features(spark)
    fc = json.loads(feature_collection(feats))
    assert fc["type"] == "FeatureCollection"
    assert len(fc["features"]) == 115
    f0 = next(f for f in fc["features"] if f["properties"]["zone_id"] == 0)
    ring = f0["geometry"]["coordinates"][0]
    assert len(ring) == 5 and ring[0] == ring[-1]
    expected = [list(v) for v in fixtures.ZONES[0]["verts"]]
    assert ring[:4] == expected


def test_geojson_lines_roundtrip(spark, tmp_path):
    """Distributed newline-delimited GeoJSON sink round-trips the
    feature set (the scale path; feature_collection is the documented
    small-output driver variant)."""
    import json

    from geokit_spark.sources.geojson import (
        read_geojson_lines,
        write_geojson_lines,
        zones_geojson_features,
    )

    feats = zones_geojson_features(spark)
    out = str(tmp_path / "features_ndjson")
    write_geojson_lines(feats, out)
    back = read_geojson_lines(spark, out)
    assert back.count() == feats.count()
    ids = sorted(
        json.loads(r["feature_json"])["properties"]["zone_id"]
        for r in back.collect()
    )
    assert ids == list(range(feats.count()))
