"""kNN ring-expansion correctness vs brute force."""

import numpy as np
from pyspark.sql import functions as F

from geokit_spark import fixtures
from geokit_spark.functions.geo import grid_cell_id, with_geocode
from geokit_spark.kernels.geocode import geocode
from geokit_spark.operators.knn import knn


def _pts(docs):
    return with_geocode(docs.select("doc_id")).withColumn(
        "cell_id", grid_cell_id(F.col("lon"), F.col("lat"))
    )


def test_knn_matches_brute_force(spark, docs):
    got = (
        knn(spark, _pts(docs), k=5)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    ids = docs.select("doc_id").toPandas()["doc_id"].to_numpy(np.int64)
    lon, lat = geocode(ids)
    for q in fixtures.POINTS:
        d2 = (lon - q["lon"]) ** 2 + (lat - q["lat"]) ** 2
        order = np.lexsort((ids, d2))[:5]
        expected = ids[order].tolist()
        sub = got[got.query_id == q["id"]]
        assert sub["doc_id"].tolist() == expected, f"query {q['id']}"


def test_knn_k1_and_large_k(spark, docs):
    got = knn(spark, _pts(docs), k=1).toPandas()
    assert len(got) == 13 and (got["rank"] == 1).all()
    got50 = knn(spark, _pts(docs), k=50).toPandas()
    assert len(got50) == 13 * 50


def test_knn_query_outside_data(spark, docs):
    # query in the far corner: rings must expand until k found
    queries = [{"id": 99, "lon": 5.975, "lat": 50.4945}]
    got = knn(spark, _pts(docs), queries=queries, k=3).toPandas()
    assert len(got) == 3
    ids = docs.select("doc_id").toPandas()["doc_id"].to_numpy(np.int64)
    lon, lat = geocode(ids)
    d2 = (lon - queries[0]["lon"]) ** 2 + (lat - queries[0]["lat"]) ** 2
    expected = ids[np.lexsort((ids, d2))[:3]].tolist()
    assert got.sort_values("rank")["doc_id"].tolist() == expected
