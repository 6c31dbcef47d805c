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


def test_ring_candidates_distributed_and_exact(spark):
    """_ring_candidates must enumerate cells executor-side: the driver
    ships one (qid, cx, cy, r) row per query, and even a full-grid
    radius (GRID_N^2 cells) expands distributed. Values must equal the
    loop enumeration."""
    from geokit_spark.constants import GRID_N
    from geokit_spark.operators import knn as knn_mod

    queries = [
        {"id": 1, "lon": 10.0, "lat": 20.0},
        {"id": 2, "lon": -40.0, "lat": -10.0},
    ]
    qc = knn_mod._query_cells(queries)
    radii = {1: 3, 2: GRID_N}  # query 2: worst-case full-grid radius
    got = knn_mod._ring_candidates(spark, queries, radii)
    # loop-free driver contract: the pre-explode plan carries one row
    # per query
    assert got.count() == sum(
        (min(GRID_N - 1, qc[q][0] + r) - max(0, qc[q][0] - r) + 1)
        * (min(GRID_N - 1, qc[q][1] + r) - max(0, qc[q][1] - r) + 1)
        for q, r in radii.items()
    )
    small = got.filter(F.col("query_id") == 1).toPandas()
    cx, cy = qc[1]
    expect = {
        x * GRID_N + y
        for x in range(max(0, cx - 3), min(GRID_N, cx + 4))
        for y in range(max(0, cy - 3), min(GRID_N, cy + 4))
    }
    assert set(small["cell_id"]) == expect
