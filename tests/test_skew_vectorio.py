"""Salting equivalence + vector IO + exactly-one semantics."""

import pytest
from pyspark.sql import functions as F

from geokit_spark.functions.geo import grid_cell_id, with_geocode
from geokit_spark.functions.skew import hot_keys, salted_count, salted_sum
from geokit_spark.operators.mutate import zones_feature_df
from geokit_spark.sources.vector_io import (
    create_vector, extract_feature, list_layers, load_vector, vector_info,
)


def _pts(docs):
    return with_geocode(docs.select("doc_id")).withColumn(
        "cell_id", grid_cell_id(F.col("lon"), F.col("lat"))
    )


def test_salted_count_equals_direct(spark, docs):
    pts = _pts(docs)
    direct = (
        pts.groupBy("cell_id").agg(F.count("*").alias("n_docs")).toPandas()
        .sort_values("cell_id").reset_index(drop=True)
    )
    salted = (
        salted_count(pts, ["cell_id"], "doc_id", n_salt=8).toPandas()
        .sort_values("cell_id").reset_index(drop=True)
    )
    assert direct.equals(salted)


def test_salted_sum_equals_direct(spark, docs):
    pts = _pts(docs).withColumn("one", F.lit(1).cast("long"))
    direct = (
        pts.groupBy("cell_id").agg(F.sum("one").alias("sum_one")).toPandas()
        .sort_values("cell_id").reset_index(drop=True)
    )
    salted = (
        salted_sum(pts, ["cell_id"], "one", "doc_id").toPandas()
        .sort_values("cell_id").reset_index(drop=True)
    )
    assert direct.equals(salted)


def test_hot_keys_finds_hotspot(spark):
    # enough docs that the hot-spot square dominates some cells
    pages = _pts(
        spark.range(0, 200_000, 1, 16).withColumnRenamed("id", "doc_id")
    )
    # the hot-spot square spreads its 20% of docs over ~36 grid cells
    # (~0.55% each); uniform cells hold ~0.005% each — 100x less
    hot = hot_keys(pages, ["cell_id"], threshold_share=0.004)
    assert len(hot) >= 10


def test_vector_io_roundtrip(spark, tmp_path):
    zf = zones_feature_df(spark)
    path = str(tmp_path / "layers" / "zones")
    create_vector(zf, path, partition_col="designate")
    back = load_vector(spark, path)
    assert back.count() == 115
    assert set(back.columns) == set(zf.columns)
    info = vector_info(back)
    assert info["count"] == 115
    assert "zone_id" in info["attributes"]
    assert info["bounds"][0] < info["bounds"][2]
    assert list_layers(str(tmp_path / "layers")) == ["zones"]


def test_extract_feature_exactly_one(spark):
    zf = zones_feature_df(spark)
    row = extract_feature(zf, F.col("zone_id") == 7)
    assert row["site_code"] == "Z0007"
    with pytest.raises(ValueError):
        extract_feature(zf, F.col("designate") == "A")  # many
    with pytest.raises(ValueError):
        extract_feature(zf, F.col("zone_id") == 9999)  # none


def test_parquet_pushdown_pruning_and_column_projection(spark, tmp_path):
    """The scan-efficiency contract (SURVEY §4): a partitioned vector
    sink must give (a) PARTITION PRUNING on the partition key, (b)
    PREDICATE PUSHDOWN of row filters into the parquet scan, and (c)
    COLUMN PRUNING — the ReadSchema carries only projected columns."""
    from geokit_spark.operators.mutate import zones_feature_df
    from geokit_spark.sources.vector_io import create_vector, load_vector

    path = str(tmp_path / "zones_part")
    create_vector(
        zones_feature_df(spark).drop("xs", "ys"), path,
        partition_col="designate",
    )
    df = (
        load_vector(spark, path)
        .filter((F.col("designate") == "A") & (F.col("year") > 2000))
        .select("zone_id", "year")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # (a) partition pruning: the partition filter references designate
    assert "PartitionFilters" in plan and "designate" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    # (b) predicate pushdown: year filter reaches the scan
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "year" in pushed and "GreaterThan" in pushed
    # (c) column pruning: site_code is not read
    readschema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "site_code" not in readschema and "zone_id" in readschema
    # and the result is right
    rows = df.collect()
    assert all(r["year"] > 2000 for r in rows)
    assert len(rows) > 0
