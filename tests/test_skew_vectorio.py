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


def test_zordered_layout_files_are_spatially_compact(spark, tmp_path):
    """create_vector_zordered sorts by Morton code before writing;
    each output file must then cover a COMPACT cell range (the min/max
    stats pruning premise): per-file cell bounding boxes are much
    smaller than the full grid, and a bbox filter keeps correctness."""
    import glob
    import os

    from geokit_spark.functions.geo import morton_col
    from geokit_spark.sources.vector_io import create_vector_zordered

    from geokit_spark.constants import GRID_N

    n = 40_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 48271) % GRID_N).cast("int").alias("cell_x"),
        ((F.col("id") * 16807) % GRID_N).cast("int").alias("cell_y"),
    ).repartition(8)
    path = str(tmp_path / "zorder")
    create_vector_zordered(df, path, n_files=8)
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    assert len(files) >= 4
    # each file: morton range must be a narrow slice of the full range
    spans = []
    for f in files:
        pf = spark.read.parquet(f)
        row = pf.agg(
            F.min("morton").alias("lo"), F.max("morton").alias("hi")
        ).collect()[0]
        spans.append((row["lo"], row["hi"]))
    full = max(h for _, h in spans) - min(l for l, _ in spans)
    avg_span = sum(h - l for l, h in spans) / len(spans)
    assert avg_span < full / (len(spans) - 1) * 1.5  # contiguous runs
    # morton roundtrip sanity: dedup on (cell) preserved
    back = spark.read.parquet(path)
    assert back.count() == n
    got = back.limit(1000).collect()
    for r in got:
        m = 0
        for k in range(16):
            m += ((r["cell_x"] >> k) & 1) << (2 * k)
            m += ((r["cell_y"] >> k) & 1) << (2 * k + 1)
        assert m == r["morton"]


def test_skew_report_finds_hot_key(spark):
    from pyspark.sql import functions as F

    from geokit_spark.functions.skew import skew_report

    rows = [(i, 7 if i % 5 else i % 40) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, k int")
    out = skew_report(df, ["k"], top=3).collect()
    assert out[0].rank == 1 and out[0].k == 7
    # key 7 holds 800 of 1000 rows (i%5 != 0), over 33 distinct keys
    n_keys = len({7 if i % 5 else i % 40 for i in range(1000)})
    assert out[0].n_docs == 800
    assert out[0].share == 800 / 1000
    assert out[0].imbalance == 800 * n_keys / 1000
    # counts flow through the salted two-stage agg: two exchanges
    # feed the count, none is a global sort
    plan = (
        skew_report(df, ["k"], top=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrdered" in plan
