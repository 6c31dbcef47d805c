"""Structured-streaming incremental ingest + clip/areaShare tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geokit_spark import fixtures
from geokit_spark.kernels.pip import clip_poly_box, poly_area
from geokit_spark.operators.clipops import extract_and_clip_zones
from geokit_spark.streaming.incremental import (
    stream_cell_counts, stream_events_windowed,
)


def test_stream_cell_counts_matches_batch(spark, docs, tmp_path):
    from geokit_spark.functions.geo import cell_cols, with_geocode

    inp = str(tmp_path / "in")
    docs.select("doc_id", "text", "lang").write.parquet(inp)
    q = stream_cell_counts(spark, inp, str(tmp_path / "ckpt"), "cellstream")
    q.awaitTermination(120)
    got = spark.sql("select * from cellstream").toPandas()

    pts = with_geocode(docs.select("doc_id"))
    cx, cy = cell_cols(F.col("lon"), F.col("lat"))
    exp = (
        pts.select(cx.alias("cell_x"), cy.alias("cell_y"))
        .groupBy("cell_x", "cell_y")
        .agg(F.count("*").alias("n_docs"))
        .toPandas()
    )
    g = got.sort_values(["cell_x", "cell_y"]).reset_index(drop=True)
    e = exp.sort_values(["cell_x", "cell_y"]).reset_index(drop=True)
    assert g.equals(e)


def test_stream_resumes_with_new_files(spark, docs, tmp_path):
    inp = str(tmp_path / "in2")
    ck = str(tmp_path / "ckpt2")
    half1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text", "lang")
    half2 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text", "lang")
    half1.write.mode("append").parquet(inp)
    q = stream_cell_counts(spark, inp, ck, "cellstream2")
    q.awaitTermination(120)
    n1 = spark.sql("select sum(n_docs) from cellstream2").collect()[0][0]
    assert n1 == half1.count()
    # new files arrive; restart from the checkpoint picks up only them
    half2.write.mode("append").parquet(inp)
    q2 = stream_cell_counts(spark, inp, ck, "cellstream2")
    q2.awaitTermination(120)
    n2 = spark.sql("select sum(n_docs) from cellstream2").collect()[0][0]
    assert n2 == docs.count()


def test_stateful_counts_across_restarts(spark, docs, tmp_path):
    """applyInPandasWithState: state survives the checkpoint across
    stream restarts; final totals equal the batch groupBy."""
    from geokit_spark.streaming.incremental import stream_cell_counts_stateful

    inp = str(tmp_path / "sin")
    ck = str(tmp_path / "sck")
    outp = str(tmp_path / "sout")
    half1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text", "lang")
    half2 = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text", "lang")
    half1.write.mode("append").parquet(inp)
    q = stream_cell_counts_stateful(spark, inp, ck, outp)
    q.awaitTermination(180)
    half2.write.mode("append").parquet(inp)
    q2 = stream_cell_counts_stateful(spark, inp, ck, outp)
    q2.awaitTermination(180)
    # update-mode emissions are appended per batch; latest total wins
    got = (
        spark.read.parquet(outp)
        .groupBy("cell_x", "cell_y")
        .agg(F.max("n_docs").alias("n_docs"))
        .toPandas().sort_values(["cell_x", "cell_y"]).reset_index(drop=True)
    )
    from geokit_spark.functions.geo import cell_cols, with_geocode

    pts = with_geocode(docs.select("doc_id"))
    cx, cy = cell_cols(F.col("lon"), F.col("lat"))
    exp = (
        pts.select(cx.alias("cell_x"), cy.alias("cell_y"))
        .groupBy("cell_x", "cell_y")
        .agg(F.count("*").alias("n_docs"))
        .toPandas().sort_values(["cell_x", "cell_y"]).reset_index(drop=True)
    )
    assert got.equals(exp)


def test_events_windowed_batch_parity(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = stream_events_windowed(spark, events).toPandas()
    assert (got["n"] > 0).all()
    exp_total = events.count()
    assert got["n"].sum() == exp_total


def test_extract_and_clip_matches_numpy(spark):
    box = (6.05, 50.6, 6.25, 50.8)
    got = (
        extract_and_clip_zones(spark, box)
        .toPandas()
        .set_index("zone_id")
        .sort_index()
    )
    expected = {}
    for z in fixtures.ZONES:
        full = poly_area(z["verts"])
        clipped = clip_poly_box(z["verts"], box)
        a = poly_area(clipped) if len(clipped) >= 3 else 0.0
        share = a / full
        if share >= 0.001:
            expected[z["zone_id"]] = share
    assert sorted(expected) == got.index.tolist()
    for zid, share in expected.items():
        assert np.isclose(got.loc[zid, "area_share"], share)
        year = fixtures.ZONES[zid]["year"]
        assert np.isclose(got.loc[zid, "year_scaled"], year * share)
    # shares strictly inside (0, 1]; boundary zones partially clipped
    assert (got["area_share"] <= 1.0 + 1e-12).all()
    assert ((got["area_share"] < 0.999).any())


def test_stream_dedup_exact_matches_batch(spark, docs, tmp_path):
    from geokit_spark.streaming.incremental import stream_dedup_exact

    inp = str(tmp_path / "dd_in")
    out = str(tmp_path / "dd_out")
    ck = str(tmp_path / "dd_ck")
    docs.select("doc_id", "text", "lang").write.json(inp)
    q = stream_dedup_exact(spark, inp, out, ck)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # one row per distinct content, content set identical to batch
    batch = docs.select(F.md5("text").alias("m")).distinct()
    assert got.count() == batch.count()
    assert got.select("text_md5").distinct().count() == got.count()
    assert (
        got.select(F.col("text_md5").alias("m")).exceptAll(batch).count()
        == 0
    )
    # idempotent resume: re-running with the same checkpoint emits
    # nothing new
    q2 = stream_dedup_exact(spark, inp, out, ck)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == batch.count()


def test_stream_dedup_watermarked_bounded_state(spark, docs, tmp_path):
    """dropDuplicatesWithinWatermark variant: duplicates within the
    horizon are suppressed; each distinct content survives exactly
    once per horizon. Feed = every doc twice with the duplicate 1
    minute later (inside the 1-day watermark) -> output equals the
    batch distinct set."""
    from geokit_spark.streaming.incremental import stream_dedup_watermarked

    inp = str(tmp_path / "wd_in")
    out = str(tmp_path / "wd_out")
    ck = str(tmp_path / "wd_ck")
    base = docs.select("doc_id", "text", "lang").withColumn(
        "ts", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id"))
    )
    dup = base.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 MINUTE"))
    base.unionByName(dup).write.json(inp)
    q = stream_dedup_watermarked(spark, inp, out, ck)
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    n_distinct = docs.select(F.md5("text")).distinct().count()
    assert got.count() == n_distinct
    assert got.select("text_md5").distinct().count() == n_distinct
