"""Lineage / checkpoint / resume protocol tests (north rule)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from geokit_spark.functions.geo import grid_cell_id, with_geocode
from geokit_spark.plans.lineage import CheckpointTable, lineage_rows


@pytest.fixture()
def ckpt_dir(tmp_path):
    return str(tmp_path / "ckpt")


def _work(spark, docs):
    return with_geocode(docs.select("doc_id")).withColumn(
        "cell_id", grid_cell_id(F.col("lon"), F.col("lat"))
    )


def test_stage_runs_then_noop(spark, docs, ckpt_dir):
    ck = CheckpointTable(spark, ckpt_dir)
    work = _work(spark, docs)
    cells1, rows1 = ck.run_stage("geocode", work)
    assert cells1 > 0 and rows1 == docs.count()
    # idempotent: second run does nothing
    cells2, rows2 = ck.run_stage("geocode", work)
    assert (cells2, rows2) == (0, 0)
    # stored data is complete
    stored = spark.read.parquet(os.path.join(ckpt_dir, "geocode"))
    assert stored.count() == rows1


def test_resume_after_lost_cell(spark, docs, ckpt_dir):
    ck = CheckpointTable(spark, ckpt_dir)
    work = _work(spark, docs)
    ck.run_stage("s1", work)
    lin = ck.lineage().filter(F.col("stage") == "s1").toPandas()
    # simulate a lost cell: rewrite lineage without one cell
    victim = int(lin.cell_id.iloc[0])
    kept = ck.lineage().filter(
        ~((F.col("stage") == "s1") & (F.col("cell_id") == victim))
    )
    tmp = ckpt_dir + "_lin_tmp"
    kept.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(ck.lineage_path)
    shutil.move(tmp, ck.lineage_path)
    # resume: exactly the victim cell re-runs
    cells, rows = ck.run_stage("s1", work)
    assert cells == 1
    expected = work.filter(F.col("cell_id") == victim).count()
    assert rows == expected


def test_checksum_order_independent(spark, docs):
    work = _work(spark, docs)
    a = lineage_rows(work, "x").select("cell_id", "row_count", "checksum")
    b = lineage_rows(work.repartition(17), "x").select(
        "cell_id", "row_count", "checksum"
    )
    pa = a.toPandas().sort_values("cell_id").reset_index(drop=True)
    pb = b.toPandas().sort_values("cell_id").reset_index(drop=True)
    assert pa.equals(pb)


def test_verify_stage_detects_tamper(spark, docs, ckpt_dir):
    ck = CheckpointTable(spark, ckpt_dir)
    work = _work(spark, docs)
    ck.run_stage("s2", work)
    ok = ck.verify_stage("s2").toPandas()
    assert ok["ok"].all()
    # tamper: append duplicate rows for one cell into the data dir
    extra = work.limit(3)
    extra.write.mode("append").parquet(os.path.join(ckpt_dir, "s2"))
    ok2 = ck.verify_stage("s2").toPandas()
    assert not ok2["ok"].all()
