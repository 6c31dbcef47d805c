"""Snapshot-table protocol: isolation, time travel, incremental
reads, idempotent commits, and crash/race behavior."""

import os

import pytest
from pyspark.sql import functions as F

from geokit_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def table(tmp_path, spark, docs):
    t = SnapshotTable(str(tmp_path / "tbl"))
    for c in range(3):
        t.commit_append(
            docs.filter(F.col("doc_id") % 3 == c),
            commit_key=f"slice-{c}",
            logical_ts=c,
        )
    return t


def test_time_travel_counts(table, spark, docs):
    n = {c: docs.filter(F.col("doc_id") % 3 == c).count() for c in range(3)}
    assert table.read(spark, 1).count() == n[0]
    assert table.read(spark, 2).count() == n[0] + n[1]
    assert table.read(spark, 3).count() == n[0] + n[1] + n[2]
    # default read = current
    assert table.read(spark).count() == n[0] + n[1] + n[2]


def test_incremental_is_exact_slice(table, spark, docs):
    got = sorted(
        r["doc_id"]
        for r in table.read_incremental(spark, 1, 2).select("doc_id").collect()
    )
    want = sorted(
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % 3 == 1)
        .select("doc_id")
        .collect()
    )
    assert got == want
    # 0 -> N covers everything
    assert table.read_incremental(spark, 0, 3).count() == docs.count()


def test_idempotent_commit(table, spark, docs):
    before = table.current_version()
    dirs_before = table.manifest(before)["data_dirs"]
    v = table.commit_append(
        docs.filter(F.col("doc_id") % 3 == 1),
        commit_key="slice-1",  # same key as fixture commit
        logical_ts=1,
    )
    assert v == 2  # returns the ALREADY-committed version
    assert table.current_version() == before
    assert table.manifest(before)["data_dirs"] == dirs_before


def test_snapshot_isolation_under_append(table, spark, docs):
    pinned = table.read(spark, 2)
    n2 = pinned.count()
    table.commit_append(
        docs.filter(F.col("doc_id") % 3 == 0).limit(5),
        commit_key="late-append",
    )
    # the pinned frame re-evaluates against the SAME manifest
    assert pinned.count() == n2
    assert table.read(spark).count() > n2


def test_empty_table_and_bad_ranges(tmp_path, spark):
    t = SnapshotTable(str(tmp_path / "empty"))
    with pytest.raises(ValueError):
        t.read(spark)
    with pytest.raises(ValueError):
        t.read_incremental(spark, 2, 2)


def test_lost_race_raises(table, spark, docs, tmp_path):
    # simulate another writer publishing v4 AFTER we read
    # current_version()=3 but before our manifest rename: pin the
    # stale read with a patch and pre-create the winner's manifest
    from unittest import mock

    stale = table.current_version()
    nxt = stale + 1
    path = os.path.join(table.manifest_dir, f"v{nxt}.json")
    with open(path, "w") as fh:
        fh.write('{"version": %d, "commit_key": "other", "data_dirs": []}' % nxt)
    with mock.patch.object(
        SnapshotTable, "current_version", return_value=stale
    ):
        with pytest.raises(RuntimeError):
            table.commit_append(docs.limit(3), commit_key="loser", logical_ts=9)
