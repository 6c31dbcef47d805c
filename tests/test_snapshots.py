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


def test_compact_preserves_rows_and_time_travel(table, spark, docs):
    n_all = docs.count()
    v = table.compact(spark, commit_key="cmp-1")
    assert v == 4
    assert table.manifest(v)["operation"] == "compact"
    assert len(table.manifest(v)["data_dirs"]) == 1
    # identical row multiset after the rewrite
    a = sorted(r.doc_id for r in table.read(spark, 3).collect())
    b = sorted(r.doc_id for r in table.read(spark, 4).collect())
    assert a == b and len(a) == n_all
    # pre-compaction time travel still works (dirs not yet expired)
    assert table.read(spark, 1).count() == docs.filter(
        F.col("doc_id") % 3 == 0
    ).count()
    # idempotent retry
    assert table.compact(spark, commit_key="cmp-1") == 4


def test_incremental_skips_compaction_rewrite(table, spark, docs):
    table.compact(spark, commit_key="cmp-1")  # v4
    extra = docs.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 10_000
    )
    table.commit_append(extra, commit_key="after-cmp")  # v5
    # diff v3 -> v5 must contain ONLY the post-compaction append, not
    # the rewritten copy of the whole table
    inc = table.read_incremental(spark, 3, 5)
    assert inc.count() == 5
    assert {r.doc_id for r in inc.select("doc_id").collect()} == {
        10_000 + i for i in range(5)
    }
    # a pure-rewrite range raises instead of double-counting
    with pytest.raises(ValueError):
        table.read_incremental(spark, 3, 4)


def test_expire_gc_and_retention(table, spark, docs):
    table.compact(spark, commit_key="cmp-1")  # v4
    n_dirs_before = len(os.listdir(table.data_dir))
    out = table.expire(keep_last=1)
    assert out["expired_versions"] == [1, 2, 3]
    # the three per-commit dirs are orphaned by the compaction and
    # must be gone; the compacted dir survives
    assert len(out["removed_dirs"]) == 3
    assert len(os.listdir(table.data_dir)) == n_dirs_before - 3
    assert table.versions() == [4]
    # current read still exact
    assert table.read(spark).count() == docs.count()
    # expired version is unreachable
    with pytest.raises(FileNotFoundError):
        table.read(spark, 2)


def test_expire_keeps_append_chain_dirs(table, spark):
    # retain the last TWO versions of a pure-append history: every
    # dir the retained manifests reference must survive
    out = table.expire(keep_last=2)
    assert out["expired_versions"] == [1]
    assert out["removed_dirs"] == []  # v2/v3 still reference s1's dir
    assert table.read(spark, 2).count() > 0


def test_expire_is_path_spelling_safe(tmp_path, spark, docs):
    # commit via one path spelling, expire via another (trailing
    # slash + a '..' hop): basename GC must not touch live data
    import os

    root = str(tmp_path / "tbl2")
    t = SnapshotTable(root)
    t.commit_append(docs.limit(20), commit_key="a")
    t.commit_append(docs.limit(20), commit_key="b")
    alias = os.path.join(str(tmp_path), "x", "..", "tbl2") + os.sep
    t2 = SnapshotTable(alias)
    out = t2.expire(keep_last=1)
    assert out["removed_dirs"] == []  # v2 chain-references s1's dir
    assert t.read(spark).count() == 40


def test_expire_skips_stray_files(table, spark, docs):
    import os

    stray = os.path.join(table.data_dir, "NOTES.txt")
    with open(stray, "w") as fh:
        fh.write("x")
    table.compact(spark, commit_key="cmp-1")
    out = table.expire(keep_last=1)
    assert len(out["removed_dirs"]) == 3
    assert os.path.exists(stray)  # never rmtree'd
    assert table.read(spark).count() == docs.count()


def test_incremental_from_zero_after_expire(table, spark, docs):
    table.compact(spark, commit_key="cmp-1")  # v4
    table.expire(keep_last=1)
    # 'everything' still works via the snapshot's own data_dirs
    assert table.read_incremental(spark, 0, 4).count() == docs.count()
    # a from>0 range crossing expired manifests raises clearly
    with pytest.raises(ValueError, match="expired"):
        table.read_incremental(spark, 1, 4)
