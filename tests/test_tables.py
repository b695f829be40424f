"""SnapshotTable (Iceberg stand-in): atomic snapshots, append without
rewrite, MERGE upsert, time travel, per-partition lineage."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.sources.tables import SnapshotTable


def test_snapshot_append_merge_timetravel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    assert not t.exists()

    t.overwrite(spark.range(0, 10).select(
        F.col("id"), F.lit("a").alias("v")))
    assert t.read().count() == 10

    t.append(spark.range(10, 15).select(F.col("id"), F.lit("b").alias("v")))
    assert t.read().count() == 15

    # merge: update ids 3,4 and insert 100
    updates = spark.createDataFrame(
        [(3, "upd"), (4, "upd"), (100, "new")], "id long, v string")
    t.merge(updates, key_cols=["id"])
    rows = {r["id"]: r["v"] for r in t.read().collect()}
    assert rows[3] == "upd" and rows[4] == "upd" and rows[100] == "new"
    assert rows[0] == "a" and rows[12] == "b"
    assert len(rows) == 16

    # time travel: snapshot 1 still readable
    assert t.read(snapshot_id=1).count() == 10

    # lineage records ops + per-partition row counts
    lin = t.lineage()
    assert [s["op"] for s in lin] == ["overwrite", "append", "merge"]
    assert all(s["rows"] == sum(s["partition_rows"].values()) for s in lin)
    assert lin[1]["parent"] == 1


def _write_round(spark, tbl_path, t, rnd):
    """Simulate the engine's per-round fast-append: a hive member dir
    (round=NNNNN, partitioned by sel inside) written with many task
    files, then commit_dir'd."""
    df = spark.range(rnd * 100, rnd * 100 + 100).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("sel"))
    (df.repartition(8).write.partitionBy("sel").mode("overwrite")
     .parquet(str(tbl_path / f"round={rnd:05d}")))
    t.commit_dir(f"round={rnd:05d}", "round", {"files": 100},
                 extra={"round": rnd})


def _rowset(df):
    return {tuple(sorted(r.asDict().items())) for r in df.collect()}


def test_compact_and_expire(spark, tmp_path):
    tbl = tmp_path / "tblc"
    t = SnapshotTable(spark, str(tbl))
    for rnd in range(3):
        _write_round(spark, tbl, t, rnd)
    before = _rowset(t.read())
    assert len(before) == 300

    stats = t.compact(target_file_mb=128)
    # logical content unchanged, file census shrunk
    assert _rowset(t.read()) == before
    assert stats["rows"] == 300
    assert stats["files_after"] < stats["files_before"]
    assert t.lineage()[-1]["op"] == "compact"

    # pre-compact snapshots stay time-travelable until expire
    assert t.read(snapshot_id=3).count() == 300
    assert t.read(snapshot_id=1).count() == 100

    # fast-append AFTER compaction: hive member + nested compact
    # member have conflicting directory structures — read() must
    # group the scans (one union, not one broken scan)
    _write_round(spark, tbl, t, 3)
    both = t.read()
    assert both.count() == 400
    assert {r["round"] for r in both.select("round").distinct().collect()} \
        == {0, 1, 2, 3}

    # expire: keep only the current snapshot; unreferenced member
    # dirs are deleted, referenced ones survive
    res = t.expire(keep_last=1)
    assert res["expired"] == 4
    assert not (tbl / "round=00000").exists()
    assert (tbl / "round=00003").exists()  # referenced by current
    assert _rowset(t.read()) == _rowset(both)  # still 400 rows

    # expired snapshot ids are a clear error, not a silent miss
    import pytest
    with pytest.raises(ValueError, match="expired"):
        t.read(snapshot_id=1)

    # ids stay monotonic after expiry (no reuse of expired ids)
    _write_round(spark, tbl, t, 4)
    assert t.lineage()[-1]["id"] == 6


def test_remove_orphans(spark, tmp_path):
    import os
    import time as _t
    tbl = tmp_path / "tblo"
    t = SnapshotTable(spark, str(tbl))
    _write_round(spark, tbl, t, 0)
    # simulate a write that crashed before its commit: a round dir on
    # disk that no snapshot references
    orphan = tbl / "round=00001"
    orphan.mkdir()
    (orphan / "part-0.parquet").write_bytes(b"junk")
    old = _t.time() - 7200
    os.utime(orphan / "part-0.parquet", (old, old))
    os.utime(orphan, (old, old))
    # a FRESH unreferenced dir is protected by the grace period
    fresh = tbl / "round=00002"
    fresh.mkdir()
    (fresh / "part-0.parquet").write_bytes(b"junk")

    res = t.remove_orphans(grace_sec=3600)
    assert res["deleted_dirs"] == ["round=00001"]
    assert not orphan.exists() and fresh.exists()
    assert (tbl / "round=00000").exists()  # referenced member untouched
    assert t.read().count() == 100


def test_compact_flat_table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tblf"))
    t.overwrite(spark.range(0, 50).select(F.col("id")))
    for i in range(4):
        t.append(spark.range(50 + i * 10, 60 + i * 10).select(F.col("id")))
    before = _rowset(t.read())
    stats = t.compact()
    assert _rowset(t.read()) == before and stats["rows"] == 90
    assert stats["files_after"] <= stats["files_before"]


def test_merge_last_writer_wins(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl2"))
    t.overwrite(spark.createDataFrame([(1, "x", 0)], "id long, v string, ts long"))
    updates = spark.createDataFrame(
        [(1, "first", 1), (1, "second", 2)], "id long, v string, ts long")
    t.merge(updates, key_cols=["id"], order_col="ts")
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["v"] == "second"
