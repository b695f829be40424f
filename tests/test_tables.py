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


def test_merge_last_writer_wins(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl2"))
    t.overwrite(spark.createDataFrame([(1, "x", 0)], "id long, v string, ts long"))
    updates = spark.createDataFrame(
        [(1, "first", 1), (1, "second", 2)], "id long, v string, ts long")
    t.merge(updates, key_cols=["id"], order_col="ts")
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["v"] == "second"
