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


def test_compact_sorted_prunes(spark, tmp_path):
    """sort_cols rewrite: range-partitioned files with disjoint sort-key
    ranges and ascending row-group min/max stats — the layout parquet
    min/max pruning needs for point probes on a huge seen table."""
    import os

    import pyarrow.parquet as pq

    t = SnapshotTable(spark, str(tmp_path / "tbls"))
    # append shuffled data so the pre-compact layout is unsorted
    t.overwrite(spark.range(0, 3000).select(
        (F.xxhash64("id") % 100000).alias("k"), F.col("id")))
    for i in range(3):
        t.append(spark.range(3000 + i * 1000, 4000 + i * 1000).select(
            (F.xxhash64("id") % 100000).alias("k"), F.col("id")))
    before = _rowset(t.read())
    t.compact(target_file_mb=1, sort_cols=["k"])
    assert _rowset(t.read()) == before

    # collect per-file (min, max) of k from parquet footers
    snap_dir = None
    for d in sorted(os.listdir(tmp_path / "tbls")):
        if d.startswith("compact-"):
            snap_dir = tmp_path / "tbls" / d
    spans = []
    for f in sorted(os.listdir(snap_dir)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(str(snap_dir / f)).metadata
        kidx = md.schema.to_arrow_schema().get_field_index("k")
        mins = [md.row_group(i).column(kidx).statistics.min
                for i in range(md.num_row_groups)]
        maxs = [md.row_group(i).column(kidx).statistics.max
                for i in range(md.num_row_groups)]
        # row groups within a file are sorted
        assert mins == sorted(mins) and maxs == sorted(maxs)
        spans.append((min(mins), max(maxs)))
    # files hold disjoint key ranges (range partitioning)
    spans.sort()
    assert all(spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1))


def test_table_ops_model(spark, tmp_path):
    """Randomized op-sequence model check: SnapshotTable vs a plain
    dict keyed on id, through append/merge/insert_if_absent/compact/
    expire interleavings (deterministic seed)."""
    import random

    rng = random.Random(42)
    t = SnapshotTable(spark, str(tmp_path / "tblm"))
    model: dict[int, str] = {}

    def mkdf(pairs):
        return spark.createDataFrame(pairs, "id long, v string")

    t.overwrite(mkdf([(i, f"v{i}") for i in range(20)]))
    model = {i: f"v{i}" for i in range(20)}

    for step in range(12):
        op = rng.choice(["append", "merge", "insert", "compact", "expire"])
        pairs = [(rng.randrange(40), f"s{step}_{j}") for j in range(5)]
        if op == "append":
            # appends may duplicate ids; keep the model multiset simple
            # by only appending unseen ids
            fresh = [(k, v) for k, v in pairs if k not in model]
            seen_ids = set()
            fresh = [(k, v) for k, v in fresh
                     if not (k in seen_ids or seen_ids.add(k))]
            if fresh:
                t.append(mkdf(fresh))
                model.update(dict(fresh))
        elif op == "merge":
            dedup = {k: v for k, v in pairs}
            t.merge(mkdf(sorted(dedup.items())), key_cols=["id"])
            model.update(dedup)
        elif op == "insert":
            dedup = {k: v for k, v in pairs}
            t.insert_if_absent(mkdf(sorted(dedup.items())), key_cols=["id"])
            for k, v in dedup.items():
                model.setdefault(k, v)
        elif op == "compact":
            t.compact()
        else:
            t.expire(keep_last=1)
        got = {r["id"]: r["v"] for r in t.read().collect()}
        assert got == model, f"divergence after step {step} ({op})"


def test_merge_last_writer_wins(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl2"))
    t.overwrite(spark.createDataFrame([(1, "x", 0)], "id long, v string, ts long"))
    updates = spark.createDataFrame(
        [(1, "first", 1), (1, "second", 2)], "id long, v string, ts long")
    t.merge(updates, key_cols=["id"], order_col="ts")
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["v"] == "second"
