"""SnapshotTable — a parquet-backed stand-in for the Iceberg tables
the production deployment would use (this sandbox has no Iceberg
runtime jars). Provides the three properties the engine relies on:

  * atomic append/overwrite via versioned snapshot manifests
    (write parquet to a new snapshot dir, then atomically swap the
    manifest pointer — the same commit protocol shape as Iceberg's
    metadata pointer),
  * snapshot lineage: every commit records (snapshot_id, parent_id,
    operation, row_count, partition row counts) — the per-partition
    lineage the north rule asks for,
  * MERGE-style upsert (`merge`): WHEN MATCHED UPDATE / WHEN NOT
    MATCHED INSERT keyed on arbitrary columns, and time-travel reads
    by snapshot id.

On a real cluster every call here maps 1:1 onto
`df.writeTo("catalog.db.t").append()` / `MERGE INTO` /
`VERSION AS OF` — the engine code paths would not change shape."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # ---- manifest plumbing ----

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "_manifest.json")

    def _manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {"current": None, "snapshots": []}

    def _commit(self, mani: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(mani, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic pointer swap

    def _write_snapshot(self, df: DataFrame, op: str,
                        members: list[str]) -> None:
        mani = self._manifest()
        sid = len(mani["snapshots"]) + 1
        snap_dir = os.path.join(self.path, f"snap-{sid:06d}")
        df.write.mode("overwrite").parquet(snap_dir)
        written = self.spark.read.parquet(snap_dir)
        parts = (written.groupBy(F.spark_partition_id().alias("pid"))
                 .count().collect())
        mani["snapshots"].append({
            "id": sid,
            "parent": mani["current"],
            "op": op,
            "ts": time.time(),
            "rows": int(sum(r["count"] for r in parts)),
            "partition_rows": {str(r["pid"]): int(r["count"])
                               for r in parts},
            "members": members,
        })
        mani["current"] = sid
        self._commit(mani)

    # ---- reads ----

    def read(self, snapshot_id: int | None = None,
             with_partition_columns: bool = False,
             schema=None) -> DataFrame:
        """Read a snapshot (current by default). Only COMMITTED member
        dirs are visible — a half-written dir that never reached
        commit_dir simply isn't in the manifest, which is the
        crash-consistency property the engine leans on.
        with_partition_columns=True recovers hive-style partition
        columns from member dir names (basePath read).

        `schema`: explicit file schema — skips footer-based schema
        inference, which re-reads one footer per member dir on EVERY
        read and grows O(rounds) during a crawl (a measurable slice of
        the per-round driver constant). Partition columns absent from
        the schema are still discovered and appended."""
        mani = self._manifest()
        sid = snapshot_id or mani["current"]
        if sid is None:
            raise FileNotFoundError(f"{self.path}: empty table")
        snap = next(s for s in mani["snapshots"] if s["id"] == sid)
        dirs = [os.path.join(self.path, m) for m in snap["members"]]
        # basePath is always set: members use hive-style dir names
        # (round=NNNNN), and a multi-dir read without a common base
        # is rejected by the scan builder. Partition columns come for
        # free; with_partition_columns=False callers just don't
        # select them.
        reader = self.spark.read.option("basePath", self.path)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(*dirs)

    def lineage(self) -> list[dict]:
        """Snapshot history — id, parent, op, rows, per-partition
        row counts (the metrics surface)."""
        return self._manifest()["snapshots"]

    def exists(self) -> bool:
        return self._manifest()["current"] is not None

    # ---- writes ----

    def overwrite(self, df: DataFrame) -> None:
        mani = self._manifest()
        sid = len(mani["snapshots"]) + 1
        self._write_snapshot(df, "overwrite", [f"snap-{sid:06d}"])

    def append(self, df: DataFrame) -> None:
        """Append = new data file + manifest listing old members too
        (no rewrite of existing data — Iceberg fast-append shape)."""
        mani = self._manifest()
        if mani["current"] is None:
            return self.overwrite(df)
        cur = next(s for s in mani["snapshots"] if s["id"] == mani["current"])
        sid = len(mani["snapshots"]) + 1
        new_dir = f"snap-{sid:06d}"
        df.write.mode("overwrite").parquet(os.path.join(self.path, new_dir))
        written = self.spark.read.parquet(os.path.join(self.path, new_dir))
        parts = (written.groupBy(F.spark_partition_id().alias("pid"))
                 .count().collect())
        mani["snapshots"].append({
            "id": sid, "parent": mani["current"], "op": "append",
            "ts": time.time(),
            "rows": int(sum(r["count"] for r in parts)),
            "partition_rows": {str(r["pid"]): int(r["count"]) for r in parts},
            "members": cur["members"] + [new_dir],
        })
        mani["current"] = sid
        self._commit(mani)

    def commit_dir(self, rel_dir: str, op: str,
                   partition_rows: dict[str, int],
                   extra: dict | None = None) -> None:
        """Register an already-written directory under the table path
        as a fast-append snapshot (the Iceberg `add_files` shape): no
        data rewrite, no Spark job — per-partition lineage comes from
        the caller's parquet-footer counts. The engine writes each
        micro-batch round dir with its own partitioning, then commits
        it here; until the commit, readers cannot see the dir."""
        mani = self._manifest()
        cur_members: list[str] = []
        if mani["current"] is not None:
            cur_members = next(s for s in mani["snapshots"]
                               if s["id"] == mani["current"])["members"]
        sid = len(mani["snapshots"]) + 1
        # idempotent re-commit: a replayed round (crash after commit,
        # resume rewrote the dir) must not list its dir twice
        members = (cur_members if rel_dir in cur_members
                   else cur_members + [rel_dir])
        snap = {
            "id": sid, "parent": mani["current"], "op": op,
            "ts": time.time(),
            "rows": int(sum(partition_rows.values())),
            "partition_rows": {k: int(v) for k, v in partition_rows.items()},
            "members": members,
        }
        if extra:
            snap.update(extra)
        mani["snapshots"].append(snap)
        mani["current"] = sid
        self._commit(mani)

    def commit_marker(self, op: str, extra: dict | None = None) -> None:
        """Data-less snapshot (members unchanged) recording a state
        transition — e.g. the engine's crawl-complete marker."""
        mani = self._manifest()
        cur_members: list[str] = []
        if mani["current"] is not None:
            cur_members = next(s for s in mani["snapshots"]
                               if s["id"] == mani["current"])["members"]
        sid = len(mani["snapshots"]) + 1
        snap = {"id": sid, "parent": mani["current"], "op": op,
                "ts": time.time(), "rows": 0, "partition_rows": {},
                "members": cur_members}
        if extra:
            snap.update(extra)
        mani["snapshots"].append(snap)
        mani["current"] = sid
        self._commit(mani)

    def insert_if_absent(self, updates: DataFrame, key_cols: list[str],
                         order_col: str | None = None) -> None:
        """MERGE INTO … WHEN NOT MATCHED THEN INSERT — first-write-wins
        (the reference's exists-check skip on capture files,
        browser-session.ts:3400-3407): keys already in the table keep
        their ORIGINAL rows untouched; only unseen keys insert.
        Duplicate keys within `updates` keep the SMALLEST `order_col`
        (the first writer) when given, else a deterministic min."""
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(order_col).asc() if order_col
            else F.struct(*[c for c in updates.columns
                            if c not in key_cols]).asc())
        updates = (updates.withColumn("__rn", F.row_number().over(w))
                   .filter(F.col("__rn") == 1).drop("__rn"))
        if not self.exists():
            return self.overwrite(updates)
        cur = self.read()
        fresh = updates.select(*cur.columns).join(
            cur.select(*key_cols).distinct(), key_cols, "left_anti")
        mani = self._manifest()
        sid = len(mani["snapshots"]) + 1
        self._write_snapshot(cur.unionByName(fresh), "insert_if_absent",
                             [f"snap-{sid:06d}"])

    def merge(self, updates: DataFrame, key_cols: list[str],
              order_col: str | None = None) -> None:
        """MERGE INTO … WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT:
        rows in `updates` replace same-key rows in the table.
        Duplicate keys within `updates` keep the greatest `order_col`
        (last-writer-wins) when given, else an arbitrary-but-
        deterministic max over remaining columns."""
        if order_col:
            w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
            updates = (updates.withColumn("__rn", F.row_number().over(w))
                       .filter(F.col("__rn") == 1).drop("__rn"))
        if not self.exists():
            return self.overwrite(updates)
        cur = self.read()
        untouched = cur.join(updates.select(*key_cols).distinct(),
                             key_cols, "left_anti")
        merged = untouched.unionByName(updates.select(*cur.columns))
        mani = self._manifest()
        sid = len(mani["snapshots"]) + 1
        self._write_snapshot(merged, "merge", [f"snap-{sid:06d}"])
