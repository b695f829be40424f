"""Batch-simulated streaming replay — the record-mode event stream
consumed in micro-batches with keyed state checkpointed between
batches (ST1/ST2/ST3, SURVEY.md §2.8; Axis A allows batch-simulated
streaming with checkpoints).

The semantics contract: replaying the same presence-snapshot stream in
ANY batch partitioning emits exactly the events the one-shot window
pass (record_mode.modal_lifecycle) emits — asserted in
tests/test_replay.py. On a cluster this same per-key transition
function runs under Structured Streaming's
``applyInPandasWithState``; here state lives in a parquet table per
batch (deterministic, resumable, inspectable), advanced by a grouped
``applyInPandas`` — keyed shuffle, sequential only within a key.

A key's state: (last_tick, last_content, active). Transitions per
tick t with presence row:
  open    — not active, or gap since last presence
  change  — consecutive tick, content differs
  close   — emitted at last_tick+1 once the stream has definitely
            passed it (watermark = batch end boundary; a presence at
            last_tick+1 could still arrive inside the same batch, so
            closes emit only when boundary > last_tick + 1).
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, IntegerType, LongType,
                               StringType, StructField, StructType)

KEY = ["session_id", "selector"]

STATE_SCHEMA = StructType([
    StructField("session_id", StringType()),
    StructField("selector", StringType()),
    StructField("last_tick", LongType()),
    StructField("last_content", StringType()),
    StructField("active", BooleanType()),
])

EVENT_SCHEMA = StructType([
    StructField("session_id", StringType()),
    StructField("selector", StringType()),
    StructField("tick", LongType()),
    StructField("event", StringType()),
])

_OUT_SCHEMA = StructType(list(EVENT_SCHEMA.fields) + [
    StructField("is_state", BooleanType()),
    StructField("last_content", StringType()),
    StructField("active", BooleanType()),
])


def _advance(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-key transition: consume this batch's presence ticks plus
    the carried state row, emit events + ONE new state row (tagged
    is_state=True; the caller splits them)."""
    boundary = int(pdf["boundary"].iloc[0])
    sid = pdf["session_id"].iloc[0]
    sel = pdf["selector"].iloc[0]
    st = pdf[pdf["is_state"]]
    if len(st):
        last_tick = int(st["tick"].iloc[0])
        last_content = st["last_content"].iloc[0]
        active = bool(st["active"].iloc[0])
    else:
        last_tick, last_content, active = None, None, False
    events = []
    rows = pdf[~pdf["is_state"]].sort_values("tick")
    # column-wise scan (no per-row pandas objects): the transition
    # chain is sequential per key, but it only needs two columns
    for t, c in zip(rows["tick"].astype("int64").tolist(),
                    rows["content"].tolist()):
        t = int(t)
        if not active or t - last_tick > 1:
            if active and t - last_tick > 1:
                events.append((sid, sel, last_tick + 1, "close"))
            events.append((sid, sel, t, "open"))
        elif c != last_content:
            events.append((sid, sel, t, "change"))
        last_tick, last_content, active = t, c, True
    # watermark close: the batch boundary has passed last_tick+1
    if active and boundary > last_tick + 1:
        events.append((sid, sel, last_tick + 1, "close"))
        active = False
    out = pd.DataFrame(events, columns=["session_id", "selector", "tick",
                                        "event"])
    out["is_state"] = False
    out["last_content"] = None
    out["active"] = None
    state_row = pd.DataFrame(
        [[sid, sel, last_tick, "state", True, last_content, active]],
        columns=["session_id", "selector", "tick", "event", "is_state",
                 "last_content", "active"])
    return pd.concat([out, state_row], ignore_index=True)


def replay_modal_stream(spark: SparkSession, snapshots: DataFrame,
                        batch_bounds: list[int], ckpt_dir: str,
                        end_tick: int | None = None) -> DataFrame:
    """Replay `snapshots(session_id, selector, tick, content)` in
    micro-batches split at `batch_bounds` (ascending tick boundaries;
    batch b covers [bounds[b-1], bounds[b])). State + emitted events
    parquet-checkpointed per batch under ckpt_dir; a re-run resumes
    from the last completed batch. Returns the full event log.

    end_tick: the stream's final watermark (defaults to max tick + 2
    so trailing modals close, matching the one-shot pass)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    if end_tick is None:
        end_tick = (snapshots.agg(F.max("tick")).first()[0] or 0) + 2
    bounds = sorted(set(batch_bounds) | {end_tick})
    state = spark.createDataFrame([], STATE_SCHEMA)
    lo = None
    for b, hi in enumerate(bounds):
        ev_path = os.path.join(ckpt_dir, f"events_{b:04d}")
        st_path = os.path.join(ckpt_dir, f"state_{b:04d}")
        if os.path.exists(os.path.join(st_path, "_SUCCESS")):
            state = spark.read.parquet(st_path)
            lo = hi
            continue
        batch = snapshots.filter(F.col("tick") < hi)
        if lo is not None:
            batch = batch.filter(F.col("tick") >= lo)
        pseudo = state.select(
            "session_id", "selector",
            F.col("last_tick").alias("tick"),
            F.col("last_content").alias("content"),
            F.lit(True).alias("is_state"),
            "last_content", "active")
        merged = (batch.select("session_id", "selector", "tick", "content",
                               F.lit(False).alias("is_state"),
                               F.lit(None).cast("string").alias("last_content"),
                               F.lit(None).cast("boolean").alias("active"))
                  .unionByName(pseudo)
                  .withColumn("boundary", F.lit(hi)))
        out = merged.groupBy(*KEY).applyInPandas(
            _advance, schema=StructType(list(_OUT_SCHEMA.fields) + []))
        out = out.cache()
        (out.filter(~F.col("is_state"))
            .select("session_id", "selector", "tick", "event")
            .write.mode("overwrite").parquet(ev_path))
        (out.filter(F.col("is_state") & F.col("active").isNotNull())
            .select("session_id", "selector",
                    F.col("tick").alias("last_tick"),
                    "last_content", "active")
            .write.mode("overwrite").parquet(st_path))
        out.unpersist()
        state = spark.read.parquet(st_path)
        lo = hi
    return spark.read.parquet(os.path.join(ckpt_dir, "events_*"))