"""ST1-ST3 on real Structured Streaming — the cluster shape of the
batch-simulated replay in `replay.py`.

The reference consumes presence snapshots as an in-process event
stream and tracks modal open/change/close per (session, selector)
(`/root/reference/lib/recorder/browser-session.ts:3651-3666` fallback
poll; lifecycle rules as in `record_mode.modal_lifecycle`). The
batch-sim replay proves the transition function; this module runs the
SAME function under `readStream` → `applyInPandasWithState` →
`writeStream`, which is what a 1000-executor deployment would run:

  * event time = the snapshot tick; watermark delay 0 (the fixture
    stream is in-order; a real deployment would set the poller's max
    disorder);
  * keyed state (last_tick, last_content, active) lives in the state
    store, not a parquet table;
  * the batch-sim's "boundary" close — emit close(last_tick+1) once
    the stream has definitely passed it — becomes an EVENT-TIME
    TIMEOUT: when a key gets no data, its timeout fires as soon as
    the watermark passes last_tick+1 and the close is emitted from
    `state.hasTimedOut`. When data DOES arrive past a gap, the close
    is emitted in-line exactly as in `replay._advance`.

Close timing differs from the batch-sim by up to one micro-batch (a
watermark describes the PREVIOUS batch's progress), but every emitted
event is identical — `tests/test_structured.py` pins the event SET
against the one-shot `modal_lifecycle` oracle, per batch size.

Scale shape: one keyed shuffle into the state store, Arrow-batched
Python transition, no driver state; parallelism = number of distinct
(session, selector) keys, the same sharding the record-mode operators
use.
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .replay import EVENT_SCHEMA

SNAPSHOT_DDL = "session_id string, selector string, tick long, content string"
STATE_DDL = "last_tick long, last_content string, active boolean"

# tick → event time. Offset by one second: tick 0 at epoch 0 would sit
# exactly ON the stream's initial watermark (0) and the stateful
# operator's late filter drops rows at-or-before the watermark.
_TS_OFFSET_S = 1


def _ms(tick: int) -> int:
    return (int(tick) + _TS_OFFSET_S) * 1000

# the stream's heartbeat key: a deployment has real future events to
# advance the watermark; a finite replay appends one sentinel row so
# trailing closes time out. Filtered from the output by key.
FLUSH_SESSION = "__flush__"


def _transition(key: Tuple[str, str],
                pdfs: Iterable[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    """The `replay._advance` chain, re-hosted on GroupState."""
    sid, sel = key
    events: list[tuple[str, str, int, str]] = []
    if state.hasTimedOut:
        last_tick, _last_content, active = state.get
        if active:
            events.append((sid, sel, int(last_tick) + 1, "close"))
        state.remove()
    else:
        if state.exists:
            last_tick, last_content, active = state.get
            last_tick = int(last_tick)
        else:
            last_tick, last_content, active = None, None, False
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("tick")
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
        close_at_ms = _ms(last_tick + 1)
        wm_ms = state.getCurrentWatermarkMs()
        if active and wm_ms > close_at_ms:
            # the stream already passed last_tick+1 while this key was
            # busy in the same batch — close now, like the batch-sim's
            # boundary rule
            events.append((sid, sel, last_tick + 1, "close"))
            state.remove()
        else:
            state.update((last_tick, last_content, active))
            # fire once the watermark passes the close point (must be
            # strictly ahead of the current watermark to be settable)
            state.setTimeoutTimestamp(max(close_at_ms, wm_ms + 1))
    yield pd.DataFrame(events, columns=["session_id", "selector",
                                        "tick", "event"])


def modal_lifecycle_stream(spark: SparkSession, input_dir: str,
                           out_dir: str, ckpt_dir: str,
                           max_files_per_trigger: int = 1) -> DataFrame:
    """Run the modal lifecycle over a parquet file stream: each file
    under `input_dir` is one micro-batch (maxFilesPerTrigger=1), state
    carried in the streaming state store, events appended to
    `out_dir`. Processes everything available, then returns the event
    log (flush-sentinel rows filtered)."""
    src = (spark.readStream.schema(SNAPSHOT_DDL)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(input_dir)
           .withColumn("ts", F.timestamp_seconds(
               F.col("tick") + F.lit(_TS_OFFSET_S)))
           .withWatermark("ts", "0 seconds"))
    events = (src.groupBy("session_id", "selector")
              .applyInPandasWithState(
                  _transition,
                  outputStructType=EVENT_SCHEMA,
                  stateStructType=STATE_DDL,
                  outputMode="append",
                  timeoutConf=GroupStateTimeout.EventTimeTimeout))
    q = (events.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", ckpt_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return (spark.read.schema(EVENT_SCHEMA)
            .parquet(out_dir)
            .filter(F.col("session_id") != FLUSH_SESSION))


def write_windowed_stream(snapshots_rows: list[dict], input_dir: str,
                          window: int = 5) -> int:
    """Lay a finite snapshot set out as one parquet file per
    `window`-tick range (the shape a poller's landing zone has), plus
    the flush sentinel past the end. Flat files so the file stream
    source picks each up as its own micro-batch. Returns the file
    count. Pure pyarrow — no Spark session needed (and no Spark
    part-file directory nesting, which the streaming source's flat
    listing would miss)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(input_dir, exist_ok=True)
    max_tick = max(r["tick"] for r in snapshots_rows)

    seq = [0]

    def _write(rows: list[dict], name: str) -> None:
        cols = {
            "session_id": pa.array([r["session_id"] for r in rows],
                                   pa.string()),
            "selector": pa.array([r["selector"] for r in rows],
                                 pa.string()),
            "tick": pa.array([r["tick"] for r in rows], pa.int64()),
            "content": pa.array([r["content"] for r in rows],
                                pa.string()),
        }
        path = os.path.join(input_dir, name)
        pq.write_table(pa.table(cols), path)
        # the file stream source orders by modification time; back-to-
        # back writes can tie at ms granularity, which would let a
        # later window jump the queue, advance the watermark, and turn
        # earlier windows into dropped late data — pin strictly
        # ascending mtimes (any fixed epoch works; only order matters)
        seq[0] += 1
        os.utime(path, (1_000_000 + seq[0], 1_000_000 + seq[0]))

    n = 0
    for lo in range(0, max_tick + 1, window):
        part = [r for r in snapshots_rows if lo <= r["tick"] < lo + window]
        if not part:
            continue
        _write(part, f"w{lo:06d}.parquet")
        n += 1
    _write([dict(session_id=FLUSH_SESSION, selector="-",
                 tick=max_tick + 2, content="-")],
           f"w{max_tick + 2:06d}_flush.parquet")
    return n + 1
