"""S9 — live browser-preview frame stream, re-expressed for Spark.

The reference serves the NEWEST full-page frame whenever the client
polls its stream endpoint (`/root/reference/app/api/browser-stream/
route.ts:23-51` — on-demand screenshot, JPEG quality 70) and the
preview UI polls on a 3 s cadence
(`/root/reference/specs/BROWSER_PREVIEW.md:11`).  Two semantics fall
out of "serve the newest frame at each poll":

  * lossy last-writer-wins INSIDE a poll window — frames rendered
    between two polls are never seen except the last one (the same
    rule as the 200 ms interaction-event sampling,
    `browser-session.ts:455-505`);
  * a poll with NO new frame re-serves the previous frame — the
    stream never gaps while the session is alive.

Spark shape: one `groupBy` (per session × poll window, `max_by` picks
the last frame) plus one per-session window function (forward-fill
with `last(..., ignorenulls)`) — both partition by session_id, so at
web scale the stream shards across executors with no driver state and
no skew beyond the busiest single session.  Frame payloads stay
opaque `binary` (the reference's JPEG-q70 transcode needs libjpeg,
which this container lacks — the bytes column passes through
untouched; decode/transcode plug in as the Arrow-batched UDFs in
operators/images.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

POLL_MS = 3_000  # specs/BROWSER_PREVIEW.md:11


def frame_stream(frames: DataFrame, poll_ms: int = POLL_MS) -> DataFrame:
    """`frames(session_id, frame_id, ts_ms[, png])` → one row per
    (session_id, poll_tick) from the session's first frame to its
    last: the newest frame at or before that poll.

    Output: session_id, poll_tick, frame_id, frame_ts_ms, age_polls
    (0 = fresh frame this window, k = re-served from k windows ago).
    Ties inside a window break on the larger frame_id (arrival order
    of the fixture generators; the reference holds only one "latest"
    buffer so ties cannot occur there)."""
    tick = (F.col("ts_ms") / poll_ms).cast("long")
    # newest frame per (session, poll window): single partial-agg shuffle
    per_window = (
        frames
        .withColumn("poll_tick", tick)
        .groupBy("session_id", "poll_tick")
        .agg(F.max(F.struct("ts_ms", "frame_id")).alias("newest"))
        .select("session_id", "poll_tick",
                F.col("newest.frame_id").alias("new_frame_id"),
                F.col("newest.ts_ms").alias("new_frame_ts"))
    )
    # dense poll grid per session (first..last activity), then
    # forward-fill the latest frame across empty windows
    grid = (
        per_window.groupBy("session_id")
        .agg(F.min("poll_tick").alias("t0"), F.max("poll_tick").alias("t1"))
        .select("session_id",
                F.explode(F.sequence("t0", "t1")).alias("poll_tick"))
    )
    w = (Window.partitionBy("session_id").orderBy("poll_tick")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    served = (
        grid.join(per_window, ["session_id", "poll_tick"], "left")
        .withColumn("frame_id",
                    F.last("new_frame_id", ignorenulls=True).over(w))
        .withColumn("frame_ts_ms",
                    F.last("new_frame_ts", ignorenulls=True).over(w))
        .withColumn("age_polls",
                    F.col("poll_tick")
                    - F.last(F.when(F.col("new_frame_id").isNotNull(),
                                    F.col("poll_tick")),
                             ignorenulls=True).over(w))
        .select("session_id", "poll_tick", "frame_id", "frame_ts_ms",
                "age_polls")
    )
    return served
