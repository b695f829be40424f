"""Real Structured Streaming lifecycle (readStream →
applyInPandasWithState w/ event-time timeouts → writeStream) emits
exactly the event set of the one-shot `modal_lifecycle` window pass —
the same oracle the batch-sim replay is pinned to — at coarse and
fine file granularities."""

from __future__ import annotations

import pytest

from crawler_spark.core.xxhash64 import xxhash64
from crawler_spark.streaming.record_mode import modal_lifecycle
from crawler_spark.streaming.structured import (
    modal_lifecycle_stream, write_windowed_stream)


def _snapshots():
    rows = []
    for s in range(3):
        for sel in ("div.m1", "div.m2", "aside.n"):
            for tick in range(40):
                r = xxhash64(f"rp:{s}:{sel}:{tick}".encode(), 0)
                if r % 3 != 0:
                    rows.append(dict(session_id=f"s{s}", selector=sel,
                                     tick=tick, content=f"c{r % 4}"))
    return rows


def _events(df):
    return {(r["session_id"], r["selector"], r["tick"], r["event"])
            for r in df.collect()}


@pytest.mark.parametrize("window", [5, 40])
def test_stream_matches_oneshot(spark, tmp_path, window):
    rows = _snapshots()
    oneshot = _events(modal_lifecycle(
        spark.createDataFrame(rows).select(
            "session_id", "selector", "tick", "content")))

    d = tmp_path / f"w{window}"
    n_files = write_windowed_stream(rows, str(d / "in"), window=window)
    assert n_files == (9 if window == 5 else 2)
    got = _events(modal_lifecycle_stream(
        spark, str(d / "in"), str(d / "out"), str(d / "ckpt")))
    assert got == oneshot
    assert {e for *_, e in got} == {"open", "change", "close"}
