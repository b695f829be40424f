"""Micro-batch streaming replay (ST1-ST3, Axis A): event output is
identical to the one-shot window pass for ANY batch partitioning, and
a killed replay resumes from checkpoint to the same result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.core.xxhash64 import xxhash64
from crawler_spark.streaming.record_mode import modal_lifecycle
from crawler_spark.streaming.replay import replay_modal_stream


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


@pytest.fixture(scope="module")
def snap_df(spark):
    return spark.createDataFrame(_snapshots()).cache()


def _events(df):
    return {(r["session_id"], r["selector"], r["tick"], r["event"])
            for r in df.collect()}


def test_batch_invariance(spark, snap_df, tmp_path):
    oneshot = _events(modal_lifecycle(snap_df))
    for name, bounds in [("coarse", [20]), ("fine", [5, 11, 17, 23, 31]),
                         ("single", [])]:
        got = _events(replay_modal_stream(
            spark, snap_df, bounds, str(tmp_path / name)))
        assert got == oneshot, name
    assert {e for *_, e in oneshot} == {"open", "change", "close"}


def test_replay_resume(spark, snap_df, tmp_path):
    bounds = [10, 20, 30]
    full = _events(replay_modal_stream(
        spark, snap_df, bounds, str(tmp_path / "full")))
    # partial run: only first two batches (simulate kill by bounding
    # end_tick), then resume with the real bounds
    ck = str(tmp_path / "partial")
    replay_modal_stream(spark, snap_df.filter(F.col("tick") < 20),
                        [10], ck, end_tick=20)
    resumed = _events(replay_modal_stream(spark, snap_df, bounds, ck))
    assert resumed == full
