"""P3 stealth-context golden: per-session identity assignment is
deterministic across partitionings, bounded by the reference's
distributions (4 UAs, 1920+0..99 x 1080+0..99 viewport —
browser-manager.ts:58-61,105-114), and the constant header/spoof sets
match the reference byte-for-byte."""

from __future__ import annotations

import pandas as pd

from crawler_spark.functions.stealth import (
    AUTOMATION_PROPS, EXTRA_HEADERS, USER_AGENTS, session_context)


def _mk(spark, n=400):
    return spark.createDataFrame(
        [(f"sess{i}",) for i in range(n)], "session_id string")


def test_bounds_and_determinism(spark):
    df = _mk(spark)
    a = session_context(df).toPandas().sort_values(
        "session_id").reset_index(drop=True)
    b = session_context(df.repartition(7)).toPandas().sort_values(
        "session_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # partitioning-independent

    assert a.user_agent.isin(USER_AGENTS).all()
    assert ((a.viewport_w >= 1920) & (a.viewport_w < 2020)).all()
    assert ((a.viewport_h >= 1080) & (a.viewport_h < 1180)).all()

    # every identity lane actually rotates (not a constant pick)
    assert a.user_agent.nunique() == 4
    assert a.viewport_w.nunique() > 50
    assert a.viewport_h.nunique() > 50
    # lanes are independent: same UA bucket spans many viewports
    per_ua = a.groupby("user_agent").viewport_w.nunique()
    assert (per_ua > 20).all()


def test_constant_context(spark):
    row = session_context(_mk(spark, n=3)).limit(1).collect()[0]
    assert dict(row.headers) == EXTRA_HEADERS
    assert list(row.spoofed_props) == AUTOMATION_PROPS
    assert list(row.languages) == ["en-US", "en"]
