"""P2 human-pacing golden: deterministic across partitionings, bounded
by the reference's distributions (200..2000 ms think, 50..200 ms/key,
~2% typo detours — browser-manager.ts:114-133), and the per-session
schedule is exactly the prefix sum of earlier think+typing time."""

from __future__ import annotations

import pandas as pd

from crawler_spark.functions.humanize import humanize_schedule

SCHEMA = "session_id string, action_index long, action_type string, text string"


def _mk(spark, n_sessions=20, n_actions=30):
    rows = []
    for s in range(n_sessions):
        for i in range(n_actions):
            typ = "type" if i % 3 == 0 else ("click" if i % 3 == 1 else "nav")
            text = ("payload-%d-%d" % (s, i)) * 4 if typ == "type" else None
            rows.append((f"sess{s}", i, typ, text))
    return spark.createDataFrame(rows, SCHEMA)


def test_bounds_and_determinism(spark):
    df = _mk(spark)
    a = humanize_schedule(df).toPandas().sort_values(
        ["session_id", "action_index"]).reset_index(drop=True)
    b = humanize_schedule(df.repartition(7, "action_type")).toPandas() \
        .sort_values(["session_id", "action_index"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # partitioning-independent

    assert ((a.delay_ms >= 200) & (a.delay_ms < 2000)).all()
    typed = a[a.action_type == "type"].copy()
    typed["n"] = typed.text.str.len()
    # per char: >=50ms key; <=200ms key + 700ms worst-case typo detour
    assert (typed.type_ms >= 50 * typed.n).all()
    assert (typed.type_ms < 900 * typed.n).all()
    assert (a[a.action_type != "type"].type_ms == 0).all()

    # typo detours land near the 2% rate (detour adds >=300ms, so
    # chars without one cost <200ms: estimate by excess over key time)
    excess = (typed.type_ms - 125 * typed.n).clip(lower=0).sum()
    approx_typos = excess / (75 + 300 + 150)  # rough per-detour cost
    rate = approx_typos / typed.n.sum()
    assert 0.002 < rate < 0.08


def test_schedule_is_prefix_sum(spark):
    out = humanize_schedule(_mk(spark)).toPandas().sort_values(
        ["session_id", "action_index"])
    for _, g in out.groupby("session_id"):
        spent = (g.delay_ms + g.type_ms).cumsum().shift(1).fillna(0)
        assert (g.start_offset_ms == spent + g.delay_ms).all()
