"""S9 frame-stream golden: the Spark poll/forward-fill pipeline must
match a pure-Python replay of the reference's serve-newest-frame rule
(app/api/browser-stream/route.ts:23-51; 3 s cadence
specs/BROWSER_PREVIEW.md:11)."""

from __future__ import annotations

from crawler_spark.streaming.frames import frame_stream

# (session_id, frame_id, ts_ms) — gaps, bursts, and a same-window tie
FRAMES = [
    ("s1", 1, 100), ("s1", 2, 2900),            # two frames, one window
    ("s1", 3, 3100),                            # fresh next window
    ("s1", 4, 15500),                           # 3-window gap to re-serve
    ("s2", 10, 9000),                           # single frame session
    ("s3", 20, 500), ("s3", 21, 500),           # exact-ts tie → max id
    ("s3", 22, 6700), ("s3", 23, 6100),         # late ts wins, not id
]


def oracle(frames, poll_ms=3000):
    by_sess: dict[str, list[tuple[int, int]]] = {}
    for sid, fid, ts in frames:
        by_sess.setdefault(sid, []).append((ts, fid))
    rows = []
    for sid, fl in by_sess.items():
        ticks = [ts // poll_ms for ts, _ in fl]
        t0, t1 = min(ticks), max(ticks)
        last, last_tick = None, None
        for t in range(t0, t1 + 1):
            win = [(ts, fid) for ts, fid in fl if ts // poll_ms == t]
            if win:
                last, last_tick = max(win), t   # (ts, id) lexicographic
            rows.append((sid, t, last[1], last[0], t - last_tick))
    return sorted(rows)


def test_frame_stream_matches_oracle(spark):
    df = spark.createDataFrame(FRAMES, "session_id string, frame_id long,"
                                       " ts_ms long")
    got = sorted(tuple(r) for r in frame_stream(df).collect())
    assert got == oracle(FRAMES)


def test_frame_stream_reserves_across_gap(spark):
    df = spark.createDataFrame(FRAMES, "session_id string, frame_id long,"
                                       " ts_ms long")
    out = {(r["poll_tick"], r["age_polls"]): r["frame_id"]
           for r in frame_stream(df).filter("session_id='s1'").collect()}
    # windows 2..4 re-serve frame 3 (rendered in window 1) at ages 1..3
    assert out[(2, 1)] == 3 and out[(3, 2)] == 3 and out[(4, 3)] == 3
    assert out[(5, 0)] == 4  # fresh frame ends the re-serve run
