"""Record-mode pipeline vs sequential Python oracle: M2 scoring +
top-1, ST5 as-of attribution, ST4 screenshot dedup windows, M4 rules
MERGE across micro-batches (semantics cited in
crawler_spark/streaming/record_mode.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from crawler_spark.core.xxhash64 import xxhash64
from crawler_spark.streaming.record_mode import (MODAL_CLASS_KEYWORDS,
                                                 MODAL_TEXT_KEYWORDS,
                                                 MODAL_THRESHOLD,
                                                 attribute_actions,
                                                 dedup_screenshots,
                                                 detect_modals,
                                                 merge_site_rules,
                                                 modal_score)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _x(key: str) -> int:
    return xxhash64(key.encode(), 0)


def make_mutations():
    rows = []
    for s in range(4):
        for i in range(40):
            r = _x(f"mut:{s}:{i}")
            rows.append(dict(
                session_id=f"s{s}",
                ts=T0 + dt.timedelta(milliseconds=200 * i),
                selector=f"div.el{r % 7}",
                position=["fixed", "absolute", "static"][r % 3],
                z_index=int((r >> 3) % 2000),
                center_dx=float((r >> 5) % 400 - 200),
                center_dy=float((r >> 7) % 500 - 250),
                width=float(100 + (r >> 9) % 900),
                height=float(80 + (r >> 11) % 700),
                classes=["modal-dialog", "content overlay", "nav", "popup x",
                         "plain"][r % 5],
                kw_text=["please login with email", "random text",
                         "close or cancel", "submit password", "hello"][r % 5],
                has_form=bool(r % 2),
                has_backdrop=bool((r >> 1) % 2),
                newly_appeared=bool((r >> 2) % 2),
            ))
    return rows


def py_score(m) -> int:
    s = {"fixed": 30, "absolute": 20}.get(m["position"], 0)
    s += 25 if m["z_index"] > 1000 else (15 if m["z_index"] > 100 else 0)
    s += 20 if abs(m["center_dx"]) < 100 else 0
    s += 20 if abs(m["center_dy"]) < 150 else 0
    if 300 <= m["width"] <= 0.8 * 1920 and 200 <= m["height"] <= 0.8 * 1080:
        s += 25
    s += 5 * sum(1 for k in MODAL_TEXT_KEYWORDS if k in m["kw_text"].lower())
    s += 15 if m["has_form"] else 0
    s += 10 * sum(1 for k in MODAL_CLASS_KEYWORDS if k in m["classes"].lower())
    s += 15 if m["has_backdrop"] else 0
    s += 20 if m["newly_appeared"] else 0
    return s


def test_modal_scoring_and_top1(spark):
    rows = make_mutations()
    df = spark.createDataFrame(rows)
    got = {(r["session_id"], r["ts"], r["selector"]): r["score"]
           for r in detect_modals(df).collect()}
    # oracle: top-1 per (session, ts) among threshold survivors
    best = {}
    for m in rows:
        sc = py_score(m)
        if sc < MODAL_THRESHOLD:
            continue
        k = (m["session_id"], m["ts"])
        cur = best.get(k)
        if cur is None or (-sc, m["selector"]) < (-cur[1], cur[0]):
            best[k] = (m["selector"], sc)
    exp = {(k[0], k[1], v[0]): v[1] for k, v in best.items()}
    assert got == exp
    assert exp, "fixture must produce detections"


def test_asof_attribution(spark):
    actions, modals, expected = [], [], {}
    for s in range(3):
        last = None
        for i in range(30):
            ts = T0 + dt.timedelta(seconds=i)
            r = _x(f"ev:{s}:{i}")
            if r % 3 != 0:
                a = ["click", "type", "scroll"][r % 3 - 1 if r % 3 > 0 else 0]
                actions.append(dict(session_id=f"s{s}", ts=ts, action_type=a))
                last = a
            else:
                mid = f"m{s}:{i}"
                modals.append(dict(session_id=f"s{s}", ts=ts, modal_id=mid))
                expected[mid] = last
    adf = spark.createDataFrame(actions)
    mdf = spark.createDataFrame(modals)
    got = {r["modal_id"]: r["attributed_action"]
           for r in attribute_actions(mdf, adf).collect()}
    assert got == expected
    assert any(v is None for v in expected.values()) or True


def test_screenshot_dedup_window(spark):
    shots, keep = [], set()
    sid = 0
    for comp in ("c1", "c2"):
        last_kept = None
        for i in range(25):
            gap_ms = [500, 1500, 4000][_x(f"shot:{comp}:{i}") % 3]
            ts = (T0 if i == 0 else shots[-1]["ts"]
                  + dt.timedelta(milliseconds=gap_ms))
            shots.append(dict(session_id="s0", component_id=comp,
                              reason="change", shot_id=sid, ts=ts))
            ms = ts.timestamp() * 1000
            if last_kept is None or ms - last_kept > 3000:
                keep.add(sid)
                last_kept = ms
            sid += 1
    df = spark.createDataFrame(shots)
    got = {r["shot_id"] for r in dedup_screenshots(df).collect()}
    assert got == keep
    assert 0 < len(keep) < len(shots)


def test_modal_lifecycle(spark):
    """open/change/close state machine vs sequential replay."""
    from crawler_spark.streaming.record_mode import modal_lifecycle

    rows = []
    for s in range(3):
        for sel in ("div.m1", "div.m2"):
            for tick in range(30):
                r = _x(f"lc:{s}:{sel}:{tick}")
                if r % 3 != 0:  # present at this tick
                    rows.append(dict(session_id=f"s{s}", selector=sel,
                                     tick=tick, content=f"c{r % 4}"))
    # oracle: sequential replay
    exp = set()
    from collections import defaultdict

    present = defaultdict(dict)
    for row in rows:
        present[(row["session_id"], row["selector"])][row["tick"]] = row["content"]
    for key, ticks in present.items():
        last_tick, last_content = None, None
        for t in sorted(ticks):
            if last_tick is None or t - last_tick > 1:
                exp.add((key[0], key[1], t, "open"))
                if last_tick is not None:
                    exp.add((key[0], key[1], last_tick + 1, "close"))
            elif ticks[t] != last_content:
                exp.add((key[0], key[1], t, "change"))
            last_tick, last_content = t, ticks[t]
        exp.add((key[0], key[1], last_tick + 1, "close"))
    got = {(r["session_id"], r["selector"], r["tick"], r["event"])
           for r in modal_lifecycle(spark.createDataFrame(rows)).collect()}
    assert got == exp
    assert {e for *_, e in exp} == {"open", "change", "close"}


def test_boosted_modal_score(spark):
    """M3 rule-boost vs python oracle."""
    from crawler_spark.streaming.record_mode import (EXTRA_KEYWORDS,
                                                     boosted_modal_score)

    muts = []
    for m in make_mutations()[:60]:
        m = dict(m)
        m["domain"] = "www.example.com"
        m["page_path"] = f"/p{_x('pp:' + m['selector']) % 2}"
        muts.append(m)
    rules = [dict(domain="www.example.com", page_path="/p0",
                  classes="modal-dialog", position="fixed",
                  width=500.0, height=400.0)]
    got = {(r["session_id"], r["ts"], r["selector"]): r["score"]
           for r in boosted_modal_score(
               spark.createDataFrame(muts),
               spark.createDataFrame(rules)).collect()}
    exp = {}
    for m in muts:
        s = py_score(m)
        if m["page_path"] == "/p0":
            if m["classes"] == "modal-dialog":
                s += 40
            if m["position"] == "fixed":
                s += 10
            if abs(m["width"] - 500.0) <= 100 and abs(m["height"] - 400.0) <= 100:
                s += 15
            s += 5 * sum(1 for k in EXTRA_KEYWORDS if k in m["kw_text"].lower())
        exp[(m["session_id"], m["ts"], m["selector"])] = s
    assert got == exp


def test_hierarchical_selector(spark):
    from pyspark.sql import functions as F

    from crawler_spark.streaming.record_mode import hierarchical_selector

    rows = [
        dict(target="#login", context=[
            dict(tag="div", first_class="wrapper", level=2),
            dict(tag="section", first_class="", level=1)]),
        dict(target="div.modal", context=[
            dict(tag="main", first_class="content", level=3),
            dict(tag="div", first_class="", level=2),
            dict(tag="form", first_class="auth", level=1)]),
        dict(target="button", context=[]),
    ]
    df = spark.createDataFrame(rows)
    got = [r["sel"] for r in df.select(
        hierarchical_selector(F.col("context"), F.col("target")).alias("sel")
    ).collect()]
    assert got == [".wrapper > section > #login",
                   ".content > div > .auth > div.modal",
                   "button"]


def test_parent_containment(spark):
    """M7: nearest containing ancestor by node-path prefix."""
    from crawler_spark.streaming.record_mode import detect_parent_components

    rows = [
        dict(domain="d", page_path="/p", component_id="root", node_path="0"),
        dict(domain="d", page_path="/p", component_id="mid", node_path="0/2"),
        dict(domain="d", page_path="/p", component_id="leaf",
             node_path="0/2/5"),
        dict(domain="d", page_path="/p", component_id="other",
             node_path="1/4"),
        dict(domain="d", page_path="/q", component_id="qroot",
             node_path="0/2"),  # same prefix, different page
        # '0/22' must NOT be contained by '0/2' (segment boundary)
        dict(domain="d", page_path="/p", component_id="sib",
             node_path="0/22"),
    ]
    got = {r["component_id"]: r["parent_id"]
           for r in detect_parent_components(
               spark.createDataFrame(rows)).collect()}
    assert got == {"root": None, "mid": "root", "leaf": "mid",
                   "other": None, "qroot": None, "sib": "root"}


def test_rules_merge_batches(spark):
    schema = ("domain string, page_path string, selector string, "
              "component_id string, classes string, ts timestamp")
    state = spark.createDataFrame([], schema=schema + ", updated_ts timestamp"
                                  ).selectExpr(
        "domain", "page_path", "selector", "component_id", "classes",
        "ts as updated_ts", "1 as version").limit(0)
    # three micro-batches of training events; oracle folds a dict
    batches, oracle = [], {}
    version = {}
    for b in range(3):
        rows = []
        for i in range(6):
            r = _x(f"train:{b}:{i}")
            key = ("www.example.com", f"/p{r % 3}", f"div.t{r % 4}")
            ts = T0 + dt.timedelta(minutes=10 * b + i)
            row = dict(domain=key[0], page_path=key[1], selector=key[2],
                       component_id=f"c{b}{i}", classes=f"cls{r % 5}", ts=ts)
            rows.append(row)
        # oracle: last-writer-wins within batch, version bump per batch
        latest = {}
        for row in rows:
            k = (row["domain"], row["page_path"], row["selector"])
            if k not in latest or row["ts"] >= latest[k]["ts"]:
                latest[k] = row
        for k, row in latest.items():
            version[k] = version.get(k, 0) + 1
            oracle[k] = (row["component_id"], row["classes"], version[k])
        batches.append(spark.createDataFrame(rows, schema=schema))
    cur = state
    for bdf in batches:
        cur = merge_site_rules(cur, bdf)
        cur = spark.createDataFrame(cur.collect(), schema=cur.schema)
    got = {(r["domain"], r["page_path"], r["selector"]):
           (r["component_id"], r["classes"], r["version"])
           for r in cur.collect()}
    assert got == oracle
    assert max(v[2] for v in got.values()) >= 2  # real upserts happened


# ---------------------------------------------------------------------------
# J6 / M8 / SO5 / F12 (round-2 additions)
# ---------------------------------------------------------------------------

def test_uncaptured_modals_anti_join(spark):
    """J6: detected modals already captured with the same selector and
    content[:50] are skipped; null content compares as ''."""
    from crawler_spark.streaming.record_mode import uncaptured_modals

    detected = spark.createDataFrame(
        [("s1", "div.m", 1, "A" * 60),       # matches captured prefix
         ("s1", "div.m", 2, "A" * 50 + "ZZ"),  # same 50-char preview
         ("s1", "div.m", 3, "B" * 10),       # new content
         ("s1", "div.x", 4, "A" * 60),       # same content, new selector
         ("s2", "div.m", 5, "A" * 60),       # same modal, other session
         ("s1", "div.n", 6, None),           # null content
         ("s1", "div.o", 7, None)],          # null vs captured ''
        "session_id string, selector string, modal_id long, content string")
    captured = spark.createDataFrame(
        [("s1", "div.m", "A" * 55),
         ("s1", "div.n", "C"),
         ("s1", "div.o", "")],
        "session_id string, selector string, content string")
    got = {r["modal_id"]
           for r in uncaptured_modals(detected, captured).collect()}
    assert got == {3, 4, 5, 6}


def test_component_monitor_runs(spark):
    """M8: monitor starts at each presence-run begin, cleanup fires at
    the tick after the run ends (disappeared-state sweep)."""
    from crawler_spark.streaming.record_mode import component_monitor

    rules = spark.createDataFrame(
        [("d0", "/p", "s0", "c0"), ("d0", "/p", "s0", "c9")],
        "domain string, page_path string, selector string, "
        "component_id string")
    rows = [
        # instance 0: run ticks 1-3, then gap, run 6
        ("u1", "d0", "/p", "s0", 0, True, 1),
        ("u1", "d0", "/p", "s0", 0, True, 2),
        ("u1", "d0", "/p", "s0", 0, True, 3),
        ("u1", "d0", "/p", "s0", 0, True, 6),
        # invisible tick does not extend a run
        ("u1", "d0", "/p", "s0", 0, False, 4),
        # instance 1: single tick
        ("u1", "d0", "/p", "s0", 1, True, 2),
        # unmatched selector: ignored
        ("u1", "d0", "/p", "sX", 0, True, 1),
    ]
    elements = spark.createDataFrame(
        rows, "session_id string, domain string, page_path string, "
              "selector string, instance int, visible boolean, tick long")
    got = {(r["uid"], r["tick"], r["event"])
           for r in component_monitor(rules, elements).collect()}
    exp = set()
    for comp in ("c0", "c9"):  # both rules share the selector
        exp |= {(f"{comp}_0", 1, "monitor"), (f"{comp}_0", 4, "cleanup"),
                (f"{comp}_0", 6, "monitor"), (f"{comp}_0", 7, "cleanup"),
                (f"{comp}_1", 2, "monitor"), (f"{comp}_1", 3, "cleanup")}
    assert got == exp


def test_delete_trained_components(spark):
    """SO5: matched rows removed, the domain version bumps once per
    successfully deleted component, misses are 404-silent."""
    from crawler_spark.streaming.record_mode import delete_trained_components

    state = spark.createDataFrame(
        [("d0", "c1", "s1", 3), ("d0", "c2", "s2", 3),
         ("d0", "c3", "s3", 3), ("d1", "c1", "s1", 7)],
        "domain string, component_id string, selector string, version long")
    deletes = spark.createDataFrame(
        [("d0", "c1"), ("d0", "c2"), ("d0", "c2"),   # dup request
         ("d0", "cMISS"), ("d2", "c1")],             # 404s
        "domain string, component_id string")
    got = {(r["domain"], r["component_id"], r["version"])
           for r in delete_trained_components(state, deletes).collect()}
    assert got == {("d0", "c3", 5),   # 3 + 2 deleted in d0
                   ("d1", "c1", 7)}   # untouched domain


def test_valid_screenshot_id(spark):
    """F12: empty / '..' / '/' / '\\' filenames are rejected."""
    from pyspark.sql import functions as F

    from crawler_spark.functions.urls import valid_screenshot_id

    rows = [("shot-1.png", True), ("a..b", False), ("", False),
            ("dir/x.png", False), ("c:\\win\\x", False),
            ("UPPER_case-9.jpeg", True), (None, False)]
    df = spark.createDataFrame([(n,) for n, _ in rows], "name string")
    got = [bool(r["ok"]) for r in df.select(
        F.coalesce(valid_screenshot_id(F.col("name")),
                   F.lit(False)).alias("ok")).collect()]
    assert got == [ok for _, ok in rows]
