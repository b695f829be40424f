"""Record-mode analytics: batch-simulated streaming over action /
mutation event tables — the Spark re-expression of the reference's
live-session pipelines (SURVEY.md §2.8-2.9).

Reference semantics reproduced:
  * M2 heuristic modal scorer as a pure column-expression sum with
    threshold ≥ 50 (/root/reference/lib/recorder/browser-session.ts:
    3824-3939, threshold :3932),
  * A6/W3 top-1 candidate per trigger (argmax score, :3945-3963),
  * ST3 keyed modal lifecycle (open → content-change → close,
    :3999-4160) as a state table advanced per micro-batch,
  * ST4 3-second screenshot-dedup window keyed by (component,
    reason) (:2444-2473),
  * ST5/J7 as-of action attribution — each modal event labeled with
    the latest action at-or-before it (:4126-4131),
  * M4 site-rules MERGE keyed (domain, page_path, selector) with
    version bump (:988-1198) — an Iceberg `MERGE INTO` shape,
    implemented here against parquet snapshot state.

The batch loop is deterministic: state in tables, no wall clock; the
same event stream replayed in any batch partitioning yields identical
final state (asserted vs the sequential oracle in
tests/test_record_mode.py). On a cluster the same code runs under
foreachBatch of a Structured Streaming query; `applyInPandasWithState`
is deliberately avoided — the state JOIN formulation shuffles by key
and needs no Python state objects."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MODAL_THRESHOLD = 50
SCREENSHOT_DEDUP_MS = 3000

MODAL_CLASS_KEYWORDS = ("modal", "dialog", "popup", "overlay", "backdrop",
                        "lightbox")
MODAL_TEXT_KEYWORDS = ("login", "sign in", "register", "password", "email",
                       "close", "cancel", "ok", "submit")


def modal_score(position=None, z_index=None, center_dx=None, center_dy=None,
                width=None, height=None, classes=None, kw_text=None,
                has_form=None, has_backdrop=None, newly_appeared=None,
                vw=1920.0, vh=1080.0):
    """The M2 scorer as one column expression (reference weights,
    browser-session.ts:3824-3939): fixed +30 / absolute +20;
    z>1000 +25 / z>100 +15; h-centered(<100px) +20;
    v-centered(<150px) +20; modal-sized (300..0.8vw × 200..0.8vh)
    +25; text keyword hits ×5; form +15; class keyword hits ×10;
    backdrop +15; newly appeared +20. Column args default to the
    same-named columns (resolved lazily — no SparkContext needed at
    import time)."""
    position = F.col("position") if position is None else position
    z_index = F.col("z_index") if z_index is None else z_index
    center_dx = F.col("center_dx") if center_dx is None else center_dx
    center_dy = F.col("center_dy") if center_dy is None else center_dy
    width = F.col("width") if width is None else width
    height = F.col("height") if height is None else height
    classes = F.col("classes") if classes is None else classes
    kw_text = F.col("kw_text") if kw_text is None else kw_text
    has_form = F.col("has_form") if has_form is None else has_form
    has_backdrop = F.col("has_backdrop") if has_backdrop is None else has_backdrop
    newly_appeared = (F.col("newly_appeared") if newly_appeared is None
                      else newly_appeared)
    vw, vh = F.lit(float(vw)), F.lit(float(vh))
    kw_hits = sum(
        (F.when(F.lower(kw_text).contains(k), 1).otherwise(0)
         for k in MODAL_TEXT_KEYWORDS),
        start=F.lit(0))
    cls_hits = sum(
        (F.when(F.lower(classes).contains(k), 1).otherwise(0)
         for k in MODAL_CLASS_KEYWORDS),
        start=F.lit(0))
    return (
        F.when(position == "fixed", 30)
        .when(position == "absolute", 20).otherwise(0)
        + F.when(z_index > 1000, 25).when(z_index > 100, 15).otherwise(0)
        + F.when(F.abs(center_dx) < 100, 20).otherwise(0)
        + F.when(F.abs(center_dy) < 150, 20).otherwise(0)
        + F.when((width >= 300) & (width <= 0.8 * vw)
                 & (height >= 200) & (height <= 0.8 * vh), 25).otherwise(0)
        + kw_hits * 5
        + F.when(has_form, 15).otherwise(0)
        + cls_hits * 10
        + F.when(has_backdrop, 15).otherwise(0)
        + F.when(newly_appeared, 20).otherwise(0)
    ).cast("long")


def detect_modals(mutations: DataFrame) -> DataFrame:
    """Score every candidate element row; keep threshold survivors and
    the top-1 per (session_id, ts) trigger (A6/W3)."""
    scored = mutations.withColumn("score", modal_score())
    w = Window.partitionBy("session_id", "ts").orderBy(
        F.col("score").desc(), F.col("selector"))
    return (scored.filter(F.col("score") >= MODAL_THRESHOLD)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1).drop("rn"))


def attribute_actions(modals: DataFrame, actions: DataFrame) -> DataFrame:
    """ST5/J7 as-of join: latest action with action ts ≤ modal ts per
    session (ties: the action row wins, matching `lastAction` being
    updated before modal handling)."""
    acts = actions.select("session_id", F.col("ts").alias("ats"),
                          F.col("action_type").alias("trigger_action"),
                          F.lit(1).alias("is_action"))
    mods = modals.withColumn("is_action", F.lit(0))
    merged = mods.unionByName(
        acts.withColumnRenamed("ats", "ts"), allowMissingColumns=True)
    w = (Window.partitionBy("session_id")
         .orderBy("ts", F.col("is_action").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    lastact = F.last(F.when(F.col("is_action") == 1,
                            F.col("trigger_action")), ignorenulls=True)
    out = (merged.withColumn("attributed_action", lastact.over(w))
           .filter(F.col("is_action") == 0)
           .drop("is_action", "trigger_action"))
    return out


def dedup_screenshots(shots: DataFrame) -> DataFrame:
    """ST4: drop screenshot requests for the same (session_id,
    component_id, reason) within SCREENSHOT_DEDUP_MS of the previous
    KEPT one — the reference's recentScreenshots map
    (browser-session.ts:2444-2473). 'Previous kept' is inherently a
    sequential per-key scan (a lag-chain can't express it), so this
    is a grouped `applyInPandas`: keyed state exactly like
    `applyInPandasWithState` would hold, sequential within a key,
    parallel across keys — the shuffle is on the dedup key."""
    key = ["session_id", "component_id", "reason"]
    win_ms = SCREENSHOT_DEDUP_MS

    def scan(pdf):
        import numpy as np

        pdf = pdf.sort_values(["ts", "shot_id"]).reset_index(drop=True)
        # plain int64 scan (no per-row pandas objects): the greedy
        # keep-chain is sequential, but it only needs the ms column
        ms = pdf["ts"].astype("int64").to_numpy() // 1_000_000
        keep = np.zeros(len(ms), dtype=bool)
        last_ms = None
        for i, m in enumerate(ms.tolist()):
            if last_ms is None or m - last_ms > win_ms:
                keep[i] = True
                last_ms = m
        return pdf[keep]

    return shots.groupBy(*key).applyInPandas(scan, schema=shots.schema)


def modal_lifecycle(snapshots: DataFrame) -> DataFrame:
    """ST3: the keyed modal state machine (open → content-change →
    close, browser-session.ts:3999-4160) over presence snapshots.

    Input: one row per (session_id, selector, tick) where the modal
    was PRESENT at that poll tick, with its `content`. Emits event
    rows (session_id, selector, tick, event): 'open' on first
    appearance or reappearance after an absent tick, 'change' when
    present consecutively with different content, 'close' at the
    tick after the last presence of a run (activeModal = null on
    disappearance, :4155-4160).

    Pure window algebra over (session, selector) ordered by tick —
    keyed state without applyInPandasWithState; shuffles once on the
    state key."""
    w = Window.partitionBy("session_id", "selector").orderBy("tick")
    d = (snapshots
         .withColumn("prev_tick", F.lag("tick").over(w))
         .withColumn("prev_content", F.lag("content").over(w))
         .withColumn("next_tick", F.lead("tick").over(w)))
    opens = (d.filter(F.col("prev_tick").isNull()
                      | (F.col("tick") - F.col("prev_tick") > 1))
             .select("session_id", "selector", "tick",
                     F.lit("open").alias("event")))
    changes = (d.filter((F.col("tick") - F.col("prev_tick") == 1)
                        & (F.col("content") != F.col("prev_content")))
               .select("session_id", "selector", "tick",
                       F.lit("change").alias("event")))
    closes = (d.filter(F.col("next_tick").isNull()
                       | (F.col("next_tick") - F.col("tick") > 1))
              .select("session_id", "selector",
                      (F.col("tick") + 1).alias("tick"),
                      F.lit("close").alias("event")))
    return opens.unionByName(changes).unionByName(closes)


EXTRA_KEYWORDS = ("edit", "create", "add", "delete", "confirm", "save",
                  "cancel", "close", "settings", "options")


def boosted_modal_score(mutations: DataFrame, rules: DataFrame) -> DataFrame:
    """M3 learned-rule boost (browser-session.ts:1568-1658): broadcast
    join candidate elements against trained site rules on
    (domain, page_path); matched rows gain: trained class exact match
    +40, same position +10, dimensions within ±100 px +15, extra
    keyword hits ×5. Returns the M2 score + boost as `score`."""
    base = mutations.withColumn("base_score", modal_score())
    r = F.broadcast(rules.select(
        "domain", "page_path",
        F.col("classes").alias("rule_classes"),
        F.col("position").alias("rule_position"),
        F.col("width").alias("rule_width"),
        F.col("height").alias("rule_height")))
    j = base.join(r, ["domain", "page_path"], "left")
    extra_hits = sum(
        (F.when(F.lower("kw_text").contains(k), 1).otherwise(0)
         for k in EXTRA_KEYWORDS),
        start=F.lit(0))
    boost = (
        F.when(F.col("rule_classes").isNotNull()
               & (F.col("classes") == F.col("rule_classes")), 40).otherwise(0)
        + F.when(F.col("rule_position").isNotNull()
                 & (F.col("position") == F.col("rule_position")), 10)
        .otherwise(0)
        + F.when(F.col("rule_width").isNotNull()
                 & (F.abs(F.col("width") - F.col("rule_width")) <= 100)
                 & (F.abs(F.col("height") - F.col("rule_height")) <= 100), 15)
        .otherwise(0)
        + F.when(F.col("rule_classes").isNotNull(), extra_hits * 5)
        .otherwise(0))
    return (j.withColumn("score", (F.col("base_score") + boost).cast("long"))
            .drop("rule_classes", "rule_position", "rule_width",
                  "rule_height", "base_score"))


def hierarchical_selector(context: "F.Column", target: "F.Column"):
    """M5 (browser-session.ts:1211-1290): context elements (structs
    with tag, first_class, level; level 1 = immediate parent) sorted
    deepest-ancestor-first, mapped to '.firstClass' or tag, joined
    with ' > ', then the target selector. body/html ancestors are
    excluded by the harvest. Native fold — no UDF."""
    keyed = F.transform(
        context,
        lambda c: F.struct((-c["level"]).alias("k"),
                           F.when(c["first_class"] != "",
                                  F.concat(F.lit("."), c["first_class"]))
                           .otherwise(c["tag"]).alias("sel")))
    parts = F.transform(F.array_sort(keyed), lambda s: s["sel"])
    chain = F.array_join(parts, " > ")
    return F.when(F.size(context) == 0, target).otherwise(
        F.concat(chain, F.lit(" > "), target))


def detect_parent_components(components: DataFrame) -> DataFrame:
    """M7 parent-modal detection (browser-session.ts:1446-1494): a
    trained component's parent is the same-page component whose DOM
    node-path strictly contains it — re-expressed as a hierarchical
    prefix match on the `node_path` column ('0/3/1/2'-style index
    paths), choosing the DEEPEST containing ancestor (the reference
    walks up from the element, so the nearest ancestor wins).

    Self-join on (domain, page_path), prefix containment filter,
    argmax ancestor depth per child. Shuffles once on the page key —
    rules tables are small, the join broadcasts."""
    c = components.select("domain", "page_path", "component_id", "node_path")
    child = c.select("domain", "page_path",
                     F.col("component_id").alias("child_id"),
                     F.col("node_path").alias("child_path"))
    parent = c.select("domain", "page_path",
                      F.col("component_id").alias("parent_id"),
                      F.col("node_path").alias("parent_path"))
    j = (child.join(F.broadcast(parent), ["domain", "page_path"])
         .filter((F.col("child_id") != F.col("parent_id"))
                 & F.col("child_path").startswith(
                     F.concat(F.col("parent_path"), F.lit("/")))))
    w = Window.partitionBy("domain", "page_path", "child_id").orderBy(
        F.length("parent_path").desc(), F.col("parent_id"))
    nearest = (j.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1)
               .select("domain", "page_path",
                       F.col("child_id").alias("component_id"),
                       F.col("parent_id")))
    return (components.join(nearest,
                            ["domain", "page_path", "component_id"], "left"))


def uncaptured_modals(detected: DataFrame, captured: DataFrame) -> DataFrame:
    """J6 modal-vs-captured anti-join (browser-session.ts:4008-4015):
    a newly detected modal is skipped when the session has already
    captured one with the same selector AND the same first 50 content
    characters (`modal_content?.substring(0, 50) || ''`). Null/absent
    content compares as ''. Shuffles once on the capture key; the
    captured side is deduplicated before the anti-join."""
    def preview(col):
        return F.substring(F.coalesce(col, F.lit("")), 1, 50)

    d = detected.withColumn("content_preview", preview(F.col("content")))
    c = (captured.select("session_id", "selector",
                         preview(F.col("content")).alias("content_preview"))
         .distinct())
    return d.join(c, ["session_id", "selector", "content_preview"],
                  "left_anti")


def component_monitor(rules: DataFrame, elements: DataFrame) -> DataFrame:
    """M8 trained-component monitor (browser-session.ts:2934-2997):
    every poll tick, trained components for the current page are
    joined against the live visible elements; a (component, instance)
    enters monitoring on the first visible tick of a presence run
    ('monitor' — `monitoredElements.set`, :2971-2975) and is cleaned
    up at the tick after its run ends ('cleanup' — the
    disappeared-state sweep over `currentIds`, :2979-2991).

    rules is a broadcast dim; elements shuffle once on the monitor key
    (session, component, instance); run boundaries are window algebra
    over ticks — the same keyed-state-without-applyInPandasWithState
    shape as modal_lifecycle."""
    live = (elements.filter(F.col("visible"))
            .join(F.broadcast(rules.select("domain", "page_path",
                                           "selector", "component_id")),
                  ["domain", "page_path", "selector"])
            .withColumn("uid",
                        F.concat(F.col("component_id"), F.lit("_"),
                                 F.col("instance").cast("string"))))
    w = Window.partitionBy("session_id", "uid").orderBy("tick")
    d = (live.withColumn("prev_tick", F.lag("tick").over(w))
         .withColumn("next_tick", F.lead("tick").over(w)))
    starts = (d.filter(F.col("prev_tick").isNull()
                       | (F.col("tick") - F.col("prev_tick") > 1))
              .select("session_id", "uid", "tick",
                      F.lit("monitor").alias("event")))
    cleanups = (d.filter(F.col("next_tick").isNull()
                         | (F.col("next_tick") - F.col("tick") > 1))
                .select("session_id", "uid",
                        (F.col("tick") + 1).alias("tick"),
                        F.lit("cleanup").alias("event")))
    return starts.unionByName(cleanups)


def delete_trained_components(state: DataFrame,
                              deletes: DataFrame) -> DataFrame:
    """SO5 rule delete (app/api/delete-trained-component/route.ts:
    29-42): the `MERGE … WHEN MATCHED DELETE` half of the rules-store
    contract. Matching (domain, component_id) rows are dropped; every
    successful delete call rewrites its domain's rules file with
    version + 1 (:37), so the surviving rows of a domain carry
    version + (#distinct components actually deleted there); deletes
    that match nothing are 404s and bump nothing. The delete-key set
    is broadcast (API-call sized)."""
    dkeys = deletes.select("domain", "component_id").distinct()
    n_del = (state.join(F.broadcast(dkeys), ["domain", "component_id"],
                        "left_semi")
             .groupBy("domain")
             .agg(F.count_distinct("component_id").alias("n_deleted")))
    kept = state.join(F.broadcast(dkeys), ["domain", "component_id"],
                      "left_anti")
    return (kept.join(F.broadcast(n_del), "domain", "left")
            .withColumn("version",
                        (F.col("version")
                         + F.coalesce(F.col("n_deleted"), F.lit(0)))
                        .cast("long"))
            .drop("n_deleted"))


def merge_site_rules(state: DataFrame, training: DataFrame) -> DataFrame:
    """M4 rules MERGE: upsert trained components keyed by (domain,
    page_path, selector). New keys insert with version 1; existing
    keys update training data and bump version — `MERGE INTO …
    WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT` over the rules
    snapshot. Duplicate keys inside one batch keep the latest ts
    (last-writer-wins within a batch)."""
    key = ["domain", "page_path", "selector"]
    w = Window.partitionBy(*key).orderBy(F.col("ts").desc())
    batch = (training.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1).drop("rn"))
    joined = batch.alias("b").join(
        state.alias("s").select(*key, F.col("version").alias("old_version")),
        key, "left")
    upserts = joined.select(
        *key, F.col("b.component_id").alias("component_id"),
        F.col("b.classes").alias("classes"),
        F.col("b.ts").alias("updated_ts"),
        (F.coalesce(F.col("old_version"), F.lit(0)) + 1).alias("version"))
    untouched = state.join(batch.select(*key), key, "left_anti")
    return untouched.unionByName(upserts)
