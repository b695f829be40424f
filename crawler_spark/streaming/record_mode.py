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


def modal_score(position=F.col("position"), z_index=F.col("z_index"),
                center_dx=F.col("center_dx"), center_dy=F.col("center_dy"),
                width=F.col("width"), height=F.col("height"),
                classes=F.col("classes"), kw_text=F.col("kw_text"),
                has_form=F.col("has_form"), has_backdrop=F.col("has_backdrop"),
                newly_appeared=F.col("newly_appeared"),
                vw=F.lit(1920.0), vh=F.lit(1080.0)):
    """The M2 scorer as one column expression (reference weights,
    browser-session.ts:3824-3939): fixed +30 / absolute +20;
    z>1000 +25 / z>100 +15; h-centered(<100px) +20;
    v-centered(<150px) +20; modal-sized (300..0.8vw × 200..0.8vh)
    +25; text keyword hits ×5; form +15; class keyword hits ×10;
    backdrop +15; newly appeared +20."""
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
        pdf = pdf.sort_values(["ts", "shot_id"])
        kept_rows = []
        last_ms = None
        for _, row in pdf.iterrows():
            ms = row["ts"].value // 1_000_000
            if last_ms is None or ms - last_ms > win_ms:
                kept_rows.append(row)
                last_ms = ms
        import pandas as pd

        return pd.DataFrame(kept_rows, columns=pdf.columns)

    return shots.groupBy(*key).applyInPandas(scan, schema=shots.schema)


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
