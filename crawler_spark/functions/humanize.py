"""P2 — human-behavior pacing, re-expressed as deterministic columns.

The reference paces every browser action with randomized "human"
delays (`/root/reference/lib/crawler/browser-manager.ts:114-117` —
uniform 200..2000 ms think time before an action) and types text
character-by-character at 50..200 ms per key with a 2% chance of a
typo-and-correct detour (+100 ms typo key, +200..500 ms pause,
`browser-manager.ts:119-133`).

A batch engine cannot sleep, and `Math.random()` would break replay —
so the Spark analog assigns each action the SAME distributions but
driven by xxhash64 of its identity (session, action index, salt lane).
The output is a per-session schedule: when each action would start and
how long its typing takes, deterministic across runs and partitions.
The politeness scheduler (W5) consumes per-host budgets; this operator
supplies the per-session pacing term a full fetch-time simulation adds
on top.

All columns are native Catalyst expressions (xxhash64 / transform /
aggregate) — no UDFs, one window shuffle partitioned by session_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SPAN = 2**64  # xxhash64 lanes mapped onto [0,1) as (h mod span)/span


def _unit(*cols) -> "F.Column":
    """Deterministic uniform [0,1) from the hash of the given columns
    (unsigned reinterpretation of the signed 64-bit hash)."""
    h = F.xxhash64(*cols)
    # 2**63 exceeds py4j's long literal range — build it as a decimal
    half = F.lit(str(2**63)).cast("decimal(25,0)")
    return (h.cast("decimal(25,0)") + half) / F.lit(float(_SPAN))


def humanize_schedule(actions: DataFrame,
                      min_ms: int = 200, max_ms: int = 2000,
                      key_min_ms: int = 50, key_max_ms: int = 200,
                      typo_rate: float = 0.02) -> DataFrame:
    """`actions(session_id, action_index, action_type[, text])` →
    + delay_ms        think time before the action (uniform min..max)
    + type_ms         typing duration for `type` actions: per-char
                      key delay, plus typo-correct detours at
                      `typo_rate` per char (+100 ms key + 200..500 ms
                      pause); 0 for non-type actions
    + start_offset_ms when the action starts relative to the
                      session's first action (cumulative sum of all
                      earlier delays+typing, in action_index order)
    """
    sid, idx = F.col("session_id"), F.col("action_index")
    delay = (F.lit(min_ms)
             + (_unit(sid, idx, F.lit("delay"))
                * F.lit(max_ms - min_ms)).cast("long"))

    # length > 0 matters: F.sequence(1, 0) yields a DESCENDING [1, 0]
    # (not an empty array), which would charge an empty text two
    # phantom keystrokes
    has_text = ((F.col("action_type") == "type")
                & F.col("text").isNotNull() & (F.length("text") > 0))
    chars = F.sequence(F.lit(1), F.length("text"))
    per_char = F.transform(
        chars,
        lambda i: (F.lit(key_min_ms)
                   + (_unit(sid, idx, i, F.lit("key"))
                      * F.lit(key_max_ms - key_min_ms)).cast("long"))
        + F.when(_unit(sid, idx, i, F.lit("typo")) < F.lit(typo_rate),
                 F.lit(100 + 200)
                 + (_unit(sid, idx, i, F.lit("fix"))
                    * F.lit(300)).cast("long"))
           .otherwise(F.lit(0)))
    type_ms = F.when(
        has_text,
        F.aggregate(per_char, F.lit(0).cast("long"), lambda a, x: a + x)
    ).otherwise(F.lit(0))

    w = (Window.partitionBy("session_id").orderBy("action_index")
         .rowsBetween(Window.unboundedPreceding, -1))
    # start = earlier actions' (think + typing) time, plus this
    # action's own think time — typing happens after the action fires
    return (actions
            .withColumn("delay_ms", delay)
            .withColumn("type_ms", type_ms)
            .withColumn("start_offset_ms",
                        F.coalesce(
                            F.sum(F.col("delay_ms") + F.col("type_ms"))
                            .over(w), F.lit(0)) + F.col("delay_ms")))
