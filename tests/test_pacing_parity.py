"""Spark ↔ pure-Python twin parity for the P2/P3 hash lanes
(functions/humanize + functions/stealth vs oracle/pacing_oracle):
the `session_pacing` driver query's golden-parquet oracle is only as
good as this bit-parity — every lane (string/long/int xxhash64
chaining, the decimal→double unit mapping, truncating casts, the
prefix-sum schedule, pmod UA/viewport lanes) must agree exactly."""

from __future__ import annotations

import pandas as pd

from crawler_spark.functions.humanize import humanize_schedule
from crawler_spark.functions.stealth import USER_AGENTS, session_context
from crawler_spark.oracle.pacing_oracle import USER_AGENTS as TWIN_UAS
from crawler_spark.oracle.pacing_oracle import session_pacing_rows

SCHEMA = ("session_id string, action_index long, action_type string, "
          "text string")


def test_ua_lists_equal():
    """The twin's no-pyspark copy of the UA rotation must track the
    operator's list."""
    assert USER_AGENTS == TWIN_UAS


def _mk_rows():
    rows = []
    texts = ["hi", "", "päylöad-ünicode ✓", None,
             "x" * 97, '{"k": 42}', "spaces  and\ttabs"]
    for s in range(17):
        for i in range(23):
            typ = ("type", "click", "nav", "scroll")[i % 4]
            text = texts[(s + i) % len(texts)] if typ == "type" else None
            rows.append((f"sess-{s}", s * 100 + i, typ, text))
    return rows


def test_spark_matches_twin(spark):
    rows = _mk_rows()
    df = spark.createDataFrame(rows, SCHEMA)
    got = (session_context(humanize_schedule(df))
           .select("session_id", "action_index", "delay_ms", "type_ms",
                   "start_offset_ms", "user_agent", "viewport_w",
                   "viewport_h")
           .toPandas()
           .sort_values(["session_id", "action_index"])
           .reset_index(drop=True))
    exp = pd.DataFrame(session_pacing_rows(rows, USER_AGENTS)).sort_values(
        ["session_id", "action_index"]).reset_index(drop=True)
    for col in ("delay_ms", "type_ms", "start_offset_ms"):
        assert (got[col].astype("int64")
                == exp[col].astype("int64")).all(), col
    assert (got["user_agent"] == exp["user_agent"]).all()
    assert (got["viewport_w"].astype("int64")
            == exp["viewport_w"].astype("int64")).all()
    assert (got["viewport_h"].astype("int64")
            == exp["viewport_h"].astype("int64")).all()
