"""P3 — browser stealth/context setup, re-expressed as per-session columns.

The reference provisions every browser context with a randomly rotated
user agent (4 fixed UAs, `/root/reference/lib/crawler/
browser-manager.ts:105-114`), a 1920x1080 viewport jittered by
+0..99 px per axis (`browser-manager.ts:58-61`), a fixed header set
(`browser-manager.ts:29-37`) and a fixed list of navigator/automation
spoofs injected per page (`browser-manager.ts:63-103`).

A batch engine has no browser to configure — what survives the graft
is the *assignment*: which fetch identity each crawl session would
present. `Math.random()` would break replay, so each session draws its
UA and viewport from xxhash64 of its own id (one lane per decision,
mirroring the reference's independent draws). The spoof list and
header set are constants in both worlds and surface as typed array /
map columns so downstream fetch simulation and politeness accounting
can group by them.

Everything is a native Catalyst expression — no UDFs, no shuffle: the
operator is a pure projection and stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# browser-manager.ts:106-111 — the four rotated user agents, in the
# reference's array order (the hash lane picks an index 0..3).
USER_AGENTS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:120.0) "
    "Gecko/20100101 Firefox/120.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/17.0 Safari/605.1.15",
]

# browser-manager.ts:29-37 — constant context headers.
EXTRA_HEADERS = {
    "Accept": ("text/html,application/xhtml+xml,application/xml;q=0.9,"
               "image/webp,*/*;q=0.8"),
    "Accept-Language": "en-US,en;q=0.5",
    "Accept-Encoding": "gzip, deflate",
    "DNT": "1",
    "Connection": "keep-alive",
    "Upgrade-Insecure-Requests": "1",
}

# browser-manager.ts:92-97 — automation markers deleted per page.
AUTOMATION_PROPS = [
    "__webdriver_script_fn", "__webdriver_evaluate", "__selenium_unwrapped",
    "__webdriver_unwrapped", "__fxdriver_evaluate", "__driver_unwrapped",
    "__webdriver_script_func", "__webdriver_script_function",
]

BASE_W, BASE_H, JITTER = 1920, 1080, 100  # browser-manager.ts:27,58-61


def _lane(sid, salt: str, span: int) -> "F.Column":
    """Deterministic uniform pick in [0, span) from xxhash64(sid, salt)
    (pmod folds the signed hash onto the non-negative range)."""
    return F.pmod(F.xxhash64(sid, F.lit(salt)), F.lit(span)).cast("int")


def session_context(sessions: DataFrame,
                    session_col: str = "session_id") -> DataFrame:
    """`sessions(session_id, ...)` → + user_agent, viewport_w,
    viewport_h, headers (map), spoofed_props (array), languages.

    One row per session: the identity the reference's BrowserManager
    would hand that session's context. UA index and viewport jitter
    are independent hash lanes of the session id — deterministic
    across runs, partitions and core counts (the reference draws them
    with Math.random(); the distributions match, the seed is the
    session identity so replay is exact).
    """
    sid = F.col(session_col)
    ua = F.array(*[F.lit(u) for u in USER_AGENTS])[_lane(sid, "ua", 4)]
    headers = F.create_map(
        *[F.lit(x) for kv in EXTRA_HEADERS.items() for x in kv])
    return (sessions
            .withColumn("user_agent", ua)
            .withColumn("viewport_w",
                        F.lit(BASE_W) + _lane(sid, "vw", JITTER))
            .withColumn("viewport_h",
                        F.lit(BASE_H) + _lane(sid, "vh", JITTER))
            .withColumn("headers", headers)
            .withColumn("spoofed_props",
                        F.array(*[F.lit(p) for p in AUTOMATION_PROPS]))
            .withColumn("languages",
                        F.array(F.lit("en-US"), F.lit("en"))))
