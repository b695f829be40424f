"""Pure-Python twins of the P2/P3 deterministic-lane operators
(functions/humanize.humanize_schedule, functions/stealth.
session_context). The lanes are Spark multi-arg xxhash64 chains —
seed-42 hashing of each argument with the running hash as the next
seed, strings as UTF-8 bytes, longs as 8 little-endian bytes, ints as
4 little-endian bytes (the same chaining text_oracle._xxh64_long pins
for the MinHash band digests; int-width chaining is pinned against
Spark in tests/test_pacing_parity.py). DuckDB cannot express these,
so the driver oracle for `session_pacing` is golden parquet generated
from this module (tools/gen_golden_oracles.py).

No Spark imports."""

from __future__ import annotations

import struct

from ..core.xxhash64 import xxhash64

_MASK = (1 << 64) - 1

# Independent copy of functions/stealth.USER_AGENTS (the reference's
# four rotated UAs, browser-manager.ts:106-111) — this module must not
# import pyspark; tests/test_pacing_parity.py pins the two lists equal.
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


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def chain(*vals) -> int:
    """Spark's multi-arg xxhash64(...) over typed values: ("s", str) /
    ("l", int64) / ("i", int32). Signed 64-bit result."""
    h = 42
    for kind, v in vals:
        if kind == "s":
            h = xxhash64(v.encode("utf-8"), h & _MASK)
        elif kind == "l":
            h = xxhash64(struct.pack("<Q", v & _MASK), h & _MASK)
        elif kind == "i":
            h = xxhash64(struct.pack("<i", v), h & _MASK)
        else:  # pragma: no cover - caller bug
            raise ValueError(kind)
    return _signed(h)


def _unit(*vals) -> float:
    """Twin of humanize._unit: the signed hash mapped onto [0, 1).
    Spark computes double(decimal(h + 2^63)) / 2^64; the denominator
    is a power of two (exact exponent scale), so rounding the
    numerator to double first — what float() does here too — yields
    the identical IEEE result."""
    return float(chain(*vals) + (1 << 63)) / 18446744073709551616.0


def humanize_row(session_id: str, action_index: int, action_type: str,
                 text: str | None, min_ms: int = 200, max_ms: int = 2000,
                 key_min_ms: int = 50, key_max_ms: int = 200,
                 typo_rate: float = 0.02) -> tuple[int, int]:
    """(delay_ms, type_ms) for one action — bit-exact twin of
    humanize_schedule's per-row columns (the prefix-sum start offset
    is assembled by the caller over the session's rows)."""
    sid = ("s", session_id)
    idx = ("l", action_index)
    delay = min_ms + int(_unit(sid, idx, ("s", "delay"))
                         * (max_ms - min_ms))
    type_ms = 0
    if action_type == "type" and text is not None:
        for i in range(1, len(text) + 1):
            per = key_min_ms + int(_unit(sid, idx, ("i", i), ("s", "key"))
                                   * (key_max_ms - key_min_ms))
            if _unit(sid, idx, ("i", i), ("s", "typo")) < typo_rate:
                per += 300 + int(_unit(sid, idx, ("i", i), ("s", "fix"))
                                 * 300)
            type_ms += per
    return delay, type_ms


def stealth_row(session_id: str, user_agents: list[str],
                base_w: int = 1920, base_h: int = 1080,
                jitter: int = 100) -> tuple[str, int, int]:
    """(user_agent, viewport_w, viewport_h) — twin of
    session_context's hash lanes (pmod of the signed hash ==
    Python's % on ints, always non-negative)."""
    sid = ("s", session_id)
    ua = user_agents[chain(sid, ("s", "ua")) % len(user_agents)]
    vw = base_w + chain(sid, ("s", "vw")) % jitter
    vh = base_h + chain(sid, ("s", "vh")) % jitter
    return ua, vw, vh


def session_pacing_rows(actions: list[tuple[str, int, str, str | None]],
                        user_agents: list[str]) -> list[dict]:
    """Full twin of the fused `session_pacing` driver query: input
    (session_id, action_index, action_type, text) rows in any order,
    output one dict per action with the schedule + stealth identity.
    Start offsets accumulate in action_index order per session."""
    by_sess: dict[str, list] = {}
    for sid, idx, typ, text in actions:
        by_sess.setdefault(sid, []).append((idx, typ, text))
    out = []
    for sid, rows in by_sess.items():
        ua, vw, vh = stealth_row(sid, user_agents)
        spent = 0
        for idx, typ, text in sorted(rows):
            delay, type_ms = humanize_row(sid, idx, typ, text)
            out.append({"session_id": sid, "action_index": idx,
                        "delay_ms": delay, "type_ms": type_ms,
                        "start_offset_ms": spent + delay,
                        "user_agent": ua, "viewport_w": vw,
                        "viewport_h": vh})
            spent += delay + type_ms
    return out
