"""Pure-Python xxHash64 (public algorithm by Yann Collet, BSD).

Implemented from the public xxHash specification so the single-threaded
oracle simulator can compute the exact same 64-bit URL keys as Spark's
built-in ``F.xxhash64``: for a single non-null STRING column Spark
computes ``XXH64(utf8_bytes, seed=42)`` (seed 42 is Spark's default for
hash expressions). Verified against Spark in
``tests/test_hash_parity.py``.

This runs only in fixture generation and golden replay — the engine's
hot path uses the JVM-side ``F.xxhash64`` column expression.
"""

from __future__ import annotations

MASK64 = 0xFFFFFFFFFFFFFFFF

PRIME1 = 0x9E3779B185EBCA87
PRIME2 = 0xC2B2AE3D27D4EB4F
PRIME3 = 0x165667B19E3779F9
PRIME4 = 0x85EBCA77C2B2AE63
PRIME5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * PRIME2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * PRIME1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * PRIME1) + PRIME4) & MASK64


def xxhash64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of *data* with *seed*; returns unsigned 64-bit int."""
    n = len(data)
    idx = 0
    if n >= 32:
        v1 = (seed + PRIME1 + PRIME2) & MASK64
        v2 = (seed + PRIME2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - PRIME1) & MASK64
        limit = n - 32
        while idx <= limit:
            v1 = _round(v1, int.from_bytes(data[idx : idx + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[idx + 8 : idx + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[idx + 16 : idx + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[idx + 24 : idx + 32], "little"))
            idx += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + PRIME5) & MASK64
    h = (h + n) & MASK64
    while idx + 8 <= n:
        k1 = _round(0, int.from_bytes(data[idx : idx + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * PRIME1 + PRIME4) & MASK64
        idx += 8
    if idx + 4 <= n:
        h ^= (int.from_bytes(data[idx : idx + 4], "little") * PRIME1) & MASK64
        h = (_rotl(h, 23) * PRIME2 + PRIME3) & MASK64
        idx += 4
    while idx < n:
        h ^= (data[idx] * PRIME5) & MASK64
        h = (_rotl(h, 11) * PRIME1) & MASK64
        idx += 1
    h ^= h >> 33
    h = (h * PRIME2) & MASK64
    h ^= h >> 29
    h = (h * PRIME3) & MASK64
    h ^= h >> 32
    return h


def spark_xxhash64_str(s: str) -> int:
    """Signed 64-bit value equal to Spark's ``xxhash64(string_col)``."""
    u = xxhash64(s.encode("utf-8"), SPARK_SEED)
    return u - (1 << 64) if u >= (1 << 63) else u
