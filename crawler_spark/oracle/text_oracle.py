"""Pure-Python oracle replicas of the hash-seeded text operators
(MinHash, SimHash, winnowing) that DuckDB cannot reproduce (they
depend on Spark's xxhash64 seed-42 semantics). Shares the bit-exact
pure-Python XXH64 (crawler_spark.core.xxhash64) with the fixture
generator, so tests/test_dedup_text.py can assert Spark ↔ Python
equality of every signature and fingerprint.

No Spark imports."""

from __future__ import annotations

import re
import struct

from ..core.xxhash64 import spark_xxhash64_str, xxhash64

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def tokens(text: str, distinct: bool = True) -> list[str]:
    toks = [t for t in _TOKEN_RE.split(text.lower()) if t]
    if distinct:
        seen, out = set(), []
        for t in toks:
            if t not in seen:
                seen.add(t)
                out.append(t)
        return out
    return toks


def ngrams(text: str, n: int = 3) -> list[str]:
    toks = tokens(text, distinct=False)
    if len(toks) < n:
        return []
    grams = ["_".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    seen, out = set(), []
    for g in grams:
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def _xxh64_long(v: int, seed: int) -> int:
    """Spark's xxhash64 over one long argument with *seed*: XXH64 of
    the value's 8-byte little-endian representation (verified equal to
    Spark's XxHash64Function.hashLong chaining). Signed in, signed out
    — matching Spark long semantics."""
    if v >= 1 << 63:
        v -= 1 << 64
    u = xxhash64(struct.pack("<q", v), seed & ((1 << 64) - 1))
    return u - (1 << 64) if u >= 1 << 63 else u


def minhash_signature(text: str, num_hashes: int = 64, n: int = 3) -> list[int]:
    """Twin of operators/dedup.py:minhash_signatures — each gram is
    xxhash64'd once; lane i rehashes that long chained with i, exactly
    Spark's multi-arg xxhash64(h, i)."""
    hs = [spark_xxhash64_str(g) for g in ngrams(text, n)]
    return [min(_xxh64_long(i, _xxh64_long(h, 42)) for h in hs)
            for i in range(num_hashes)]


def band_digest(values: list[int]) -> int:
    """Twin of the minhash_lsh_pairs band digest — Spark's multi-arg
    xxhash64 over the band's signature longs: seed-42 hashLong
    chaining across the arguments."""
    h = 42
    for v in values:
        h = _xxh64_long(v, h)
    return h


def simhash(text: str) -> int:
    votes = [0] * 64
    for t in tokens(text, distinct=True):
        h = spark_xxhash64_str(t) & 0xFFFFFFFFFFFFFFFF
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(64):
        if votes[i] > 0:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out


def winnow(text: str, k: int = 5, window: int = 8) -> list[int]:
    toks = tokens(text, distinct=False)
    if len(toks) < k:
        return []
    kh = [spark_xxhash64_str("_".join(toks[i:i + k]))
          for i in range(len(toks) - k + 1)]
    if len(kh) < window:
        mins = kh
    else:
        mins = [min(kh[i:i + window]) for i in range(len(kh) - window + 1)]
    return sorted(set(mins))


def jaccard(a: list[str], b: list[str]) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)
