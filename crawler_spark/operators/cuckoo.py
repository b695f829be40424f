"""Partitioned cuckoo filter for the URL-seen anti-join (J1) —
the deletion-capable sibling of the bloom pre-filter
(crawler_spark.operators.bloom).

Same role as the bloom: at 10^10 URLs the exact seen set is ~80 GB of
64-bit hashes, and the candidate⋈seen anti-join
(/root/reference/lib/crawler/crawler-engine.ts:541 re-expressed)
wants a cheap pre-filter that kills already-seen candidates BEFORE
the shuffle. The cuckoo variant (Fan, Andersen, Kaminsky, Mitzenmacher,
"Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014 — public
algorithm) stores 16-bit fingerprints in 4-way buckets with two
candidate buckets per key (partial-key cuckoo hashing), which buys
what a bloom cannot: O(1) DELETION. That matters for the reference's
re-crawl surfaces (rule deletion SO5, content-diff re-fetch E11):
un-seeing a URL re-opens it for fetching without rebuilding the whole
filter.

Layout mirrors the bloom — "filters as data": one DataFrame row per
hash-partition (bucket_id, table binary, overflow binary), each
partition's table built independently in numpy via applyInPandas and
probed via a broadcast join + Arrow-batched vectorized lookup.

No-false-negative guarantee is ABSOLUTE (stronger than the paper's
"may fail at high load"): keys that cannot be placed after the
bounded eviction walk are kept verbatim in a per-partition overflow
array of 64-bit hashes, probed exactly. As with the bloom, the filter
verdict is only ever used to SKIP the exact anti-join for candidates
it says are NEW; maybe-seen candidates still confirm exactly, so
query correctness is independent of the filter (asserted in
tests/test_cuckoo.py: identical anti-join output with and without).

Sizing: 4 slots/bucket at ≤0.84 load (the paper's high-load point for
(2,4)-cuckoo), table size rounded to a power of two so the XOR
alternate-bucket map is closed. fpp ≈ 2·4/2^16 ≈ 0.012% at full load.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, BooleanType, IntegerType,
                               StructField, StructType)

SLOTS = 4            # entries per cuckoo bucket
LOAD = 0.84          # target load factor for (2,4)-cuckoo
MAX_KICKS = 500      # eviction walk bound before spilling to overflow
_FP_MULT = np.uint64(0x5BD1E9955BD1E995)  # odd multiplier for fp→bucket

_SCHEMA = StructType([StructField("bucket_id", IntegerType()),
                      StructField("table", BinaryType()),
                      StructField("overflow", BinaryType())])


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the top bits of the 64-bit
    hash (0 is the empty-slot sentinel, so fp 0 remaps)."""
    fp = ((hashes.astype(np.uint64) >> np.uint64(48))
          & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 0x9E37
    return fp


def _bucket_pair(hashes: np.ndarray, fp: np.ndarray,
                 m: int) -> tuple[np.ndarray, np.ndarray]:
    """Primary bucket from hash bits 16..47 (the low bits already
    picked the PARTITION, so reusing them would collapse every key in
    a partition onto one table bucket); alternate bucket via the
    partial-key XOR map i2 = i1 ^ H(fp), closed because m is a power
    of two."""
    mask = np.uint64(m - 1)
    i1 = ((hashes.astype(np.uint64) >> np.uint64(16)) & mask).astype(np.int64)
    hfp = ((fp.astype(np.uint64) * _FP_MULT) >> np.uint64(32)) & mask
    i2 = (i1 ^ hfp.astype(np.int64))
    return i1, i2


def _alt_bucket(bucket: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    mask = np.uint64(m - 1)
    hfp = ((fp.astype(np.uint64) * _FP_MULT) >> np.uint64(32)) & mask
    return bucket ^ hfp.astype(np.int64)


def _table_size(n_keys: int) -> int:
    """Smallest power-of-two bucket count holding n_keys at ≤LOAD."""
    need = max(1, int(np.ceil(n_keys / (SLOTS * LOAD))))
    return 1 << int(np.ceil(np.log2(need)))


def _bulk_place(table: np.ndarray, fill: np.ndarray, keys: np.ndarray,
                buckets: np.ndarray, fp: np.ndarray) -> np.ndarray:
    """Vectorized placement of keys[i] into buckets[i]: sort by
    bucket, cumcount within each bucket group, keep rows whose slot
    index fits under SLOTS given current fill. Returns the indices
    (into keys) that did NOT fit."""
    if len(keys) == 0:
        return keys
    order = np.argsort(buckets[keys], kind="stable")
    srt = keys[order]
    bs = buckets[srt]
    grp_start = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
    reps = np.diff(np.r_[grp_start, len(bs)])
    cum = np.arange(len(bs)) - np.repeat(grp_start, reps)
    slot = fill[bs] + cum
    ok = slot < SLOTS
    table[bs[ok], slot[ok]] = fp[srt[ok]]
    np.add.at(fill, bs[ok], 1)
    return srt[~ok]


def _build_table(hashes: np.ndarray) -> tuple[bytes, bytes]:
    """One partition's cuckoo table from its (deduplicated, sorted —
    determinism) 64-bit hashes. Two vectorized bulk passes (primary
    then alternate bucket) place the vast majority; the stragglers run
    the classic sequential eviction walk; walk failures spill their
    full hash to the exact overflow array."""
    hs = np.unique(hashes.astype(np.int64)).astype(np.uint64)
    m = _table_size(len(hs))
    fp = _fingerprints(hs)
    i1, i2 = _bucket_pair(hs, fp, m)
    table = np.zeros((m, SLOTS), dtype=np.uint16)
    fill = np.zeros(m, dtype=np.int64)
    rest = _bulk_place(table, fill, np.arange(len(hs)), i1, fp)
    rest = _bulk_place(table, fill, rest, i2, fp)
    overflow = []
    for k in rest:                      # tiny tail by construction
        cur_fp = fp[k]
        b = int(i1[k])
        placed = False
        undo: list[tuple[int, int, np.uint16]] = []
        for kick in range(MAX_KICKS):
            if fill[b] < SLOTS:
                table[b, fill[b]] = cur_fp
                fill[b] += 1
                placed = True
                break
            victim_slot = kick % SLOTS  # deterministic eviction
            undo.append((b, victim_slot, cur_fp))
            cur_fp, table[b, victim_slot] = table[b, victim_slot], cur_fp
            b = int(_alt_bucket(np.array([b]), np.array([cur_fp],
                                                        dtype=np.uint16),
                                m)[0])
        if not placed:
            # the walk ends with a displaced RESIDENT's fp homeless —
            # leaving it out would be a false negative on that
            # resident. Unwind every swap (restores the table exactly)
            # and spill the ORIGINAL key's full hash to the exact
            # overflow instead. Each slot currently holds the fp
            # written at that step; its displaced resident is the fp
            # written at the NEXT step (the homeless fp for the last).
            prev = cur_fp
            for ub, us, written in reversed(undo):
                table[ub, us] = prev
                prev = written
            overflow.append(hs[k])
    ov = np.array(sorted(overflow), dtype=np.uint64) if overflow \
        else np.empty(0, dtype=np.uint64)
    return table.tobytes(), ov.tobytes()


def build_cuckoo(seen: DataFrame, hash_col: str = "url_hash",
                 n_buckets: int = 64) -> DataFrame:
    """seen(url_hash) → cuckoo(bucket_id, table, overflow). Bucketed
    by pmod(hash, n_buckets); each partition's table built
    independently (applyInPandas — parallel across partitions, numpy
    inside). Table size adapts to the partition's key count."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        tb, ov = _build_table(pdf["h"].to_numpy())
        return pd.DataFrame({"bucket_id": [int(pdf["b"].iloc[0])],
                             "table": [tb], "overflow": [ov]})

    keyed = seen.select(F.col(hash_col).alias("h"),
                        F.pmod(F.col(hash_col), F.lit(n_buckets))
                        .cast("int").alias("b"))
    return keyed.groupBy("b").applyInPandas(build, schema=_SCHEMA)


def _probe_np(table_bytes: bytes, overflow_bytes: bytes,
              hashes: np.ndarray) -> np.ndarray:
    """Vectorized membership: fp present in either candidate bucket,
    or the full hash in the exact overflow array."""
    table = np.frombuffer(table_bytes, dtype=np.uint16).reshape(-1, SLOTS)
    m = table.shape[0]
    hs = hashes.astype(np.int64).astype(np.uint64)
    fp = _fingerprints(hs)
    i1, i2 = _bucket_pair(hs, fp, m)
    hit = ((table[i1] == fp[:, None]).any(axis=1)
           | (table[i2] == fp[:, None]).any(axis=1))
    ov = np.frombuffer(overflow_bytes, dtype=np.uint64)
    if len(ov):
        hit |= np.isin(hs, ov)
    return hit


def cuckoo_maybe_seen(cands: DataFrame, cuckoo: DataFrame,
                      hash_col: str = "url_hash",
                      n_buckets: int = 64) -> DataFrame:
    """Append `maybe_seen`: False ⇒ definitively new (placement never
    drops a key: every insert lands in the table or the exact
    overflow), True ⇒ must confirm via exact anti-join. Broadcast
    join on bucket_id, Arrow-batched probe."""
    withb = cands.withColumn(
        "bucket_id",
        F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int"))
    joined = withb.join(F.broadcast(cuckoo), "bucket_id", "left")
    schema = StructType(list(joined.schema.fields)
                        + [StructField("maybe_seen", BooleanType())])

    def probe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = np.zeros(len(pdf), dtype=bool)
            if len(pdf):
                grouped = pdf.groupby("bucket_id", dropna=False, sort=False)
                for _, idx in grouped.groups.items():
                    sub = pdf.loc[idx]
                    tb = sub["table"].iloc[0]
                    if tb is None:
                        continue  # partition absent: definitively new
                    hit = _probe_np(tb, sub["overflow"].iloc[0],
                                    sub[hash_col].to_numpy())
                    out[pdf.index.get_indexer(idx)] = hit
            yield pdf.assign(maybe_seen=out)

    return (joined.mapInPandas(probe, schema=schema)
            .drop("table", "overflow"))


def cuckoo_remove(cuckoo: DataFrame, removed: DataFrame,
                  hash_col: str = "url_hash",
                  n_buckets: int = 64) -> DataFrame:
    """Delete keys from the filter — the operation blooms cannot do
    (shared bits). Per partition: drop ONE stored fingerprint from
    the key's primary-else-alternate bucket, or its exact hash from
    the overflow. After removal the key probes definitively-new again
    (unless another resident shares its fp+bucket — a false POSITIVE,
    the safe direction). Cogrouped applyInPandas: filter rows and
    delete keys meet on bucket_id; untouched partitions pass through."""

    keyed = removed.select(F.col(hash_col).alias("h"),
                           F.pmod(F.col(hash_col), F.lit(n_buckets))
                           .cast("int").alias("bucket_id"))

    def apply_deletes(filt: pd.DataFrame, dels: pd.DataFrame
                      ) -> pd.DataFrame:
        if filt.empty:
            return filt.iloc[0:0]
        if dels.empty:
            return filt[["bucket_id", "table", "overflow"]]
        table = np.frombuffer(filt["table"].iloc[0],
                              dtype=np.uint16).reshape(-1, SLOTS).copy()
        ov = list(np.frombuffer(filt["overflow"].iloc[0], dtype=np.uint64))
        m = table.shape[0]
        hs = np.unique(dels["h"].to_numpy().astype(np.int64)) \
            .astype(np.uint64)
        fp = _fingerprints(hs)
        i1, i2 = _bucket_pair(hs, fp, m)
        for k in range(len(hs)):
            if hs[k] in ov:
                ov.remove(hs[k])
                continue
            for b in (int(i1[k]), int(i2[k])):
                slots = np.flatnonzero(table[b] == fp[k])
                if len(slots):
                    table[b, slots[0]] = 0
                    break
        ovb = np.array(sorted(ov), dtype=np.uint64).tobytes()
        return pd.DataFrame({"bucket_id": [int(filt["bucket_id"].iloc[0])],
                             "table": [table.tobytes()],
                             "overflow": [ovb]})

    return (cuckoo.groupBy("bucket_id")
            .cogroup(keyed.groupBy("bucket_id"))
            .applyInPandas(lambda f, d: apply_deletes(f, d),
                           schema=_SCHEMA))


def seen_anti_join_with_cuckoo(cands: DataFrame, seen: DataFrame,
                               cuckoo: DataFrame,
                               hash_col: str = "url_hash",
                               n_buckets: int = 64,
                               confirm_col: str | None = None) -> DataFrame:
    """The full J1 shape, same contract as
    bloom.seen_anti_join_with_bloom: filter-certain-new rows pass
    straight through; filter-positive rows are confirmed by the exact
    anti-join (output == plain anti-join, cheaper by the kill rate).

    confirm_col: column for the exact confirm (e.g. the full URL
    string — immune even to 64-bit hash collisions); defaults to
    hash_col."""
    cc = confirm_col or hash_col
    flagged = cuckoo_maybe_seen(cands, cuckoo, hash_col, n_buckets)
    certain_new = flagged.filter(~F.col("maybe_seen")) \
        .drop("maybe_seen", "bucket_id")
    to_confirm = flagged.filter(F.col("maybe_seen")) \
        .drop("maybe_seen", "bucket_id")
    confirmed = to_confirm.join(seen.select(cc).distinct(), cc, "left_anti")
    return certain_new.unionByName(confirmed)
