"""Partitioned bloom pre-filter for the URL-seen anti-join (J1).

At 10^10 URLs the exact seen set is ~80 GB of 64-bit hashes; the
scale-critical candidate⋈seen anti-join
(/root/reference/lib/crawler/crawler-engine.ts:541 re-expressed) wants
a cheap pre-filter that kills the vast majority of already-seen
candidates BEFORE the shuffle. This module maintains per-bucket bloom
bitsets as ordinary DataFrame rows (bucket_id, bitset binary) —
"filters as data", rebuilt/merged with plain aggregations, broadcast
to prune candidates.

False positives would LOSE URLs (a candidate wrongly marked seen is
never fetched), so the bloom verdict is only ever used to SKIP the
exact anti-join for candidates the filter says are NEW (bloom has no
false negatives → "not in filter" is definitive). Candidates flagged
as possibly-seen still go through the exact anti-join. Correctness is
therefore independent of the filter (asserted in
tests/test_bloom.py: identical output with and without).

Sizing: k=4 hash probes via 4 xxhash64 seeds-by-salt; m bits per
bucket. With n keys/bucket and m = 16n bits, fpp ≈ (1-e^{-kn/m})^k
≈ 0.24% — the exact join then sees only ~0.24% of the seen-side
volume. All construction is Arrow-batched (applyInPandas per bucket,
numpy bit ops); probing is a broadcast join + native bit test on the
bitset column via a vectorized pandas UDF."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, BooleanType, IntegerType,
                               StructField, StructType)

K_PROBES = 4


def _probe_positions(hashes: np.ndarray, m_bits: int) -> list[np.ndarray]:
    """k probe positions per key from one 64-bit hash (Kirsch-
    Mitzenmacher double hashing: h1 + i*h2 mod m — public trick)."""
    h = hashes.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    return [((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)
            for i in range(K_PROBES)]


def build_bloom(seen: DataFrame, hash_col: str = "url_hash",
                n_buckets: int = 64, bits_per_bucket: int = 1 << 17
                ) -> DataFrame:
    """seen(url_hash) → bloom(bucket_id, bitset). Bucketed by
    pmod(hash, n_buckets): each bucket's bitset built independently
    (applyInPandas — parallel across buckets, numpy inside)."""
    schema = StructType([StructField("bucket_id", IntegerType()),
                         StructField("bitset", BinaryType())])
    m = bits_per_bucket

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m // 8, dtype=np.uint8)
        hs = pdf["h"].to_numpy()
        for pos in _probe_positions(hs, m):
            np.bitwise_or.at(bits, pos >> 3,
                             np.left_shift(1, (pos & 7)).astype(np.uint8))
        return pd.DataFrame({"bucket_id": [int(pdf["b"].iloc[0])],
                             "bitset": [bits.tobytes()]})

    keyed = seen.select(F.col(hash_col).alias("h"),
                        F.pmod(F.col(hash_col), F.lit(n_buckets))
                        .cast("int").alias("b"))
    return keyed.groupBy("b").applyInPandas(build, schema=schema)


def bloom_maybe_seen(cands: DataFrame, bloom: DataFrame,
                     hash_col: str = "url_hash",
                     n_buckets: int = 64,
                     bits_per_bucket: int = 1 << 17) -> DataFrame:
    """Append `maybe_seen`: False ⇒ definitively new (no bloom false
    negatives), True ⇒ must confirm via exact anti-join. Broadcast
    join on bucket_id, then an Arrow-batched membership probe."""
    m = bits_per_bucket
    withb = cands.withColumn(
        "bucket_id",
        F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int"))
    joined = withb.join(F.broadcast(bloom), "bucket_id", "left")
    schema = StructType(list(joined.schema.fields)
                        + [StructField("maybe_seen", BooleanType())])

    def probe(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = np.zeros(len(pdf), dtype=bool)
            if len(pdf):
                grouped = pdf.groupby("bucket_id", dropna=False, sort=False)
                for _, idx in grouped.groups.items():
                    sub = pdf.loc[idx]
                    bs = sub["bitset"].iloc[0]
                    if bs is None:
                        continue  # empty bucket: definitively new
                    bits = np.frombuffer(bs, dtype=np.uint8)
                    hs = sub[cands_hash_name].to_numpy()
                    hit = np.ones(len(sub), dtype=bool)
                    for pos in _probe_positions(hs, m):
                        hit &= (bits[pos >> 3] >> (pos & 7) & 1).astype(bool)
                    out[pdf.index.get_indexer(idx)] = hit
            yield pdf.assign(maybe_seen=out)

    cands_hash_name = hash_col
    return (joined.mapInPandas(probe, schema=schema)
            .drop("bitset"))


def seen_anti_join_with_bloom(cands: DataFrame, seen: DataFrame,
                              bloom: DataFrame,
                              hash_col: str = "url_hash",
                              n_buckets: int = 64,
                              bits_per_bucket: int = 1 << 17,
                              confirm_col: str | None = None) -> DataFrame:
    """The full J1 shape: bloom-certain-new rows pass straight
    through; bloom-positive rows are confirmed by the exact anti-join
    (so output == plain anti-join, cheaper by the filter's kill
    rate). Union of the two disjoint paths.

    confirm_col: column to anti-join on for the exact confirm
    (e.g. the full URL string — immune even to 64-bit hash
    collisions); defaults to hash_col."""
    cc = confirm_col or hash_col
    flagged = bloom_maybe_seen(cands, bloom, hash_col,
                               n_buckets, bits_per_bucket)
    certain_new = flagged.filter(~F.col("maybe_seen")) \
        .drop("maybe_seen", "bucket_id")
    to_confirm = flagged.filter(F.col("maybe_seen")) \
        .drop("maybe_seen", "bucket_id")
    confirmed = to_confirm.join(seen.select(cc).distinct(), cc, "left_anti")
    return certain_new.unionByName(confirmed)
