"""Cuckoo-filter invariants (the deletion-capable J1 pre-filter,
operators/cuckoo.py): no false negatives, the cuckoo-accelerated
anti-join returns EXACTLY the plain anti-join's rows, the filter
kills most new candidates' exact-join work (measured fpp), and —
the property blooms cannot offer — deleted keys probe
definitively-new again while every remaining key stays covered.
Numpy-level tests pin the eviction walk and the overflow unwind."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from crawler_spark.operators.cuckoo import (SLOTS, _build_table,
                                            _bucket_pair, _fingerprints,
                                            _probe_np, build_cuckoo,
                                            cuckoo_maybe_seen, cuckoo_remove,
                                            seen_anti_join_with_cuckoo)


def _dfs(spark):
    seen = spark.range(0, 5000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    cands = spark.range(2500, 7500).select(
        F.col("id").alias("cand_id"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    return seen, cands


def test_no_false_negatives(spark):
    seen, _ = _dfs(spark)
    cf = build_cuckoo(seen)
    flagged = cuckoo_maybe_seen(seen.select("url_hash"), cf)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0


def test_cuckoo_antijoin_exact_equivalence(spark):
    seen, cands = _dfs(spark)
    cf = build_cuckoo(seen)
    with_cf = seen_anti_join_with_cuckoo(cands, seen, cf)
    plain = cands.join(seen.select("url_hash").distinct(),
                       "url_hash", "left_anti")
    got = {r["cand_id"] for r in with_cf.collect()}
    exp = {r["cand_id"] for r in plain.collect()}
    assert got == exp
    assert got == set(range(5000, 7500))


def test_cuckoo_fpp(spark):
    """16-bit fingerprints in 4-way buckets: fpp ≈ 8/2^16 ≈ 0.01% —
    two orders tighter than the bloom's 0.24% at the same build."""
    seen, cands = _dfs(spark)
    cf = build_cuckoo(seen)
    new_cands = cands.filter(F.col("cand_id") >= 5000)
    flagged = cuckoo_maybe_seen(new_cands, cf)
    n = new_cands.count()
    fp = flagged.filter(F.col("maybe_seen")).count()
    assert fp / n < 0.01, f"fpp {fp / n:.4f}"


def test_cuckoo_delete(spark):
    """Deleted keys probe definitively-new; every surviving key still
    probes maybe-seen (no collateral false negatives); the anti-join
    over the shrunken seen set stays exact with the shrunken filter."""
    seen, cands = _dfs(spark)
    gone = seen.filter(F.pmod("url_hash", F.lit(2)) == 0)
    kept = seen.filter(F.pmod("url_hash", F.lit(2)) != 0)
    cf2 = cuckoo_remove(build_cuckoo(seen), gone)
    # surviving keys: still zero false negatives
    fk = cuckoo_maybe_seen(kept.select("url_hash"), cf2)
    assert fk.filter(~F.col("maybe_seen")).count() == 0
    # deleted keys: (near-)all definitively new again — allow the
    # same-fp-same-bucket false-positive residue, the safe direction
    fg = cuckoo_maybe_seen(gone.select("url_hash"), cf2)
    n_gone = gone.count()
    still = fg.filter(F.col("maybe_seen")).count()
    assert still / n_gone < 0.01, f"{still}/{n_gone} survived deletion"
    # end-to-end: anti-join vs the kept set matches plain
    with_cf = seen_anti_join_with_cuckoo(cands, kept, cf2)
    plain = cands.join(kept.select("url_hash").distinct(),
                       "url_hash", "left_anti")
    assert ({r["cand_id"] for r in with_cf.collect()}
            == {r["cand_id"] for r in plain.collect()})


def test_build_table_numpy_membership_exact():
    """Pure-numpy: every inserted key probes present; the table is
    deterministic for a given key set (input order irrelevant)."""
    rng = np.random.default_rng(7)
    hs = rng.integers(-(2 ** 63), 2 ** 63 - 1, size=4096, dtype=np.int64)
    t1, o1 = _build_table(hs)
    t2, o2 = _build_table(hs[::-1].copy())
    assert t1 == t2 and o1 == o2
    assert _probe_np(t1, o1, hs).all()


def test_overflow_unwind_keeps_residents():
    """Force eviction-walk failures by overfilling: ~4x more keys than
    the table sized for (we size for the FIRST build, then probe a
    hand-built overfull one). Build at natural size, then rebuild the
    same keys with a tiny forced table via monkeypatched sizing."""
    import crawler_spark.operators.cuckoo as cz
    rng = np.random.default_rng(11)
    hs = rng.integers(-(2 ** 63), 2 ** 63 - 1, size=2000, dtype=np.int64)
    orig = cz._table_size
    try:
        cz._table_size = lambda n: 64  # 64*4=256 slots for 2000 keys
        tb, ov = cz._build_table(hs)
    finally:
        cz._table_size = orig
    n_over = len(np.frombuffer(ov, dtype=np.uint64))
    assert n_over >= 2000 - 64 * SLOTS  # most keys must spill
    # the absolute guarantee: EVERY key still probes present
    assert cz._probe_np(tb, ov, hs).all()


def test_alt_bucket_closure():
    """Partial-key hashing closure: sharing fp + sharing one bucket
    forces sharing BOTH buckets — the property that makes deletion
    collateral-safe (removing one copy can only strip a true
    duplicate of the same (fp, pair))."""
    rng = np.random.default_rng(3)
    hs = rng.integers(-(2 ** 63), 2 ** 63 - 1, size=512,
                      dtype=np.int64).astype(np.uint64)
    fp = _fingerprints(hs)
    m = 256
    i1, i2 = _bucket_pair(hs, fp, m)
    # alt(alt(b)) == b via the XOR map
    i1_back, _ = _bucket_pair(hs, fp, m)
    assert (i1_back == i1).all()
    from crawler_spark.operators.cuckoo import _alt_bucket
    assert (_alt_bucket(_alt_bucket(i1, fp, m), fp, m) == i1).all()
    assert (_alt_bucket(i1, fp, m) == i2).all()
