"""Bloom pre-filter invariants (FIXTURES.md inv. 2 / SURVEY §7.1-6):
no false negatives (a seen key is always flagged maybe_seen), the
bloom-accelerated anti-join returns EXACTLY the plain anti-join's
rows, and the filter actually kills most seen candidates before the
exact join (measured kill rate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.operators.bloom import (bloom_maybe_seen, build_bloom,
                                           seen_anti_join_with_bloom)


def _dfs(spark):
    seen = spark.range(0, 5000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    # candidates: half overlap the seen set, half are new
    cands = spark.range(2500, 7500).select(
        F.col("id").alias("cand_id"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
    return seen, cands


def test_no_false_negatives(spark):
    seen, _ = _dfs(spark)
    bloom = build_bloom(seen)
    flagged = bloom_maybe_seen(seen.select("url_hash"), bloom)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_antijoin_exact_equivalence(spark):
    seen, cands = _dfs(spark)
    bloom = build_bloom(seen)
    with_bloom = seen_anti_join_with_bloom(cands, seen, bloom)
    plain = cands.join(seen.select("url_hash").distinct(),
                       "url_hash", "left_anti")
    got = {r["cand_id"] for r in with_bloom.collect()}
    exp = {r["cand_id"] for r in plain.collect()}
    assert got == exp
    assert got == set(range(5000, 7500))


def test_bloom_kill_rate(spark):
    """The point of the filter: most NEW candidates skip the exact
    join. With m=16n the fpp is well under 5%."""
    seen, cands = _dfs(spark)
    bloom = build_bloom(seen)
    new_cands = cands.filter(F.col("cand_id") >= 5000)
    flagged = bloom_maybe_seen(new_cands, bloom)
    n = new_cands.count()
    fp = flagged.filter(F.col("maybe_seen")).count()
    assert fp / n < 0.05, f"fpp {fp / n:.3f}"
