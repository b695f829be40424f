"""Golden crawl parity: the Spark engine (parallel explore + DFS-claim
resolve) must reproduce the sequential oracle simulator row-for-row —
visit order, priorities, depths, parents, statuses, politeness batch
schedule, URL-seen set, error rows, and image+caption refs
(FIXTURES.md invariants 1-3; reference semantics cited in
crawler_spark/oracle/simulator.py)."""

from __future__ import annotations

import pytest

from crawler_spark.engine.config import CrawlConfig
from crawler_spark.engine.frontier import FrontierEngine, fresh_ckpt
from crawler_spark.oracle.simulator import run_oracle

FIXDIR = "fixtures/t-smoke"

CONFIGS = {
    "default_d3": CrawlConfig(max_depth=3),
    "restricted_d5": CrawlConfig(max_depth=5, restrict_domains=True),
    "sample_anchors_d4": CrawlConfig(max_depth=4, sample_mode=True,
                                     follow_link_tags=("a",)),
}


def _visit_tuple_engine(r):
    return (r["visit_rank"], r["url"], r["url_hash"], r["host"], r["depth"],
            r["parent_url"], r["link_index"], r["prio"], r["status_code"],
            r["batch_id"])


def _visit_tuple_oracle(v):
    return (v.rank, v.url, v.url_hash, v.host, v.depth, v.parent_url,
            v.link_index, v.prio, v.status_code, v.batch_id)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_engine_matches_oracle(spark, tmp_path, name):
    cfg = CONFIGS[name]
    eng = FrontierEngine(spark, cfg, FIXDIR, fresh_ckpt(str(tmp_path / name)))
    visits = eng.run().cache()

    got = [_visit_tuple_engine(r) for r in visits.orderBy("visit_rank").collect()]
    oracle = run_oracle(FIXDIR, cfg)
    exp = [_visit_tuple_oracle(v) for v in oracle.visits]
    assert got == exp  # full row-wise crawl-order + attribution match

    # URL-seen set (invariant 2)
    seen = {r["url"] for r in visits.select("url").collect()}
    assert seen == oracle.seen

    # error rows (E9 categorization over visited pages)
    errs = {(r["url"], r["error_type"])
            for r in eng.errors(visits).collect()}
    assert errs == {(e["url"], e["error_type"]) for e in oracle.errors}

    # image+caption refs of visited pages (E3)
    refs = {(r["page_url"], r["src"], r["caption"])
            for r in eng.image_refs(visits).collect()}
    assert refs == {(i["page_url"], i["src"], i["caption"])
                    for i in oracle.images}
    visits.unpersist()


def test_fixpoint_matches_skeleton(spark, tmp_path):
    """The two resolution strategies — distributed Jacobi fixpoint and
    skeleton heap sweep — produce identical claims."""
    cfg = CrawlConfig(max_depth=3)
    eng = FrontierEngine(spark, cfg, FIXDIR, fresh_ckpt(str(tmp_path / "xs")))
    eng.explore()
    a = {(r["url"], r["prio"], r["depth"], r["parent_url"], r["link_index"])
         for r in eng.resolve(strategy="skeleton").collect()}
    b = {(r["url"], r["prio"], r["depth"], r["parent_url"], r["link_index"])
         for r in eng.resolve(strategy="fixpoint").collect()}
    assert a == b


def test_resume_mid_crawl(spark, tmp_path):
    """Kill after 2 explore rounds, resume in a new engine instance →
    outputs identical to an uninterrupted run (FIXTURES.md inv. 6)."""
    cfg = CrawlConfig(max_depth=3)
    ck = fresh_ckpt(str(tmp_path / "resume"))
    eng1 = FrontierEngine(spark, cfg, FIXDIR, ck)
    eng1.explore(max_rounds=2)
    assert not eng1._state()["done"]

    eng2 = FrontierEngine(spark, cfg, FIXDIR, ck)  # fresh instance
    visits = eng2.run()
    got = [_visit_tuple_engine(r) for r in visits.orderBy("visit_rank").collect()]
    exp = [_visit_tuple_oracle(v) for v in run_oracle(FIXDIR, cfg).visits]
    assert got == exp


def test_bloom_prefilter_identical_seen_set(spark, tmp_path):
    """FIXTURES.md inv. 2: identical crawl outputs with and without
    the bloom pre-filter on the frontier anti-join."""
    cfg = CrawlConfig(max_depth=3)
    eng = FrontierEngine(spark, cfg, FIXDIR,
                         fresh_ckpt(str(tmp_path / "bloom")), use_bloom=True)
    visits = eng.run()
    got = [_visit_tuple_engine(r) for r in visits.orderBy("visit_rank").collect()]
    exp = [_visit_tuple_oracle(v) for v in run_oracle(FIXDIR, cfg).visits]
    assert got == exp


def test_politeness_enforcement(spark, tmp_path):
    """With enforce_politeness=True every explore round starts at most
    host_cap(host) fetches per host (W5/P1 upgraded per-host), and the
    final outputs still match the oracle exactly."""
    import json
    import os

    from pyspark.sql import functions as F

    cfg = CrawlConfig(max_depth=2, rate_limit=6)
    ck = fresh_ckpt(str(tmp_path / "polite"))
    eng = FrontierEngine(spark, cfg, FIXDIR, ck, enforce_politeness=True)
    visits = eng.run()

    robots = {r["host"]: r["crawl_delay_ms"]
              for r in eng.robots.select("host", "crawl_delay_ms").collect()}
    fetched = spark.read.parquet(os.path.join(ck, "fetched"))
    per_round = (fetched.groupBy("round", "host").agg(F.count("*").alias("n"))
                 .collect())
    for r in per_round:
        cap = cfg.host_cap(robots.get(r["host"], 0))
        assert r["n"] <= cap, (r["host"], r["round"], r["n"], cap)

    got = [_visit_tuple_engine(x) for x in visits.orderBy("visit_rank").collect()]
    exp = [_visit_tuple_oracle(v) for v in run_oracle(FIXDIR, cfg).visits]
    assert got == exp

    # per-round metrics + per-partition lineage were checkpointed
    with open(os.path.join(ck, "metrics.jsonl")) as f:
        rounds = [json.loads(line) for line in f]
    assert len(rounds) >= 2
    assert all({"round", "scheduled", "edges", "partitions"} <= set(m)
               for m in rounds)
