"""Golden crawl parity: the Spark engine (parallel explore + DFS-claim
resolve) must reproduce the sequential oracle simulator row-for-row —
visit order, priorities, depths, parents, statuses, politeness batch
schedule, URL-seen set, error rows, and image+caption refs
(FIXTURES.md invariants 1-3; reference semantics cited in
crawler_spark/oracle/simulator.py)."""

from __future__ import annotations

import os

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

    # error rows (E9 categorization + P5 CrawlError shape)
    err_rows = eng.errors(visits).collect()
    errs = {(r["url"], r["error_type"]) for r in err_rows}
    assert errs == {(e["url"], e["error_type"]) for e in oracle.errors}
    # P5: reference records retry_attempts: 0 on every failure
    # (crawler-engine.ts:710) and a non-empty message
    assert all(r["retry_attempts"] == 0 and r["error_message"]
               for r in err_rows)

    # image+caption refs of visited pages (E3)
    refs = {(r["page_url"], r["src"], r["caption"])
            for r in eng.image_refs(visits).collect()}
    assert refs == {(i["page_url"], i["src"], i["caption"])
                    for i in oracle.images}
    visits.unpersist()


def test_html_mode_matches_oracle(spark, tmp_path):
    """Raw-HTML fetch mode: a web table carrying an `html` payload
    instead of pre-parsed structs flips the engine to run the E1
    HTML-parse stage inside its fetch path — and the crawl still
    reproduces the sequential oracle row-for-row, closing the gap
    between the contract's parse queries and the engine loop."""
    from crawler_spark.sources.fixtures import write_html_web
    hdir = str(tmp_path / "html-fix")
    os.makedirs(hdir)
    write_html_web(spark, FIXDIR, os.path.join(hdir, "web_pages.parquet"))
    for f in ("seeds.parquet", "robots.parquet"):
        os.symlink(os.path.abspath(os.path.join(FIXDIR, f)),
                   os.path.join(hdir, f))
    cfg = CrawlConfig(max_depth=3)
    eng = FrontierEngine(spark, cfg, hdir, fresh_ckpt(str(tmp_path / "hck")))
    assert eng.parse_from_html
    visits = eng.run().cache()
    got = [_visit_tuple_engine(r)
           for r in visits.orderBy("visit_rank").collect()]
    oracle = run_oracle(FIXDIR, cfg)
    assert got == [_visit_tuple_oracle(v) for v in oracle.visits]
    # image+caption refs derive from PARSED <img> tags in this mode
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
    fix = eng.resolve(strategy="fixpoint")
    b = {(r["url"], r["prio"], r["depth"], r["parent_url"], r["link_index"])
         for r in fix.collect()}
    assert a == b

    # certified-finalized prefixes: each round's record must equal the
    # CONVERGED claims filtered to prio < minp — count AND checksum —
    # i.e. the prefix the engine certified mid-convergence really was
    # final. Prefix sizes are nondecreasing and end at the full set.
    from pyspark.sql import functions as F
    final = fix.select("url", "prio").cache()
    total = final.count()
    ns = [c["n"] for c in eng.resolve_certified]
    assert ns == sorted(ns) and ns[-1] == total
    assert len(eng.resolve_certified) == eng.last_resolve_iters
    for rec in eng.resolve_certified:
        pred = (F.lit(True) if rec["minp"] is None
                else F.col("prio") < rec["minp"])
        row = (final.filter(pred)
               .agg(F.count("*").alias("n"),
                    F.coalesce(F.bit_xor(F.xxhash64("url", "prio")), F.lit(0)).alias("chk")).collect()[0])
        assert (int(row["n"]), int(row["chk"])) == (rec["n"], rec["chk"])
    final.unpersist()


def test_sharded_matches_skeleton_and_oracle(spark, tmp_path):
    """strategy='sharded' (seed-branch-paged out-of-core sweep with
    claim state carried across shards) reproduces strategy='skeleton'
    — and the sequential oracle — ROW-FOR-ROW including visit_rank,
    prio and batch_id, at several shard widths (1 shard ≡ global
    sweep; n_shards > n_seeds clamps)."""
    cfg = CrawlConfig(max_depth=3)
    eng = FrontierEngine(spark, cfg, FIXDIR, fresh_ckpt(str(tmp_path / "sh")))
    eng.explore()
    base = [_visit_tuple_engine(r) for r in
            eng.resolve(strategy="skeleton")
            .orderBy("visit_rank").collect()]
    exp = [_visit_tuple_oracle(v) for v in run_oracle(FIXDIR, cfg).visits]
    assert base == exp
    for n_shards in (1, 2, 5, 999):
        got = [_visit_tuple_engine(r) for r in
               eng.resolve(strategy="sharded", n_shards=n_shards)
               .orderBy("visit_rank").collect()]
        assert got == base, f"n_shards={n_shards}"
        assert eng.timings["shard_sweeps"]


def test_sharded_multiword_masks(spark, tmp_path):
    """>64 shards forces the second bitmask word (W=2) in the shard
    labeling BFS — t-smoke has 4 seeds, so this needs a synthetic web
    with enough seeds. 80 shards over 80 seeds must reproduce the
    single-word global sweep row-for-row."""
    from crawler_spark.sources.synth_web import generate_bench_web

    web = str(tmp_path / "web80")
    generate_bench_web(web, 3000, n_hosts=20, n_seeds=80)
    cfg = CrawlConfig(max_depth=3, rate_limit=10_000)
    eng = FrontierEngine(spark, cfg, web, fresh_ckpt(str(tmp_path / "mw")))
    eng.explore()
    base = [_visit_tuple_engine(r) for r in
            eng.resolve(strategy="skeleton")
            .orderBy("visit_rank").collect()]
    got = [_visit_tuple_engine(r) for r in
           eng.resolve(strategy="sharded", n_shards=80)
           .orderBy("visit_rank").collect()]
    assert got == base
    assert len(eng.timings["shard_sweeps"]) == 80


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


def test_cuckoo_prefilter_identical_seen_set(spark, tmp_path):
    """Same invariant for the deletion-capable cuckoo variant
    (operators/cuckoo.py), politeness ON so the depth-correcting
    admit path runs through the filter too."""
    cfg = CrawlConfig(max_depth=3)
    eng = FrontierEngine(spark, cfg, FIXDIR,
                         fresh_ckpt(str(tmp_path / "cuckoo")),
                         enforce_politeness=True, use_cuckoo=True)
    visits = eng.run()
    got = [_visit_tuple_engine(r) for r in visits.orderBy("visit_rank").collect()]
    # politeness changes ROUND placement, never the resolved DFS
    # order, so the plain oracle is still the expectation
    exp = [_visit_tuple_oracle(v) for v in run_oracle(FIXDIR, cfg).visits]
    assert got == exp


def _write_depth_trap_fixture(path: str) -> None:
    """Minimal web where politeness deferral admits a URL at a
    NON-minimal depth: the hot.test queue (cap 1/round) defers `zz`
    (the depth-1 parent of `c`) for three rounds while the side.test
    chain p1→p2→p3 reaches `c` at depth 4 first. Without the
    depth-correcting admit, `c` is frozen at depth 4 == max_depth, its
    child `d` is rejected by the depth cap and never fetched, and the
    DFS resolve then claims `d` via zz→c→d at depth 3 with a bogus 404
    and loses `e` (depth 4) entirely."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)

    def link(i, href):
        return dict(href=href, label=f"l{i}", selector=f"a.l{i}",
                    element_type="a", pos_x=0, pos_y=0, link_index=i)

    def page(url, hrefs):
        host = url.split("/")[2]
        return dict(url=url, host=host, status_code=200,
                    title=f"T {url}", meta_description="", text_content="",
                    headings=[], links=[link(i, h)
                                        for i, h in enumerate(hrefs)],
                    images=[], forms=[], load_time_ms=10)

    pages = [
        page("http://seed.test/s0",
             ["http://hot.test/a1", "http://hot.test/a2",
              "http://hot.test/a3", "http://hot.test/zz",
              "http://side.test/p1"]),
        page("http://hot.test/a1", []),
        page("http://hot.test/a2", []),
        page("http://hot.test/a3", []),
        page("http://hot.test/zz", ["http://x.test/c"]),
        page("http://side.test/p1", ["http://side.test/p2"]),
        page("http://side.test/p2", ["http://side.test/p3"]),
        page("http://side.test/p3", ["http://x.test/c"]),
        page("http://x.test/c", ["http://y.test/d"]),
        page("http://y.test/d", ["http://z.test/e"]),
        page("http://z.test/e", []),
    ]
    link_t = pa.list_(pa.struct([
        ("href", pa.string()), ("label", pa.string()),
        ("selector", pa.string()), ("element_type", pa.string()),
        ("pos_x", pa.int32()), ("pos_y", pa.int32()),
        ("link_index", pa.int32())]))
    img_t = pa.list_(pa.struct([("src", pa.string()),
                                ("alt", pa.string())]))
    form_t = pa.list_(pa.struct([
        ("action", pa.string()), ("method", pa.string()),
        ("fields", pa.list_(pa.string()))]))
    cols = {k: [p[k] for p in pages] for k in pages[0]}
    tbl = pa.table({
        "url": cols["url"], "host": cols["host"],
        "status_code": pa.array(cols["status_code"], pa.int32()),
        "title": cols["title"],
        "meta_description": cols["meta_description"],
        "text_content": cols["text_content"],
        "headings": pa.array(cols["headings"], pa.list_(pa.string())),
        "links": pa.array(cols["links"], link_t),
        "images": pa.array(cols["images"], img_t),
        "forms": pa.array(cols["forms"], form_t),
        "load_time_ms": pa.array(cols["load_time_ms"], pa.int32()),
    })
    pq.write_table(tbl, os.path.join(path, "web_pages.parquet"))
    hosts = sorted({p["host"] for p in pages})
    pq.write_table(pa.table({
        "host": hosts,
        "disallow_prefixes": pa.array([[]] * len(hosts),
                                      pa.list_(pa.string())),
        "crawl_delay_ms": pa.array([0] * len(hosts), pa.int64()),
    }), os.path.join(path, "robots.parquet"))
    pq.write_table(pa.table({
        "url": ["http://seed.test/s0"],
        "seed_rank": pa.array([0], pa.int32()),
    }), os.path.join(path, "seeds.parquet"))


def test_politeness_depth_correction(spark, tmp_path):
    """Regression: deferred shallow parents must not freeze a URL at an
    inflated depth (subtree truncation at the max_depth cap). The
    engine with politeness ON must still match the oracle exactly."""
    fix = str(tmp_path / "trap-fixture")
    _write_depth_trap_fixture(fix)
    cfg = CrawlConfig(max_depth=4, rate_limit=1)
    eng = FrontierEngine(spark, cfg, fix,
                         fresh_ckpt(str(tmp_path / "trap-ck")),
                         enforce_politeness=True)
    visits = eng.run()
    got = [_visit_tuple_engine(r)
           for r in visits.orderBy("visit_rank").collect()]
    exp = [_visit_tuple_oracle(v) for v in run_oracle(fix, cfg).visits]
    # the deepest chain (…→zz→c→d→e) must be present with real statuses
    assert "http://z.test/e" in {t[1] for t in got}
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
    fetched = (spark.read.parquet(os.path.join(ck, "crawl"))
               .filter(F.col("kind") == "page"))
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


def test_freeze_store_write_once_and_resume(spark, tmp_path):
    """Freeze-and-cursor deferral store (the Q²/2c write-amplification
    fix, frontier.py:_write_frontier): under politeness, pending rows
    that can never be overtaken are written ONCE to the append-only
    sel=f store and popped by cursor range — never re-ranked or
    rewritten. Checks: (a) freezing actually triggers at this cap,
    (b) write-once — every frozen row hits disk exactly once over the
    whole drain, (c) the cursor fully consumes the store by crawl
    end, (d) a mid-drain resume in a FRESH engine instance restores
    the cursor from its per-round parquet and still matches the
    oracle row-for-row."""
    import glob
    import json

    import pandas as pd

    cfg = CrawlConfig(max_depth=3, rate_limit=6)
    ck = fresh_ckpt(str(tmp_path / "fz"))
    eng1 = FrontierEngine(spark, cfg, FIXDIR, ck, enforce_politeness=True)
    eng1.explore(max_rounds=8)            # interrupt mid-drain
    assert not eng1._state()["done"]

    eng2 = FrontierEngine(spark, cfg, FIXDIR, ck,
                          enforce_politeness=True)  # fresh instance
    visits = eng2.run()
    got = [_visit_tuple_engine(r)
           for r in visits.orderBy("visit_rank").collect()]
    exp = [_visit_tuple_oracle(v) for v in run_oracle(FIXDIR, cfg).visits]
    assert got == exp

    # (a) + (b): the store saw rows, and no frozen row was ever
    # rewritten — total sel=f rows across all rounds == distinct urls
    ffiles = glob.glob(os.path.join(ck, "frontier", "round=*", "sel=f",
                                    "*.parquet"))
    assert ffiles, "freezing never triggered — test config is vacuous"
    fz = spark.read.parquet(*ffiles)
    n_rows = fz.count()
    assert n_rows > 0
    assert n_rows == fz.select("url").distinct().count()

    # (c): drained — the final cursor shows every frozen row popped
    last = sorted(glob.glob(os.path.join(ck, "cursor",
                                         "round=*.parquet")))[-1]
    cur = pd.read_parquet(last)
    assert int(cur["frozen_total"].sum()) == n_rows
    assert (cur["consumed"] == cur["frozen_total"]).all()

    # metrics carry the freeze telemetry
    with open(os.path.join(ck, "metrics.jsonl")) as f:
        ms = [json.loads(line) for line in f]
    assert sum(m.get("frozen", 0) for m in ms) == n_rows
