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


def _has_c_kernel() -> bool:
    from crawler_spark.core.dfs_kernel import _load_lib
    return _load_lib() is not None


def test_sharded_parallel_overlapping_branches(spark, tmp_path):
    """shard_procs>1 drives the process-pool optimistic path (the
    size auto-gate picks sequential at this scale, so it is passed
    explicitly). t-smoke's seed branches share pages, so optimistic
    sweeps CONFLICT and the validator's prefix-accept + re-sweep
    fallback must reproduce the skeleton sweep row-for-row anyway."""
    cfg = CrawlConfig(max_depth=3)
    eng = FrontierEngine(spark, cfg, FIXDIR,
                         fresh_ckpt(str(tmp_path / "pp")))
    eng.explore()
    base = [_visit_tuple_engine(r) for r in
            eng.resolve(strategy="skeleton")
            .orderBy("visit_rank").collect()]
    for n_shards, procs in ((2, 2), (4, 3)):
        got = [_visit_tuple_engine(r) for r in
               eng.resolve(strategy="sharded", n_shards=n_shards,
                           shard_procs=procs)
               .orderBy("visit_rank").collect()]
        assert got == base, f"n_shards={n_shards} procs={procs}"
        if _has_c_kernel():
            assert "procs" in str(eng.timings["sweep_impl"])
            assert "shard_resweeps" in eng.timings


def test_sharded_parallel_disjoint_branches(spark, tmp_path):
    """Disjoint seed branches (one binary tree per host, no cross-host
    links) must validate conflict-free: every optimistic worker sweep
    is accepted wholesale (shard_resweeps == 0) and the claims equal
    the skeleton sweep row-for-row — the wall-collapse case the
    parallel path exists for."""
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

    fix = str(tmp_path / "disjoint-web")
    os.makedirs(fix, exist_ok=True)
    pages, seed_urls = [], []
    n_tree = 2 ** 4 - 1  # complete binary tree, depth 3
    for h in range(4):
        base_u = f"http://h{h}.test"
        seed_urls.append(f"{base_u}/n0")
        for i in range(n_tree):
            kids = [f"{base_u}/n{c}" for c in (2 * i + 1, 2 * i + 2)
                    if c < n_tree]
            pages.append(page(f"{base_u}/n{i}", kids))
    _write_web_tables(fix, pages, seed_urls)
    cfg = CrawlConfig(max_depth=4, rate_limit=10_000)
    eng = FrontierEngine(spark, cfg, fix,
                         fresh_ckpt(str(tmp_path / "dis-ck")))
    eng.explore()
    base = [_visit_tuple_engine(r) for r in
            eng.resolve(strategy="skeleton")
            .orderBy("visit_rank").collect()]
    assert len(base) == 4 * n_tree
    got = [_visit_tuple_engine(r) for r in
           eng.resolve(strategy="sharded", n_shards=4, shard_procs=4)
           .orderBy("visit_rank").collect()]
    assert got == base
    if _has_c_kernel():
        assert eng.timings["shard_resweeps"] == 0
        assert len(eng.timings["shard_sweeps"]) == 4


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


def test_bucketed_seen_store_identity(spark, tmp_path):
    """The bucketed seen-store (frontier.py:_ensure_seen_store — the
    Iceberg bucket(N, url) analog that makes the history side of the
    per-round admission joins exchange-free) must not change a single
    output row. Politeness ON so the depth-correcting seen_best path
    (the groupBy over history) is exercised too."""
    cfg = CrawlConfig(max_depth=3, rate_limit=6)
    eng = FrontierEngine(spark, cfg, FIXDIR,
                         fresh_ckpt(str(tmp_path / "bseen")),
                         enforce_politeness=True,
                         bucketed_seen=True, seen_buckets=8)
    visits = eng.run()
    got = [_visit_tuple_engine(r)
           for r in visits.orderBy("visit_rank").collect()]
    exp = [_visit_tuple_oracle(v) for v in run_oracle(FIXDIR, cfg).visits]
    assert got == exp


def test_bucketed_seen_store_resume_heals(spark, tmp_path):
    """Resume with the seen store: kill after 2 rounds, DELETE the
    store dir entirely (worst-case crash window — rounds committed but
    no mirror), resume in a fresh engine → _seen_store_heal rebuilds
    every partition from the frontier snapshots and the crawl output
    is still row-for-row exact."""
    import shutil

    cfg = CrawlConfig(max_depth=3)
    ck = fresh_ckpt(str(tmp_path / "bseen-resume"))
    eng1 = FrontierEngine(spark, cfg, FIXDIR, ck,
                          bucketed_seen=True, seen_buckets=8)
    eng1.explore(max_rounds=2)
    assert not eng1._state()["done"]
    shutil.rmtree(os.path.join(ck, "seen_bucketed"))
    spark.sql(f"DROP TABLE IF EXISTS {eng1._seen_name}")

    eng2 = FrontierEngine(spark, cfg, FIXDIR, ck,
                          bucketed_seen=True, seen_buckets=8)
    visits = eng2.run()
    got = [_visit_tuple_engine(r)
           for r in visits.orderBy("visit_rank").collect()]
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
    _write_web_tables(path, pages, ["http://seed.test/s0"])


def _write_web_tables(path: str, pages: list[dict],
                      seed_urls: list[str]) -> None:
    """Write a hand-built page list (the `page()` dict shape above) as
    a complete web fixture dir: web_pages + zero-delay robots + seeds
    in list order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

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
        "url": seed_urls,
        "seed_rank": pa.array(range(len(seed_urls)), pa.int32()),
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


def test_cursor_spill_matches_pandas(spark, tmp_path):
    """cursor_spill_rows=0 forces the SPARK-SIDE cursor from the first
    freezing round (the 10^8-frozen-hosts posture exercised at toy
    scale): visits, write-once and drain invariants must be identical
    to the driver-pandas cursor, including a mid-drain resume that
    restores the spilled cursor straight from parquet (never loading
    it onto the driver)."""
    import glob
    import json

    import pandas as pd

    cfg = CrawlConfig(max_depth=3, rate_limit=6)
    ck = fresh_ckpt(str(tmp_path / "spill"))
    eng1 = FrontierEngine(spark, cfg, FIXDIR, ck, enforce_politeness=True,
                          cursor_spill_rows=0)
    eng1.explore(max_rounds=8)            # interrupt mid-drain
    assert eng1._cursor_spark, "spill never engaged — vacuous test"
    eng2 = FrontierEngine(spark, cfg, FIXDIR, ck,
                          enforce_politeness=True, cursor_spill_rows=0)
    visits = eng2.run()
    assert eng2._cursor_spark            # resume detected the spill
    got = [_visit_tuple_engine(r)
           for r in visits.orderBy("visit_rank").collect()]
    exp = [_visit_tuple_oracle(v) for v in run_oracle(FIXDIR, cfg).visits]
    assert got == exp

    # write-once across the drain, and the spilled cursor fully
    # consumed the store by crawl end
    ffiles = glob.glob(os.path.join(ck, "frontier", "round=*", "sel=f",
                                    "*.parquet"))
    assert ffiles
    fz = spark.read.parquet(*ffiles)
    n_rows = fz.count()
    assert n_rows == fz.select("url").distinct().count()
    last = sorted(glob.glob(os.path.join(ck, "cursor",
                                         "round=*.parquet")))[-1]
    cur = pd.read_parquet(last)          # reads file OR spark dir
    assert int(cur["frozen_total"].sum()) == n_rows
    assert (cur["consumed"] == cur["frozen_total"]).all()
    with open(os.path.join(ck, "metrics.jsonl")) as f:
        ms = [json.loads(line) for line in f]
    assert sum(m.get("frozen", 0) for m in ms) == n_rows
    assert sum(m.get("popped", 0) for m in ms) == n_rows

    # the depth-correcting admit must survive the spill too
    fix = str(tmp_path / "spill-trap")
    _write_depth_trap_fixture(fix)
    cfg2 = CrawlConfig(max_depth=4, rate_limit=1)
    eng3 = FrontierEngine(spark, cfg2, fix,
                          fresh_ckpt(str(tmp_path / "spill-trap-ck")),
                          enforce_politeness=True, cursor_spill_rows=0)
    got2 = [_visit_tuple_engine(r)
            for r in eng3.run().orderBy("visit_rank").collect()]
    exp2 = [_visit_tuple_oracle(v) for v in run_oracle(fix, cfg2).visits]
    assert got2 == exp2


def test_resolve_timings_disjoint_per_call(spark, tmp_path):
    """Two consecutive resolve() calls on one engine must each report
    their OWN step breakdown — no key carried over from the previous
    strategy's run, and no accumulated seconds (the timing
    double-count bug class ADVICE flagged in round 4). Each call's
    numeric steps must sum to no more than that call's wall time."""
    import time as _time

    cfg = CrawlConfig(max_depth=3)
    eng = FrontierEngine(spark, cfg, FIXDIR,
                         fresh_ckpt(str(tmp_path / "tmg")))
    eng.explore()

    t0 = _time.time()
    n1 = eng.resolve().count()
    w1 = _time.time() - t0
    s1 = dict(eng.timings)

    t0 = _time.time()
    n2 = eng.resolve(strategy="sharded", n_shards=2).count()
    w2 = _time.time() - t0
    s2 = dict(eng.timings)

    assert n1 == n2
    # skeleton-only steps must not leak into the sharded breakdown
    assert "csr_pass" not in s2
    # diagnostics that are not wall-seconds of the call
    not_secs = {"shard_overlap", "shard_resweeps", "sweep_impl",
                "shard_sweeps"}
    for steps, wall in ((s1, w1), (s2, w2)):
        tot = sum(v for k, v in steps.items()
                  if k not in not_secs
                  and isinstance(v, (int, float))
                  and not isinstance(v, bool))
        assert tot <= wall + 1.0, (tot, wall, steps)


def test_group_skewed_bootstrap_spill_resume(spark, tmp_path):
    """Regression: a GROUP-SKEWED bootstrap spill (one mega-host
    freezing more ROWS than cursor_spill_rows across only a handful of
    (host, salt) GROUPS) leaves a spilled cursor whose row count is
    far BELOW the cap. Resume used to pick the cursor mode by row
    count alone, load the spilled-mode compact dirs registry into the
    pandas path, and crash on the next advance's ['host', 'salt']
    merge (KeyError). Mode is now detected from the persisted
    registry's shape; the resumed crawl must stay in spilled mode and
    still match the oracle row-for-row."""
    import glob

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

    fix = str(tmp_path / "mega-fix")
    os.makedirs(fix)
    kids = [f"http://mega.test/p{i:03d}" for i in range(80)]
    pages = ([page("http://seed.test/s0", kids)]
             + [page(u, []) for u in kids])
    _write_web_tables(fix, pages, ["http://seed.test/s0"])

    cfg = CrawlConfig(max_depth=2, rate_limit=2)
    ck = fresh_ckpt(str(tmp_path / "mega-ck"))
    eng1 = FrontierEngine(spark, cfg, fix, ck, enforce_politeness=True,
                          cursor_spill_rows=30)
    eng1.explore(max_rounds=4)            # interrupt mid-drain
    assert eng1._cursor_spark, "bootstrap spill never engaged"
    assert not eng1._state()["done"]
    # the trigger shape: spilled cursor holds one row per (host, salt)
    # group — far fewer rows than the cap that tripped the spill
    last_cp = sorted(glob.glob(os.path.join(ck, "cursor",
                                            "round=*.parquet")))[-1]
    assert FrontierEngine._parquet_rows(last_cp) <= 30

    eng2 = FrontierEngine(spark, cfg, fix, ck, enforce_politeness=True,
                          cursor_spill_rows=30)
    visits = eng2.run()
    assert eng2._cursor_spark, "resume fell back to pandas mode"
    got = [_visit_tuple_engine(r)
           for r in visits.orderBy("visit_rank").collect()]
    exp = [_visit_tuple_oracle(v) for v in run_oracle(fix, cfg).visits]
    assert got == exp


@pytest.mark.slow
def test_cursor_spill_mode_equivalence_bench_web(spark, tmp_path):
    """Deferral-heavy synthetic web (hundreds of freezing hosts):
    pandas-cursor and spilled-cursor runs must produce the identical
    visit set and freeze telemetry — the modes differ only in WHERE
    the cursor lives."""
    import json

    from pyspark.sql import functions as F

    from crawler_spark.sources.synth_web import generate_bench_web

    web = str(tmp_path / "web-spill")
    generate_bench_web(web, 6_000, n_hosts=200, n_seeds=32)
    cfg = CrawlConfig(max_depth=3, rate_limit=12)
    outs = []
    for tag, spill in (("pandas", 10**9), ("spark", 0)):
        ck = fresh_ckpt(str(tmp_path / f"ck-{tag}"))
        eng = FrontierEngine(spark, cfg, web, ck,
                             enforce_politeness=True,
                             cursor_spill_rows=spill)
        visits = eng.run()
        row = (visits.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("url", "prio", "visit_rank",
                                 "batch_id")).alias("chk")).collect()[0])
        with open(os.path.join(ck, "metrics.jsonl")) as f:
            ms = [json.loads(line) for line in f]
        outs.append({"n": row["n"], "chk": row["chk"],
                     "frozen": sum(m.get("frozen", 0) for m in ms),
                     "popped": sum(m.get("popped", 0) for m in ms),
                     "spilled": eng._cursor_spark})
    assert outs[0]["spilled"] is False and outs[1]["spilled"] is True
    assert outs[1]["frozen"] > 0
    for k in ("n", "chk", "frozen", "popped"):
        assert outs[0][k] == outs[1][k], (k, outs)


def test_inloop_image_ingest_matches_oracle(spark, tmp_path):
    """In-loop image ingest (north-star core loop: fetched image bytes
    decoded/validated via Arrow UDFs with dedup INSIDE the micro-batch
    rounds, frontier.py:_ingest_images). Interrupts after 2 rounds and
    resumes in a fresh engine (the src-seen anti-join must only see
    strictly-prior rounds). Checks, against the sequential oracle and
    the byte dim: exact src-set parity, write-once across rounds,
    byte-for-byte + decoded-pixel equality, phash recomputed from the
    fetched bytes equals the dim's, validation all-green, per-round
    ingest metrics, and first-DFS-visit caption attribution."""
    import json

    from crawler_spark.core.imaging import decode_image, phash64, psnr

    cfg = CrawlConfig(max_depth=3)
    ck = fresh_ckpt(str(tmp_path / "ingest"))
    eng1 = FrontierEngine(spark, cfg, FIXDIR, ck, ingest_images=True)
    eng1.explore(max_rounds=2)
    eng = FrontierEngine(spark, cfg, FIXDIR, ck, ingest_images=True)
    visits = eng.run()
    o = run_oracle(FIXDIR, cfg)

    ingested = (eng.images_table.read(with_partition_columns=True)
                .select("src").collect())
    exp_srcs = {im["src"] for im in o.images}
    # explore ingests speculatively: a superset (a page can be fetched
    # by BFS yet DFS-claimed at a depth whose children are rejected),
    # written once per src across rounds
    assert {r["src"] for r in ingested} >= exp_srcs
    assert len(ingested) == len({r["src"] for r in ingested})

    # the FINAL table (claims-join narrowing) is the reference's
    # downloaded set exactly
    got = eng.images(visits).collect()
    assert {r["src"] for r in got} == exp_srcs
    assert len(got) == len(exp_srcs)

    dim = {r["src"]: r for r in
           spark.read.parquet(f"{FIXDIR}/images.parquet").collect()}
    for r in got:
        d = dim[r["src"]]
        assert r["valid"]
        assert bytes(r["bytes"]) == bytes(d["bytes"])
        # recomputed phash: exact for png; the dim's phash was taken
        # PRE-encode, so lossy formats may flip a few low-confidence
        # bits after the encode/decode round trip (PSNR >= 40 dB)
        ham = bin((r["phash"] ^ d["phash"]) & ((1 << 64) - 1)).count("1")
        assert ham == 0 if r["fmt"] == "png" else ham <= 6, \
            (r["src"], r["fmt"], ham)
        px = decode_image(bytes(r["bytes"]), r["fmt"])
        gold = decode_image(bytes(d["bytes"]), d["fmt"])
        assert psnr(px, gold) == float("inf")
        assert phash64(px) == r["phash"]

    # per-round fetch/dedup metrics from footers
    with open(os.path.join(ck, "metrics.jsonl")) as f:
        ms = [json.loads(line) for line in f]
    assert sum(m.get("images_new", 0) for m in ms) == len(ingested)
    assert sum(m.get("images_invalid", 0) for m in ms) == 0

    # caption attribution: first page in DFS order wins per src
    caps = {r["src"]: (r["caption"], r["first_visit_rank"])
            for r in eng.image_captions(visits).collect()}
    rank_of = {v.url: v.rank for v in o.visits}
    first = {}
    for im in o.images:            # appended in DFS visit order
        if im["src"] not in first:
            first[im["src"]] = (im["caption"], rank_of[im["page_url"]])
    assert caps == first


def test_image_ingest_bloom_identity(spark, tmp_path):
    """The bloom-prefiltered src-seen path (ingest_bloom=True —
    partitioned bloom over xxhash64(src), bloom-positive srcs
    confirmed by the exact string anti-join) must produce an images
    table IDENTICAL to the plain anti-join, row for row including
    per-round membership: correctness never depends on the filter
    (no false negatives; false positives only route srcs through the
    exact check)."""
    cfg = CrawlConfig(max_depth=3)
    outs = []
    for flag in (False, True):
        ck = fresh_ckpt(str(tmp_path / f"bloom_{flag}"))
        eng = FrontierEngine(spark, cfg, FIXDIR, ck,
                             ingest_images=True, ingest_bloom=flag)
        eng.run()
        rows = (eng.images_table.read(with_partition_columns=True)
                .selectExpr("src", "round", "phash", "valid",
                            "xxhash64(bytes) as bh")
                .collect())
        outs.append(sorted((r["src"], r["round"], r["phash"],
                            r["valid"], r["bh"]) for r in rows))
    assert outs[0] == outs[1]
    assert len(outs[0]) > 0


def test_image_ingest_bucketed_dim_identity(spark, tmp_path):
    """The src-bucketed byte-dim fetch path (big rounds merge-join the
    bucketed dim so only the refs side shuffles) must produce an
    images table identical to the plain broadcast-refs join.
    bucket_join_min=0 forces every round through the merge path."""
    cfg = CrawlConfig(max_depth=3)
    outs = []
    for bdir in (None, str(tmp_path / "imgbucket")):
        ck = fresh_ckpt(str(tmp_path / f"bk_{bdir is not None}"))
        eng = FrontierEngine(spark, cfg, FIXDIR, ck,
                             ingest_images=True,
                             bucketed_images_dir=bdir,
                             bucket_join_min=0 if bdir else 250_000)
        eng.run()
        rows = (eng.images_table.read(with_partition_columns=True)
                .selectExpr("src", "round", "phash", "valid",
                            "xxhash64(bytes) as bh")
                .collect())
        outs.append(sorted((r["src"], r["round"], r["phash"],
                            r["valid"], r["bh"]) for r in rows))
    assert outs[0] == outs[1]
    assert len(outs[0]) > 0


def test_image_ingest_bucketed_seen_identity(spark, tmp_path):
    """The bucketed ingested-src store (frontier.py:
    _ensure_imgseen_store — the bucket(N, src) analog that makes the
    history side of the per-round src-seen anti-join exchange-free)
    must produce an images table identical to the plain history read,
    row for row including per-round membership."""
    cfg = CrawlConfig(max_depth=3)
    outs = []
    for flag in (False, True):
        ck = fresh_ckpt(str(tmp_path / f"iseen_{flag}"))
        eng = FrontierEngine(spark, cfg, FIXDIR, ck,
                             ingest_images=True,
                             bucketed_seen=flag, seen_buckets=8)
        eng.run()
        rows = (eng.images_table.read(with_partition_columns=True)
                .selectExpr("src", "round", "phash", "valid",
                            "xxhash64(bytes) as bh")
                .collect())
        outs.append(sorted((r["src"], r["round"], r["phash"],
                            r["valid"], r["bh"]) for r in rows))
    assert outs[0] == outs[1]
    assert len(outs[0]) > 0


def test_imgseen_store_resume_heals(spark, tmp_path):
    """Resume with the ingested-src store: kill after 2 rounds,
    DELETE the store dir entirely (worst-case crash window — images
    rounds committed but no mirror), resume in a fresh engine →
    _imgseen_store_heal rebuilds every partition from the images
    snapshots and the ingest history (write-once per src across
    rounds) stays exact."""
    import shutil

    cfg = CrawlConfig(max_depth=3)
    ck = fresh_ckpt(str(tmp_path / "iseen-resume"))
    eng1 = FrontierEngine(spark, cfg, FIXDIR, ck,
                          ingest_images=True,
                          bucketed_seen=True, seen_buckets=8)
    eng1.explore(max_rounds=2)
    assert not eng1._state()["done"]
    shutil.rmtree(os.path.join(ck, "imgseen_bucketed"))
    spark.sql(f"DROP TABLE IF EXISTS {eng1._imgseen_name}")
    spark.sql(f"DROP TABLE IF EXISTS {eng1._seen_name}")

    eng2 = FrontierEngine(spark, cfg, FIXDIR, ck,
                          ingest_images=True,
                          bucketed_seen=True, seen_buckets=8)
    eng2.run()
    # plain reference run: same ingest, no store
    ck3 = fresh_ckpt(str(tmp_path / "iseen-plain"))
    eng3 = FrontierEngine(spark, cfg, FIXDIR, ck3, ingest_images=True)
    eng3.run()
    outs = []
    for eng in (eng2, eng3):
        rows = (eng.images_table.read(with_partition_columns=True)
                .selectExpr("src", "round", "phash", "valid",
                            "xxhash64(bytes) as bh")
                .collect())
        outs.append(sorted((r["src"], r["round"], r["phash"],
                            r["valid"], r["bh"]) for r in rows))
    assert outs[0] == outs[1]
    assert len(outs[0]) > 0


def test_image_ingest_flags_corrupt_bytes(spark, tmp_path):
    """Validation path of the in-loop ingest: undecodable bytes and
    metadata/pixel dimension mismatches land in the valid=false
    partition (counted per round from footers as images_invalid),
    never poison the valid set, and never crash the Arrow decode
    batch."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from crawler_spark.core.imaging import phash64, png_encode, render_image

    fix = str(tmp_path / "corrupt-fixture")
    os.makedirs(fix, exist_ok=True)

    def img(src, alt):
        return dict(src=src, alt=alt)

    pages = [dict(
        url="http://a.test/root", host="a.test", status_code=200,
        title="root", meta_description="", text_content="", headings=[],
        links=[],
        images=[img("http://a.test/ok.png", "fine"),
                img("http://a.test/broken.png", "garbage bytes"),
                img("http://a.test/wrongdims.png", "lying metadata")],
        forms=[], load_time_ms=10)]
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
    pq.write_table(pa.table({
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
    }), os.path.join(fix, "web_pages.parquet"))
    pq.write_table(pa.table({
        "host": ["a.test"],
        "disallow_prefixes": pa.array([[]], pa.list_(pa.string())),
        "crawl_delay_ms": pa.array([0], pa.int64()),
    }), os.path.join(fix, "robots.parquet"))
    pq.write_table(pa.table({
        "url": ["http://a.test/root"],
        "seed_rank": pa.array([0], pa.int32()),
    }), os.path.join(fix, "seeds.parquet"))

    ok_px = render_image("ok", 20, 12)
    pq.write_table(pa.table({
        "src": ["http://a.test/ok.png", "http://a.test/broken.png",
                "http://a.test/wrongdims.png"],
        "image_id": ["id-ok", "id-broken", "id-wrongdims"],
        "bytes": pa.array([png_encode(ok_px), b"not a png at all",
                           png_encode(render_image("small", 4, 4))],
                          pa.binary()),
        "w": pa.array([20, 20, 20], pa.int32()),
        "h": pa.array([12, 12, 12], pa.int32()),
        "fmt": ["png", "png", "png"],
        "caption": ["fine", "garbage bytes", "lying metadata"],
        "phash": pa.array([phash64(ok_px), 0, 0], pa.int64()),
    }), os.path.join(fix, "images.parquet"))

    cfg = CrawlConfig(max_depth=1)
    ck = fresh_ckpt(str(tmp_path / "corrupt-ck"))
    eng = FrontierEngine(spark, cfg, fix, ck, ingest_images=True)
    visits = eng.run()

    # typed read: `valid` is a hive partition dir, so an inference
    # read would surface it as string — the engine's schema types it
    rows = {r["image_id"]: r for r in
            eng.images_table.read(with_partition_columns=True,
                                  schema=eng._IMG_INGEST_SCHEMA).collect()}
    assert rows["id-ok"]["valid"] is True
    assert rows["id-ok"]["phash"] == phash64(ok_px)
    assert rows["id-broken"]["valid"] is False
    assert rows["id-wrongdims"]["valid"] is False

    with open(os.path.join(ck, "metrics.jsonl")) as f:
        ms = [json.loads(line) for line in f]
    assert sum(m.get("images_new", 0) for m in ms) == 3
    assert sum(m.get("images_invalid", 0) for m in ms) == 2
    # the final (claims-narrowed) table still carries the invalid rows
    # tagged, so downstream can quarantine rather than silently drop
    assert {r["image_id"]: r["valid"] for r in
            eng.images(visits).collect()} == {
        "id-ok": True, "id-broken": False, "id-wrongdims": False}
