"""Engine-vs-simulator crawl parity at BENCH scale (default 1M pages).

The golden tests (tests/test_crawl_golden.py) pin the Spark engine
row-for-row against the sequential oracle simulator at fixture scale
(~10^2..10^3 pages).  This tool runs the SAME comparison on the bench
synthetic web at 10^6 pages — the largest size the pure-Python
simulator can replay in minutes — using the exact bench configuration
(max_depth=8, politeness ON, bucketed-web fetch join), so the scaling
numbers in BENCH_scaling.json are backed by a full-order correctness
check one decade past the test fixtures:

  * visit order, url, url_hash, host, depth, parent_url, link_index,
    priority vector, status_code and politeness batch_id must match
    the simulator tuple-for-tuple (the golden-test comparison, not a
    count check);
  * above 10^6 the simulator is impractical (pure-Python DFS) — there
    tools/reach_check.py provides the independent closed-form BFS
    upper bound on the visit count instead.

Usage: python tools/sim_check.py [--pages 1000000] [--seeds 1024]
       [--depth 8] [--cores 16]

Prints one JSON line:
  {"pages": N, "engine_visits": n, "oracle_visits": n,
   "rows_equal": true, "first_mismatch": null,
   "engine_sec": ..., "oracle_sec": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def engine_visits(pages: int, seeds: int, depth: int, cores: int):
    from bench import ensure_bench_web
    from crawler_spark.engine.config import CrawlConfig
    from crawler_spark.engine.frontier import FrontierEngine, fresh_ckpt
    from crawler_spark.plans.session import get_spark

    web = ensure_bench_web(pages, seeds)
    cfg = CrawlConfig(max_depth=depth,
                      rate_limit=max(50_000, pages // 20),
                      batch_window_ms=1000)
    spark = get_spark("sim-check", cores=cores, shuffle_partitions=cores)
    ck_base = ("/dev/shm/crawler_spark_bench"
               if os.path.isdir("/dev/shm") else "/tmp/crawler_spark_bench")
    eng = FrontierEngine(spark, cfg, web,
                         fresh_ckpt(os.path.join(ck_base, "ckpt_simcheck")),
                         enforce_politeness=True,
                         bucketed_web_dir=web.rstrip("/") + "-bucketed64",
                         web_buckets=64)
    rows = eng.run().orderBy("visit_rank").collect()
    got = [(r["visit_rank"], r["url"], r["url_hash"], r["host"], r["depth"],
            r["parent_url"], r["link_index"], r["prio"], r["status_code"],
            r["batch_id"]) for r in rows]
    spark.stop()
    return web, got


def oracle_visits(web: str, pages: int, depth: int):
    from crawler_spark.engine.config import CrawlConfig
    from crawler_spark.oracle.simulator import run_oracle

    cfg = CrawlConfig(max_depth=depth,
                      rate_limit=max(50_000, pages // 20),
                      batch_window_ms=1000)
    res = run_oracle(web, cfg)
    return [(v.rank, v.url, v.url_hash, v.host, v.depth, v.parent_url,
             v.link_index, v.prio, v.status_code, v.batch_id)
            for v in res.visits]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--seeds", type=int, default=1024)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    t0 = time.time()
    web, got = engine_visits(args.pages, args.seeds, args.depth, args.cores)
    t_eng = time.time() - t0
    print(f"# engine: {len(got)} visits in {t_eng:.1f}s", file=sys.stderr)

    t1 = time.time()
    exp = oracle_visits(web, args.pages, args.depth)
    t_orc = time.time() - t1
    print(f"# oracle: {len(exp)} visits in {t_orc:.1f}s", file=sys.stderr)

    first_mismatch = None
    for i, (g, e) in enumerate(zip(got, exp)):
        if g != e:
            first_mismatch = {"rank": i, "engine": list(map(str, g)),
                              "oracle": list(map(str, e))}
            break
    rows_equal = first_mismatch is None and len(got) == len(exp)
    print(json.dumps({
        "pages": args.pages, "engine_visits": len(got),
        "oracle_visits": len(exp), "rows_equal": rows_equal,
        "first_mismatch": first_mismatch,
        "engine_sec": round(t_eng, 1), "oracle_sec": round(t_orc, 1),
    }))
    sys.exit(0 if rows_equal else 1)


if __name__ == "__main__":
    main()
